"""tpu-transferattack: TPU-native transfer-based adversarial attack framework.

Registry mirroring the reference ``transferattack/__init__.py:3-160``'s
``attack_zoo`` — string key → (module path, class name), resolved lazily.
Keys grow as attack families land; the authoritative target list is
SURVEY.md §2.
"""
from __future__ import annotations

import importlib
from typing import Dict, Tuple

__version__ = "0.1.0"

attack_zoo: Dict[str, Tuple[str, str]] = {
    # gradient/
    "fgsm": (".gradient.mifgsm", "FGSM"),
    "ifgsm": (".gradient.mifgsm", "IFGSM"),
    "mifgsm": (".gradient.mifgsm", "MIFGSM"),
    "nifgsm": (".gradient.mifgsm", "NIFGSM"),
}


def load_attack_class(attack_name: str):
    """Resolve a registry key to its attack class (``__init__.py:154-160``)."""
    if attack_name not in attack_zoo:
        raise ValueError(f"Unsupported attack {attack_name!r}")
    module_path, class_name = attack_zoo[attack_name]
    module = importlib.import_module(module_path, package=__name__)
    return getattr(module, class_name)
