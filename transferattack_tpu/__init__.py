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
    # gradient/ (31 attacks, reference ``__init__.py:4-37``)
    "fgsm": (".gradient.mifgsm", "FGSM"),
    "ifgsm": (".gradient.mifgsm", "IFGSM"),
    "mifgsm": (".gradient.mifgsm", "MIFGSM"),
    "nifgsm": (".gradient.mifgsm", "NIFGSM"),
    "pifgsm": (".gradient.pifgsm", "PIFGSM"),
    "vmifgsm": (".gradient.vmifgsm", "VMIFGSM"),
    "vnifgsm": (".gradient.vmifgsm", "VNIFGSM"),
    "emifgsm": (".gradient.emifgsm", "EMIFGSM"),
    "aifgtm": (".gradient.aifgtm", "AIFGTM"),
    "ifgssm": (".gradient.ifgssm", "IFGSSM"),
    "smifgrm": (".gradient.smifgrm", "SMIFGRM"),
    "vaifgsm": (".gradient.vaifgsm", "VAIFGSM"),
    "rap": (".gradient.rap", "RAP"),
    "pcifgsm": (".gradient.iefgsm", "PCIFGSM"),
    "iefgsm": (".gradient.iefgsm", "IEFGSM"),
    "gra": (".gradient.gra", "GRA"),
    "gnp": (".gradient.iefgsm", "GNP"),
    "mig": (".gradient.mig", "MIG"),
    "dta": (".gradient.dta", "DTA"),
    "pgn": (".gradient.pgn", "PGN"),
    "mef": (".gradient.mef", "MEF"),
    "anda": (".gradient.anda", "ANDA"),
    "gifgsm": (".gradient.gifgsm", "GIFGSM"),
    "rgmifgsm": (".gradient.tricks", "RGMIFGSM"),
    "dual_mifgsm": (".gradient.tricks", "DualMIFGSM"),
    "ens_mifgsm": (".gradient.tricks", "Ens_FGSM_MIFGSM"),
    "fgsra": (".gradient.fgsra", "FGSRA"),
    "mumodig": (".gradient.mumodig", "MUMODIG"),
    "gaa": (".gradient.gaa", "GAA"),
    "foolmix": (".gradient.foolmix", "Foolmix"),
    "adamsi_fgm": (".gradient.adamsi_fgm", "AdaMSI_FGM"),
    # input_transformation/ (reference ``__init__.py:39-66``)
    "dim": (".input_transformation.dim", "DIM"),
    "dem": (".input_transformation.dim", "DEM"),
    "tim": (".input_transformation.tim", "TIM"),
    "sim": (".input_transformation.sim", "SIM"),
    "admix": (".input_transformation.sim", "Admix"),
    "usmm": (".input_transformation.sim", "USMM"),
    "ssm": (".input_transformation.ssm", "SSM"),
    "maskblock": (".input_transformation.maskblock", "MaskBlock"),
    "sia": (".input_transformation.sia", "SIA"),
    "bsr": (".input_transformation.bsr", "BSR"),
    "mfi": (".input_transformation.mfi", "MFI"),
    "decowa": (".input_transformation.decowa", "DeCowA"),
    "ops": (".input_transformation.ops_attack", "OPS"),
    # advanced_objective/ (reference ``__init__.py:68-95``)
    "tap": (".advanced_objective.tap", "TAP"),
    "ila": (".advanced_objective.ila", "ILA"),
    "fia": (".advanced_objective.fia", "FIA"),
    "rpa": (".advanced_objective.fia", "RPA"),
    "fmaa": (".advanced_objective.fia", "FMAA"),
    "bfa": (".advanced_objective.fia", "BFA"),
    "naa": (".advanced_objective.naa", "NAA"),
    "danaa": (".advanced_objective.naa", "DANAA"),
    "taig": (".advanced_objective.taig", "TAIG"),
    "fuzziness_tuned": (".advanced_objective.tap", "Fuzziness_Tuned"),
    "ilpd": (".advanced_objective.ila", "ILPD"),
    "logit": (".advanced_objective.logit", "LOGIT"),
    "logit_margin": (".advanced_objective.logit", "Logit_Margin"),
    "potrip": (".advanced_objective.logit", "POTRIP"),
    "aa": (".advanced_objective.aa", "AA"),
    "ir": (".advanced_objective.ir", "IR"),
    "p2fa": (".advanced_objective.ir", "P2FA"),
    "trap": (".advanced_objective.ir", "TRAP"),
}


def load_attack_class(attack_name: str):
    """Resolve a registry key to its attack class (``__init__.py:154-160``)."""
    if attack_name not in attack_zoo:
        raise ValueError(f"Unsupported attack {attack_name!r}")
    module_path, class_name = attack_zoo[attack_name]
    module = importlib.import_module(module_path, package=__name__)
    return getattr(module, class_name)
