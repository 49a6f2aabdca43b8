"""Defense evaluation suite (reference: ``defense/`` — SURVEY.md §2.8).

Five defenses scored against adversarial PNG directories: AT (adversarially
trained classifier), HGD (denoiser front-end), RS (randomized smoothing),
NRP (neural purifier), DiffPure (diffusion purification).  Each loads
converted checkpoints from ``$TA_TPU_WEIGHTS_DIR`` and falls back to base /
random weights with a warning so pipelines always execute.

Drive via ``python -m transferattack_tpu.defense.run --defense <name>``.
"""
from .scoring import asr_from_labels, write_label_csv  # noqa: F401
