from safevla_tpu.preprocessing.normalize import normalize_images
from safevla_tpu.preprocessing.augment import AugmentParams, sample_augment_params, apply_augment
from safevla_tpu.preprocessing.tokenize import InstructionTokenizer

__all__ = [
    "normalize_images",
    "AugmentParams",
    "sample_augment_params",
    "apply_augment",
    "InstructionTokenizer",
]
