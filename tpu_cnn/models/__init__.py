from tpu_cnn.models.cnn import (
    LAYER_CONFIGS,
    DEFAULT_SHIFTS,
    NUM_CLASSES,
    IMG_SIZE,
    CLASS_NAMES,
    CNNConfig,
    FpgaCNN,
)

__all__ = [
    "LAYER_CONFIGS",
    "DEFAULT_SHIFTS",
    "NUM_CLASSES",
    "IMG_SIZE",
    "CLASS_NAMES",
    "CNNConfig",
    "FpgaCNN",
]
