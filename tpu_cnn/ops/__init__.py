from tpu_cnn.ops import quant, detect_head

__all__ = ["quant", "detect_head"]
