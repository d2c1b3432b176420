from tpu_cnn.native import build

__all__ = ["build", "oracle"]
