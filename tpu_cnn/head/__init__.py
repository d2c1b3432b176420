from tpu_cnn.head import classify, cam

__all__ = ["classify", "cam"]
