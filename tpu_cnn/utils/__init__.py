from tpu_cnn.utils import weights, artifacts, profiling

__all__ = ["weights", "artifacts", "profiling"]
