from tpu_cnn.utils import weights, artifacts, profiling, metrics, failguard

__all__ = ["weights", "artifacts", "profiling", "metrics", "failguard"]
