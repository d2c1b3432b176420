from tpu_cnn.engine.cpu_ref import CPURefEngine, numpy_cnn_forward

__all__ = ["CPURefEngine", "numpy_cnn_forward", "TPUEngine"]


def __getattr__(name):
    # TPUEngine imports jax; keep it lazy so host-only tools stay light.
    if name == "TPUEngine":
        from tpu_cnn.engine.tpu import TPUEngine

        return TPUEngine
    raise AttributeError(name)
