"""tpu_cnn — TPU-native rebuild of the fpga-cnn-object-detection-accelerator.

A JAX/XLA/Pallas re-design of the reference PYNQ-Z2 FPGA object-detection
system (reference: /root/reference, see SURVEY.md). The reference implements
ONE 3-layer int8 CNN four times bit-identically (Verilog RTL, ARM C, numpy,
PyTorch QAT sim); this package re-expresses that fixed-point contract as:

  - ``ops.quant``        — the bit-exact contract in pure jnp/XLA
  - ``ops.pallas_int8``  — fused Pallas TPU kernels for the hot path
  - ``ops.detect_head``  — spatial-bin-pool classifier + CAM bbox, on-device
  - ``engine``           — TPUEngine (batched, HBM-resident) + CPU/C++ oracles
  - ``models``           — the FpgaCNN model family (topology + artifacts)
  - ``parallel``         — jax.sharding Mesh data/model-parallel scaling
  - ``train``            — two-phase QAT training (JAX/optax)
  - ``apps``             — CLI surface mirroring the reference scripts

Reference parity targets are cited per-module as ``file:line`` into
``/root/reference``.
"""

__version__ = "0.1.0"

from tpu_cnn.models.cnn import LAYER_CONFIGS, DEFAULT_SHIFTS, NUM_CLASSES

__all__ = [
    "LAYER_CONFIGS",
    "DEFAULT_SHIFTS",
    "NUM_CLASSES",
    "__version__",
]
