"""Model topology and configuration for the FPGA-contract CNN.

The network (reference ``software/arm_cnn.c:5-8``, ``training/train_cnn.py:7-10``):

    input: 128x128x1 uint8 grayscale
    L0: conv3x3 (1 -> 16),  ReLU >> s0, maxpool2x2  -> 16x64x64
    L1: conv3x3 (16 -> 32), ReLU >> s1, maxpool2x2  -> 32x32x32
    L2: conv3x3 (32 -> 64), ReLU >> s2, maxpool2x2  -> 64x16x16
    -- device/host boundary in the reference; fused on-device here --
    head: 4x4 spatial-bin pooling -> 1024-d -> Linear -> softmax
          (or global-avg-pool -> 64-d -> Linear for the shipped head)
    CAM (class-weighted feature maps) -> threshold -> bounding box

Fixed-point contract per layer (reference ``rtl/core/conv_core.v:31-42``,
``software/arm_cnn.c:93-146``, ``training/train_cnn.py:101-116``):

    1. zero-pad by 1 (SAME)
    2. uint8 activation x int8 weight, integer accumulate
       (24-bit accumulator in RTL / QAT sim; int32 in the C oracle —
       identical for all reachable activations, see ops.quant)
    3. arithmetic right shift by a per-layer runtime amount
    4. clamp to [0, 255] (ReLU + saturate)
    5. 2x2 stride-2 max pool
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

# (in_channels, out_channels, input_size) per layer.
# Reference: software/arm_cnn.c:164-168, software/arm_benchmark.py:32-36.
LAYER_CONFIGS: tuple[tuple[int, int, int], ...] = (
    (1, 16, 128),
    (16, 32, 64),
    (32, 64, 32),
)

# Default per-layer ReLU right-shifts. Runtime-configurable in the reference
# via a packed AXI register (software/pynq_inference.py:83-85,226-229); a
# runtime (3,) int32 array here — no recompilation when they change.
DEFAULT_SHIFTS: tuple[int, int, int] = (2, 4, 6)

IMG_SIZE = 128
NUM_CLASSES = 6
ACCUM_BITS = 24  # training/train_cnn.py:41
QUANT_MAX = 127  # symmetric int8 range, training/train_cnn.py:40

# Feature-map geometry of the final layer (the "device output" surface).
# Reference: software/pynq_inference.py:77-80.
L2_NUM_CHANNELS = 64
L2_SPATIAL = 16
L2_SIZE = L2_SPATIAL * L2_SPATIAL  # 256

# Shipped class set (weights/classes.json, training/train_cnn.py:46-53).
CLASS_NAMES = ["airplane", "cat", "zebra", "bus", "bicycle", "donut"]

WEIGHT_BYTES = 23184  # software/pynq_inference.py:88
IMAGE_BYTES = IMG_SIZE * IMG_SIZE  # 16384


def layer_weight_sizes() -> list[int]:
    """Per-layer byte counts inside weights.bin: 144 / 4608 / 18432."""
    return [oc * ic * 9 for ic, oc, _ in LAYER_CONFIGS]


@dataclasses.dataclass(frozen=True)
class CNNConfig:
    """Static configuration for one FpgaCNN instance.

    ``layer_configs`` may be overridden to shrink geometry for fast unit
    tests — the same parameterized-shrinking idiom the reference testbenches
    use (``sim/module/line_buffer_tb.v:13``, ``max_pooling_tb.v:12``).
    """

    layer_configs: tuple[tuple[int, int, int], ...] = LAYER_CONFIGS
    num_classes: int = NUM_CLASSES
    accum_bits: int = ACCUM_BITS
    accum_wrap: bool = False  # True matches the QAT sim's 24-bit wraparound

    @property
    def img_size(self) -> int:
        return self.layer_configs[0][2]

    @property
    def out_channels(self) -> int:
        return self.layer_configs[-1][1]

    @property
    def out_spatial(self) -> int:
        return self.layer_configs[-1][2] // 2

    @property
    def feature_dim_bins(self) -> int:
        """Spatial-bin-pooled feature dimension (4x4 grid)."""
        return self.out_channels * 16

    def weight_bytes(self) -> int:
        return sum(oc * ic * 9 for ic, oc, _ in self.layer_configs)


class FpgaCNN:
    """The flagship model: 3-layer int8 CNN + linear detection head.

    Holds host-side numpy parameters; compute paths live in ``ops`` and
    ``engine``. Kernels are ``(oc, ic, 3, 3)`` int8, matching the decoded
    weights.bin layout (see ``utils.weights``).
    """

    def __init__(
        self,
        kernels: Sequence[np.ndarray],
        fc_weight: np.ndarray,
        fc_bias: np.ndarray,
        class_names: Sequence[str] | None = None,
        shifts: Sequence[int] = DEFAULT_SHIFTS,
        config: CNNConfig = CNNConfig(),
        bbox_weight: np.ndarray | None = None,  # (D+1, 4) regression head
        multi_thresh=None,  # per-class multi-object thresholds (K,) or None
        multi_head=None,  # (w (K, D), b (K,)) multi-label presence head
    ):
        self.config = config
        expected = [(oc, ic, 3, 3) for ic, oc, _ in config.layer_configs]
        got = [tuple(k.shape) for k in kernels]
        if got != expected:
            raise ValueError(f"kernel shapes {got} != expected {expected}")
        self.kernels = [np.asarray(k, dtype=np.int8) for k in kernels]
        self.fc_weight = np.asarray(fc_weight, dtype=np.float32)
        self.fc_bias = np.asarray(fc_bias, dtype=np.float32)
        self.class_names = (
            list(class_names) if class_names is not None else list(CLASS_NAMES)
        )
        self.shifts = np.asarray(list(shifts), dtype=np.int32)
        if self.shifts.shape != (len(config.layer_configs),):
            raise ValueError("one shift per layer required")
        self.bbox_weight = (
            np.asarray(bbox_weight, np.float32) if bbox_weight is not None
            else None
        )
        if self.bbox_weight is not None and self.bbox_weight.shape != (
            config.feature_dim_bins + 1, 4
        ):
            raise ValueError(
                f"bbox_weight shape {self.bbox_weight.shape} != "
                f"({config.feature_dim_bins + 1}, 4)"
            )
        self.multi_thresh = (
            np.asarray(list(multi_thresh), np.float32)
            if multi_thresh is not None else None
        )
        if (self.multi_thresh is not None
                and self.multi_thresh.shape != (len(self.class_names),)):
            raise ValueError("one multi threshold per class required")
        # multi-label presence head (apps.calibrate_multi --fit-head):
        # replaces softmax probs as the --multi presence score; floors in
        # multi_thresh then live in its sigmoid-score space
        self.multi_head = None
        if multi_head is not None:
            mw = np.asarray(multi_head[0], np.float32)
            mb = np.asarray(multi_head[1], np.float32)
            if mw.shape != self.fc_weight.shape or mb.shape != (
                    len(self.class_names),):
                raise ValueError(
                    f"multi_head shapes {mw.shape}/{mb.shape} must match "
                    f"the fc head {self.fc_weight.shape}")
            self.multi_head = (mw, mb)

    @property
    def head_mode(self) -> str:
        """'bins' for the (C, 1024) spatial-bin head, 'gap' for (C, 64).

        The reference ships a (6, 64) global-avg-pool head
        (training/train_cnn.py:320,343-346) while its inference scripts
        consume a (6, 1024) spatial-bin head produced by the dump->retrain
        loop (software/retrain_classifier.py:188-207). Both are supported;
        the mode is inferred from the fc weight shape.
        """
        d = self.fc_weight.shape[1]
        if d == self.config.feature_dim_bins:
            return "bins"
        if d == self.config.out_channels:
            return "gap"
        raise ValueError(f"unrecognised fc feature dim {d}")

    @classmethod
    def from_artifacts(cls, artifact_dir: str, **kw) -> "FpgaCNN":
        from tpu_cnn.utils import artifacts

        bundle = artifacts.load_bundle(artifact_dir)
        return cls(
            kernels=bundle.kernels,
            fc_weight=bundle.fc_weight,
            fc_bias=bundle.fc_bias,
            class_names=bundle.class_names,
            bbox_weight=bundle.bbox_weight,
            multi_thresh=bundle.multi_thresh,
            multi_head=bundle.multi_head,
            **kw,
        )
