"""On-device batched frame preprocessing.

The reference preprocesses per frame on the ARM CPU: center-crop to square,
cv2.COLOR_BGR2GRAY, area-resize to 128x128 (``software/realtime_detect.py:
584-591``). At TPU throughput (>100k FPS) host preprocessing would dominate,
so the same transform runs batched on device: one jit takes raw (B, H, W, 3)
uint8 camera frames and emits (B, 128, 128) uint8 model inputs.

Grayscale uses OpenCV's exact BT.601 fixed-point luma
(Y = (4899 R + 9617 G + 1868 B + 8192) >> 14), so color frames produce the
same model inputs as the reference pipeline. Area resize is an exact integer
mean when the crop size is a multiple of 128 (the common camera geometries).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# cv2's BGR2GRAY fixed-point BT.601 coefficients (R, G, B), >> 14 with
# round-half-up bias — bit-identical to OpenCV's integer path. Canonical
# values live in ops/luma.py (numpy-only) so host tools share them.
from tpu_cnn.ops.luma import (  # noqa: E402
    LUMA_B as _LUMA_B,
    LUMA_BIAS as _LUMA_BIAS,
    LUMA_G as _LUMA_G,
    LUMA_R as _LUMA_R,
    LUMA_SHIFT as _LUMA_SHIFT,
)


def bt601_gray(frames: jax.Array, channel_order: str = "bgr") -> jax.Array:
    """(..., 3) uint8 color -> (...) uint16 gray, cv2.COLOR_BGR2GRAY-exact."""
    c = frames.astype(jnp.uint32)
    if channel_order == "bgr":
        b, g, r = c[..., 0], c[..., 1], c[..., 2]
    elif channel_order == "rgb":
        r, g, b = c[..., 0], c[..., 1], c[..., 2]
    else:
        raise ValueError(f"channel_order must be 'bgr' or 'rgb', got {channel_order!r}")
    y = (_LUMA_R * r + _LUMA_G * g + _LUMA_B * b + _LUMA_BIAS) >> _LUMA_SHIFT
    return y.astype(jnp.uint16)


@partial(jax.jit, static_argnames=("out_size", "channel_order"))
def preprocess_frames(
    frames: jax.Array, out_size: int = 128, channel_order: str = "bgr"
) -> jax.Array:
    """(B, H, W[, 3]) uint8 -> (B, out_size, out_size) uint8.

    Center-crop to square, BT.601 grayscale (cv2-exact), area resize. For
    crop sizes that are not a multiple of ``out_size``, falls back to
    nearest sampling (same behaviour class as cv2.INTER_AREA's reduction
    path).
    """
    if frames.ndim == 4:
        gray = bt601_gray(frames, channel_order)
    else:
        gray = frames.astype(jnp.uint16)
    b, h, w = gray.shape
    s = min(h, w)
    y0, x0 = (h - s) // 2, (w - s) // 2
    crop = jax.lax.dynamic_slice(gray, (0, y0, x0), (b, s, s))

    if s % out_size == 0:
        f = s // out_size
        # exact integer area mean over f x f blocks
        blocks = crop.reshape(b, out_size, f, out_size, f).astype(jnp.uint32)
        small = blocks.sum(axis=(2, 4)) // (f * f)
    else:
        idx = (jnp.arange(out_size) * s // out_size).clip(0, s - 1)
        small = crop[:, idx][:, :, idx]
    return small.astype(jnp.uint8)
