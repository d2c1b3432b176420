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


def bt601_gray_packed(words: jax.Array, channel_order: str = "bgr") -> jax.Array:
    """(...) uint32 packed BGRX/RGBX pixels -> (...) uint16 gray, same math.

    The packed fast path: one little-endian u32 word per pixel (byte 0 =
    channel 0) turns the channel demux into full-lane-occupancy
    shifts/masks — no stride-3 access at all. On TPU a trailing 3- or
    4-wide channel dim wastes most of each 128-lane register; packing on
    the host is a free ``.view(uint32)`` (``ops.luma.pack_bgrx``) and
    cameras/V4L2/GPU paths commonly deliver XRGB/BGRX natively. The 4th
    byte is ignored. Accepts a (..., 4) uint8 array too (bitcast here)."""
    if words.dtype != jnp.uint32:
        words = jax.lax.bitcast_convert_type(words, jnp.uint32)
    c0 = words & 0xFF
    c1 = (words >> 8) & 0xFF
    c2 = (words >> 16) & 0xFF
    if channel_order == "bgr":
        b, g, r = c0, c1, c2
    elif channel_order == "rgb":
        r, g, b = c0, c1, c2
    else:
        raise ValueError(f"channel_order must be 'bgr' or 'rgb', got {channel_order!r}")
    y = (_LUMA_R * r + _LUMA_G * g + _LUMA_B * b + _LUMA_BIAS) >> _LUMA_SHIFT
    return y.astype(jnp.uint16)


@partial(jax.jit, static_argnames=("out_size", "channel_order"))
def preprocess_frames(
    frames: jax.Array, out_size: int = 128, channel_order: str = "bgr"
) -> jax.Array:
    """(B, H, W[, 3|4]) uint8 — or (B, H, W) uint32 packed BGRX — to
    (B, out_size, out_size) uint8.

    Center-crop to square, BT.601 grayscale (cv2-exact), area resize. For
    crop sizes that are not a multiple of ``out_size``, falls back to
    nearest sampling (same behaviour class as cv2.INTER_AREA's reduction
    path). The uint32 packed form (host: ``ops.luma.pack_bgrx``, a free
    reinterpret for 4-channel sources) is the production ingest layout:
    a trailing 3/4-wide channel dim wastes most of each 128-lane register
    on TPU, while packed words demux with plain shifts.
    """
    # Crop FIRST (static lax.slice on the raw input), then demux: the luma
    # only runs on the kept square, and the static slice fuses into the
    # elementwise demux. The original gray-then-dynamic_slice formulation
    # measured 13.9 us/img at 480^2 vs 2.1 for this one
    # (scripts/profile_preprocess.py) — lax.dynamic_slice lowers as a real
    # dynamic op on TPU even with constant start indices, materialising the
    # full-frame gray and blocking fusion.
    b, h, w = frames.shape[:3]
    s = min(h, w)
    y0, x0 = (h - s) // 2, (w - s) // 2
    cropped = jax.lax.slice(
        frames, (0, y0, x0) + (0,) * (frames.ndim - 3),
        (b, y0 + s, x0 + s) + tuple(frames.shape[3:]),
    )
    if frames.ndim == 3 and frames.dtype == jnp.uint32:
        crop = bt601_gray_packed(cropped, channel_order)
    elif frames.ndim == 4 and frames.shape[-1] == 4:
        crop = bt601_gray_packed(cropped, channel_order)
    elif frames.ndim == 4:
        crop = bt601_gray(cropped, channel_order)
    else:
        crop = cropped.astype(jnp.uint16)

    if s % out_size == 0:
        f = s // out_size
        # exact integer area mean over f x f blocks
        blocks = crop.reshape(b, out_size, f, out_size, f).astype(jnp.uint32)
        small = blocks.sum(axis=(2, 4)) // (f * f)
    else:
        # nearest sampling as two one-hot selection MATMULS on the MXU —
        # bit-identical to the gather formulation (one-hot bf16 weights,
        # f32 accumulate: each output is a single exact 0..255 product)
        # but ~20x faster on TPU, where spatial gathers lower poorly
        # (measured 18.8 us/img and ~8 min of XLA compile for the
        # gather pair at 480^2 -> 128^2; see docs/ROADMAP.md).
        idx = (jnp.arange(out_size) * s // out_size).clip(0, s - 1)
        sel = (jnp.arange(s)[:, None] == idx[None, :]).astype(jnp.bfloat16)
        rows = jax.lax.dot_general(  # contract s_y -> (b, s_x, out_y)
            crop.astype(jnp.bfloat16), sel,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        small = jax.lax.dot_general(  # contract s_x -> (b, out_y, out_x)
            rows, sel,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return small.astype(jnp.uint8)
