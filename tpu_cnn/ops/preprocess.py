"""On-device batched frame preprocessing.

The reference preprocesses per frame on the ARM CPU: center-crop to square,
BGR->gray, area-resize to 128x128 (``software/realtime_detect.py:584-591``).
At TPU throughput (>100k FPS) host preprocessing would dominate, so the same
transform runs batched on device: one jit takes raw (B, H, W, 3) uint8 camera
frames and emits (B, 128, 128) uint8 model inputs. Exact integer area-mean
when the crop size is a multiple of 128 (the common camera geometries).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("out_size",))
def preprocess_frames(frames: jax.Array, out_size: int = 128) -> jax.Array:
    """(B, H, W[, 3]) uint8 -> (B, out_size, out_size) uint8.

    Center-crop to square, channel-mean grayscale, area resize. For crop
    sizes that are not a multiple of ``out_size``, falls back to nearest
    sampling (same behaviour class as cv2.INTER_AREA's reduction path).
    """
    if frames.ndim == 4:
        gray = frames.astype(jnp.uint16).sum(axis=3) // 3  # channel mean
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
