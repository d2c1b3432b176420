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

import math
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


@partial(jax.jit, static_argnames=("out_size", "channel_order", "valid_w"))
def preprocess_frames(
    frames: jax.Array, out_size: int = 128, channel_order: str = "bgr",
    valid_w: int | None = None,
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

    ``valid_w``: real frame width when the staged row pitch W is wider
    (V4L2 ``bytesperline`` padding, or deliberate pad-width staging —
    see the phase-path gate below: a 128-word-aligned pitch defeats the
    fast strided-slice lowering, so staging 640-wide camera rows at a
    648/656-word pitch makes 480p preprocess ~2.4x faster). Columns
    beyond ``valid_w`` are never read.
    """
    # Crop FIRST (static lax.slice on the raw input), then demux: the luma
    # only runs on the kept square, and the static slice fuses into the
    # elementwise demux. The original gray-then-dynamic_slice formulation
    # measured 13.9 us/img at 480^2 vs 2.1 for this one
    # (scripts/profile_preprocess.py) — lax.dynamic_slice lowers as a real
    # dynamic op on TPU even with constant start indices, materialising the
    # full-frame gray and blocking fusion.
    b, h, w = frames.shape[:3]
    vw = w if valid_w is None else valid_w
    if not 0 < vw <= w:
        raise ValueError(f"valid_w {vw} out of range for staged width {w}")
    s = min(h, vw)
    y0, x0 = (h - s) // 2, (vw - s) // 2

    def to_gray(a: jax.Array) -> jax.Array:
        if a.ndim == 3 and a.dtype == jnp.uint32:
            return bt601_gray_packed(a, channel_order)
        if a.ndim == 4 and a.shape[-1] == 4:
            return bt601_gray_packed(a, channel_order)
        if a.ndim == 4:
            return bt601_gray(a, channel_order)
        return a.astype(jnp.uint16)

    if s % out_size == 0:
        cropped = jax.lax.slice(
            frames, (0, y0, x0) + (0,) * (frames.ndim - 3),
            (b, y0 + s, x0 + s) + tuple(frames.shape[3:]),
        )
        crop = to_gray(cropped)
        f = s // out_size
        # exact integer area mean over f x f blocks
        blocks = crop.reshape(b, out_size, f, out_size, f).astype(jnp.uint32)
        small = blocks.sum(axis=(2, 4)) // (f * f)
        return small.astype(jnp.uint8)

    # Nearest sampling. Column selection is a one-hot MATMUL on the MXU —
    # bit-identical to the gather formulation (one-hot bf16 weights, f32
    # accumulate: each output is a single exact 0..255 product) but ~20x
    # faster on TPU, where spatial gathers lower poorly (measured 18.8
    # us/img and ~8 min of XLA compile for a gather pair at 480^2 ->
    # 128^2; see docs/ROADMAP.md).
    col_idx = (jnp.arange(out_size) * s // out_size).clip(0, s - 1)
    col_sel = (jnp.arange(s)[:, None] == col_idx[None, :]).astype(jnp.bfloat16)

    g = math.gcd(s, out_size)
    q = out_size // g  # row-selection phase count
    stride = s // g
    # Phase-path gate, measured on the v5e (scripts/probe_preprocess_phase.py,
    # interleaved best-of-N, batch 2048 packed-BGRX): the phase path wins
    # UNLESS the staged row pitch W is a multiple of the 128-lane width
    # (the strided row slices then lower to a ~2-5x slower code path —
    # plausibly a degenerate VMEM-bank/layout choice when every kept row
    # starts lane-aligned) or the phase count q exceeds 8 (slice overhead
    # dominates). 12/12 measured points separate on exactly this rule,
    # us/img dense vs phase: 640x480 2.03/4.47, 384x240 0.95/1.78,
    # 512x416 1.55/3.56, 640x448 2.04/4.30 (all pitch%128==0 -> dense);
    # 300x200 1.46/3.81 q=16, 177x131 and 127x127 q>=128 (-> dense);
    # 320x240 1.81/0.80, 352x288 ~1.2/1.02, 480x352 3.02/0.81,
    # 720x560 6.93/0.95, 656x480 5.08/0.83 (-> phase). An earlier
    # s*stride<=4096 gate was falsified at 640x448 (3136, loses) vs
    # 720x560 (19600, wins); a jnp.take row gather loses everywhere
    # (2.4-29.5 us). W here is the full staged pitch, not valid_w — the
    # lowering follows the physical layout.
    if q <= 8 and w % 128 != 0:
        # Row selection as q phase-strided slices BEFORE the luma: the
        # nearest resize keeps only out_size of s rows, and because
        # idx[j] = j*s//out_size satisfies idx[j+q] = idx[j] + s//g
        # exactly, the kept rows decompose into q stride-(s//g) lax.slices
        # of g rows each. The demux+luma then touches s/out_size x fewer
        # pixels and XLA reads only the kept rows from HBM (the full-crop
        # formulation below materialises the whole bf16 crop as the row-
        # matmul operand). Bit-identical: same selected pixels, same luma,
        # same one-hot column contraction. Output row j = q*m + r comes
        # from phase r, slice-row m, so a stack on axis 2 re-interleaves.
        phases = []
        for r in range(q):
            off = r * s // out_size
            sl = jax.lax.slice(
                frames,
                (0, y0 + off, x0) + (0,) * (frames.ndim - 3),
                (b, y0 + off + (g - 1) * stride + 1, x0 + s)
                + tuple(frames.shape[3:]),
                (1, stride, 1) + (1,) * (frames.ndim - 3),
            )
            gray = to_gray(sl)  # (b, g, s) uint16
            phases.append(jax.lax.dot_general(  # contract s_x -> (b, g, out)
                gray.astype(jnp.bfloat16), col_sel,
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
        small = jnp.stack(phases, axis=2).reshape(b, out_size, out_size)
        return small.astype(jnp.uint8)

    # Dense path (lane-aligned pitch or q > 8, incl. nearly-coprime sizes
    # where phase slices degenerate toward one per row): two one-hot
    # matmuls over the full grayscale crop. At 640x480 this measures
    # 2.03 us/img — the luma-operand materialisation bound — while the
    # phase path's stride-15 reads over the aligned pitch lower to 4.47.
    cropped = jax.lax.slice(
        frames, (0, y0, x0) + (0,) * (frames.ndim - 3),
        (b, y0 + s, x0 + s) + tuple(frames.shape[3:]),
    )
    crop = to_gray(cropped)
    rows = jax.lax.dot_general(  # contract s_y -> (b, s_x, out_y)
        crop.astype(jnp.bfloat16), col_sel,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    small = jax.lax.dot_general(  # contract s_x -> (b, out_y, out_x)
        rows, col_sel,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return small.astype(jnp.uint8)
