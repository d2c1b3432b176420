"""Fused Pallas TPU kernels for the fixed-point conv layer.

This is the TPU-native re-expression of the reference's RTL datapath
(``rtl/core/``): line_buffer + sliding_window -> shifted tap views in VMEM;
16x conv_core MACs -> one int8 MXU matmul; accumulator BRAM -> the int32
matmul accumulator; ReLU + shift -> fused epilogue. The 2x2
max_pooling_engine runs as an XLA fusion between kernels (bandwidth-trivial,
and Mosaic lacks lane-pair reductions).

Math: pure integer end to end (int8 taps via zero-point shift, int8 weights,
int32 accumulate + exact host-precomputed correction) — bit-exact by
construction; see ``_kernel_body_mxu``.

One kernel shape for every layer, driven by Mosaic's 2D-native layout rules
(last two dims of every block must be (8k, 128k)-divisible or span the
array; no >2D reshapes/gathers): activations live as (B, C, H*W) with flat
spatial in lanes; taps are static lane-offset slices of the zero-extended
flat row (x-edge wrap masked), staged through a VMEM scratch; conv is one
(oc, 9ic) x (9ic, HW) MXU matmul per image.

The reference's hardware parallelism axes map as (SURVEY.md §2.1):
  16-way output-channel cores  -> MXU output rows / VPU channel loop
  output-channel batching      -> a single matmul M dim
  input-channel accumulate     -> matmul K dim (9*ic)
  layer-0 spatial tiling       -> batch-tile grid
  layer-sequential execution   -> one pallas_call per layer
  3-stage MAC pipeline         -> MXU systolic pipeline
"""

from __future__ import annotations

import os
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default() -> bool:
    env = os.environ.get("TPU_CNN_PALLAS_INTERPRET")
    if env is not None:
        return env not in ("0", "false", "")
    try:
        return jax.devices()[0].platform == "cpu"
    except Exception:
        return True


def _maxpool_nchw(x: jax.Array) -> jax.Array:
    b, c, h, w = x.shape
    return x.reshape(b, c, h // 2, 2, w // 2, 2).max(axis=(3, 5))


# ── all layers: flat-spatial lanes, MXU matmul per image ────────────
# (ic=1 uses the same kernel — a (tb, 1, hw) block is legal because the
# middle block dim equals the array dim.)


def _kernel_body_mxu(shift_ref, x_ref, k_ref, corr_ref, out_ref, xs_ref, *,
                     tb, ic, oc, h, w):
    """Multi-image block-diagonal int8 formulation.

    The whole tile's taps are staged with 9 wide int8 stores (all images at
    once, rows (tap, img, ic)-major) and contracted in ONE int8 MXU matmul
    against a (tb*oc, 9*tb*ic) block-diagonal int8 weight matrix — packing
    the MXU's M/K dims (a lone image gives M=16, K=9 for layer 0: <1%
    utilisation) and quartering VMEM staging traffic vs f32.

    uint8 activations don't fit int8, so taps are staged zero-point-shifted:
    s = a - 128 (computed as a XOR 0x80 bitcast to int8 — Mosaic has no
    u8->i8 value cast), with the exact host-precomputed correction
    128 * sum(k) added to the int32 accumulator. Zero-padding/masked taps
    therefore stage -128. All arithmetic stays integer: bit-exact by
    construction. ``h`` may differ from ``w`` (row-banded images: bands
    with halo rows run as extra batch, see fused_conv_layer)."""
    hw = h * w
    rows = tb * ic
    shift = shift_ref[0]

    # x-edge wrap masks (lane constants): tap dx=0 reads x-1 (invalid at
    # x=0); dx=2 reads x+1 (invalid at x=W-1).
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, hw), 1) % w
    masks = {0: col >= 1, 1: None, 2: col <= w - 2}

    x_u8 = x_ref[:].reshape(rows, hw)
    x_i8 = pltpu.bitcast(x_u8 ^ jnp.uint8(0x80), jnp.int8)  # a - 128
    neg128 = jnp.full((rows, w + 1), -128, jnp.int8)
    xflat = jnp.concatenate([neg128, x_i8, neg128], axis=1)  # "zero" y-borders
    # Stage the 9 shifted taps into the VMEM scratch, rows (tap, img, ic).
    # Staging through the ref canonicalises each slice's lane-offset layout —
    # Mosaic cannot concatenate misaligned-layout values.
    for i, (dy, dx) in enumerate((a, c) for a in range(3) for c in range(3)):
        off = (w + 1) + (dy - 1) * w + (dx - 1)
        t = jax.lax.slice(xflat, (0, off), (rows, off + hw))
        if masks[dx] is not None:
            t = jnp.where(masks[dx], t, jnp.int8(-128))
        xs_ref[i * rows : (i + 1) * rows, :] = t
    acc = jnp.dot(k_ref[:], xs_ref[:], preferred_element_type=jnp.int32)
    acc = acc + corr_ref[:]  # zero-point correction, (tb*oc, 1) broadcast
    act = jnp.clip(jnp.right_shift(acc, shift), 0, 255)  # (tb*oc, hw)
    out_ref[:] = act.reshape(tb, oc, hw).astype(jnp.uint8)


def _pack_blockdiag(kmat: jax.Array, tb: int, ic: int) -> tuple[jax.Array, jax.Array]:
    """(oc, 9ic) -> ((tb*oc, 9*tb*ic) int8 block-diagonal weights matching
    the (tap, img, ic)-major staged tap rows — W[(i,o), (t,i',c)] = k[o,t,c]
    iff i == i' — plus the (tb*oc, 1) int32 zero-point correction
    128 * sum_k per output row)."""
    oc = kmat.shape[0]
    k_toc = kmat.reshape(oc, 9, ic)  # (oc, tap, ic)
    w = jnp.zeros((tb, oc, 9, tb, ic), jnp.float32)
    idx = jnp.arange(tb)
    w = w.at[idx, :, :, idx, :].set(jnp.broadcast_to(k_toc, (tb, oc, 9, ic)))
    w2d = w.reshape(tb * oc, 9 * tb * ic)
    corr = (128.0 * w2d.sum(axis=1, keepdims=True)).astype(jnp.int32)
    return w2d.astype(jnp.int8), corr


def plan_batch_tile(hw: int, ic: int, oc: int, b: int | None = None) -> int:
    """Largest power-of-two batch tile whose VMEM working set fits ~9 MB
    (int8 taps 9*ic*hw + int32 acc 4*oc*hw per image), capped at 8 and
    divided down to divide ``b`` when given."""
    per_img = hw * (9 * ic + 4 * oc)
    limit = max(1, min(8, (9 * 1024 * 1024) // per_img))
    tb = 1
    while tb * 2 <= limit:
        tb *= 2
    if b is not None:
        while b % tb:
            tb //= 2
    return tb


def _conv_mxu(x: jax.Array, kmat: jax.Array, shift: jax.Array,
              interpret: bool, h: int | None = None, w: int | None = None):
    """(B, ic, HW) u8, (oc, 9ic) f32 -> (B, oc, HW) u8 pre-pool activations.
    ``h``/``w`` default to the square geometry; banded callers pass the
    rectangle explicitly."""
    b, ic, hw = x.shape
    oc = kmat.shape[0]
    if h is None:
        h = w = int(round(hw**0.5))
    assert h * w == hw
    tb = plan_batch_tile(hw, ic, oc, b)
    kpacked, corr = _pack_blockdiag(kmat, tb, ic)
    return pl.pallas_call(
        partial(_kernel_body_mxu, tb=tb, ic=ic, oc=oc, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((b, oc, hw), jnp.uint8),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # shift in SMEM
            grid=(b // tb,),
            in_specs=[
                pl.BlockSpec((tb, ic, hw), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tb, oc, hw), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.VMEM((9 * tb * ic, hw), jnp.int8)],
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * oc * 9 * ic * hw * b,
            bytes_accessed=b * hw * (ic + oc) + kpacked.size,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.reshape(shift.astype(jnp.int32), (1,)), x, kpacked, corr)


def _plan_bands(h: int, w: int, ic: int, oc: int) -> int | None:
    """Smallest band count nb (dividing h, even band height for the pool)
    whose banded tile regains >= 4 sublane rows. None if no nb works."""
    for nb in (2, 4, 8, 16, 32):
        if h % nb or (h // nb) % 2:
            continue
        bh = h // nb + 2  # + halo rows
        if plan_batch_tile(bh * w, ic, oc) * ic >= 4:
            return nb
    return None


def _fused_conv_layer_banded(x: jax.Array, kmat: jax.Array, shift: jax.Array,
                             nb: int, *, interpret: bool) -> jax.Array:
    """Row-banded conv layer: (B, ic, h, w) -> (B, oc, h/2, w/2), bands run
    as batch through the SAME kernel (each band is a (bh+2, w) 'image'
    whose halo-row outputs are cropped)."""
    b, ic, h, w = x.shape
    oc = kmat.shape[0]
    bh = h // nb
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))  # zero halo at edges
    bands = jnp.stack(
        [
            jax.lax.slice(xp, (0, 0, r * bh, 0), (b, ic, r * bh + bh + 2, w))
            for r in range(nb)
        ],
        axis=1,
    )  # (B, nb, ic, bh+2, w)
    xb = bands.reshape(b * nb, ic, (bh + 2) * w)
    pb = b * nb
    if not interpret and pb % 4:
        pad = ((pb + 3) // 4) * 4 - pb
        xb = jnp.concatenate(
            [xb, jnp.zeros((pad, ic, (bh + 2) * w), xb.dtype)], axis=0
        )
    act = _conv_mxu(xb, kmat, shift, interpret, h=bh + 2, w=w)[: b * nb]
    act = act.reshape(b, nb, oc, bh + 2, w)[:, :, :, 1:-1, :]  # crop halos
    act = jnp.transpose(act, (0, 2, 1, 3, 4)).reshape(b, oc, h, w)
    return _maxpool_nchw(act)


# ── public API ───────────────────────────────────────────────────────


def pack_kernel_matrix(kernel: np.ndarray | jax.Array) -> jax.Array:
    """(oc, ic, 3, 3) int8 -> (oc, 9*ic) f32, tap-major / ic-minor."""
    k = jnp.asarray(kernel, jnp.float32)
    oc, ic = k.shape[:2]
    return jnp.transpose(k, (0, 2, 3, 1)).reshape(oc, 9 * ic)


def _unpack_kernel_matrix(kmat: jax.Array, ic: int) -> jax.Array:
    """Inverse of :func:`pack_kernel_matrix`: (oc, 9*ic) f32 -> (oc, ic, 3, 3)
    int8 (exact — packed values are small integers)."""
    oc = kmat.shape[0]
    return jnp.transpose(
        kmat.reshape(oc, 3, 3, ic), (0, 3, 1, 2)
    ).astype(jnp.int8)


def fused_conv_layer(
    x: jax.Array,  # (B, ic, H, W) uint8
    kmat: jax.Array,  # (oc, 9*ic) float32
    shift: jax.Array,  # scalar int32
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """One contract layer (conv3x3 -> >>shift -> clip in Pallas, 2x2 pool in
    XLA). Returns (B, oc, H/2, W/2) uint8."""
    b, ic, h, w = x.shape
    oc = kmat.shape[0]
    assert h == w, "square geometry"
    if interpret is None:
        interpret = _interpret_default()
    # Mosaic miscompiles the int8 tap staging for tiles with < 4 sublane
    # rows (observed on v5e 2026-08-16: ~0.5% wrong values, SILENTLY).
    # Two ways a tile can degrade below 4 rows: a small batch (padded to a
    # multiple of 4 below) — or a geometry so large that the VMEM budget
    # forces tb*ic < 4 (lyr4-wide's 256^2 layer 0: tb=1, ic=1; caught by
    # the hardware variant sweep 2026-08-16). The latter can't be padded
    # away, so that layer runs the XLA conv instead — same contract,
    # bit-exact. A ROW-BANDED Pallas alternative exists
    # (``_fused_conv_layer_banded``: 1-row-halo bands as extra batch,
    # restoring >= 4 sublane rows — the reference's layer-0 capacity
    # split on the sublane axis, hardware-verified bit-exact) but it
    # MEASURED SLOWER on chip for lyr4's 256^2 L0 (27.8k vs 34.3k FPS
    # e2e: the band assembly + crop/reassemble relayouts cost more than
    # the int8 kernel saves over the XLA conv), so XLA stays the default
    # here; the banded path remains available for callers that want it.
    if plan_batch_tile(h * w, ic, oc) * ic < 4:
        from tpu_cnn.ops import quant

        nhwc = jnp.transpose(x, (0, 2, 3, 1))
        out = quant.fixed_point_conv_layer(
            nhwc, _unpack_kernel_matrix(kmat, ic), shift
        )
        return jnp.transpose(out, (0, 3, 1, 2))
    pb = b
    if not interpret and b % 4:
        pb = ((b + 3) // 4) * 4
        x = jnp.concatenate(
            [x, jnp.zeros((pb - b, ic, h, w), x.dtype)], axis=0
        )
    act3 = _conv_mxu(x.reshape(pb, ic, h * w), kmat, shift, interpret)
    act = act3[:b].reshape(b, kmat.shape[0], h, w)
    return _maxpool_nchw(act)


@partial(jax.jit, static_argnames=("interpret",))
def cnn_forward_hybrid(
    images: jax.Array,  # (B, S, S) or (B, S, S, 1) uint8
    kernels: Sequence[jax.Array],
    shifts: jax.Array,
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Fastest measured single-chip path: layer 0 on the Pallas int8 kernel
    (wins on the ic=1 geometry), deeper layers on XLA convs (win there).
    Bit-exact like both constituents; same output contract."""
    from tpu_cnn.ops import quant

    if images.ndim == 4:
        images = images[..., 0]
    x4 = images[:, None, :, :]
    kmat0 = pack_kernel_matrix(kernels[0])
    a = fused_conv_layer(x4, kmat0, shifts[0], interpret=interpret)
    x = jnp.transpose(a, (0, 2, 3, 1))  # NCHW -> NHWC for the XLA layers
    for i, k in enumerate(kernels[1:], start=1):
        x = quant.fixed_point_conv_layer(x, k, shifts[i])
    b, h, w, c = x.shape
    return jnp.transpose(x, (0, 3, 1, 2)).reshape(b, c, h * w)


@partial(jax.jit, static_argnames=("interpret",))
def cnn_forward_pallas(
    images: jax.Array,  # (B, S, S) or (B, S, S, 1) uint8
    kernels: Sequence[jax.Array],  # per-layer (oc, ic, 3, 3) int8
    shifts: jax.Array,  # (n_layers,) int32
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Full forward on the Pallas path. Returns (B, oc, S'*S') uint8 — same
    layout contract as ``ops.quant.cnn_forward``."""
    if images.ndim == 4:
        images = images[..., 0]
    x = images[:, None, :, :]  # (B, 1, S, S) NCHW
    for i, k in enumerate(kernels):
        kmat = pack_kernel_matrix(k)
        x = fused_conv_layer(x, kmat, shifts[i], interpret=interpret)
    b, c, h, w = x.shape
    return x.reshape(b, c, h * w)
