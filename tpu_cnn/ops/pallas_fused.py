"""Megakernel: the ENTIRE multi-layer network in one Pallas kernel.

The reference's datapath runs all three layers back-to-back through the same
silicon with muxed geometry (``rtl/core/cnn_acc_top.v:45-54``,
``layer_fsm.v CHECK_LAYER``) — activations never leave the chip's BRAMs.
This kernel is the TPU equivalent: per image, every layer's taps, matmuls,
shift/clip epilogues AND 2x2 maxpools run inside one pallas_call with all
activations resident in VMEM. HBM traffic per image is just the 16 KB input
+ 16 KB feature output (vs ~3 MB/img for the per-layer XLA path).

Everything stays in the flat (C, H*W) lanes layout:

  * taps: static lane-offset slices of the zero-extended flat row (x-edge
    wrap masked), staged via a VMEM scratch per layer (canonicalises the
    lane-offset layouts for the concat-free matmul).
  * conv: one (oc, 9ic) x (9ic, HW) MXU matmul per layer, f32 (bit-exact —
    see ops.quant).
  * pool: lane rolls give each even position the max of its 2x2 block; a
    shape-preserving lane gather (``take_along_axis``, the one gather form
    Mosaic supports) compacts even rows/cols into the first HW/4 lanes.

Activations stay f32 across layers (clip makes them exact uint8-valued
integers; no precision is lost and no u8 round-trips are needed in-kernel).

STATUS: bit-exact in interpret mode (tested); on this environment's Mosaic
build the lane gather crashes the compiler for arrays wider than 128 lanes
(remote_compile HTTP 500; probed 2026-08-16 — rolls are fine at 16384 lanes,
gathers are not, 2D transposes hang), so the hardware path is gated off until
the toolchain catches up or the compaction is re-expressed. The per-layer
kernels in ``ops.pallas_int8`` are the working hardware Pallas path.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_cnn.ops.pallas_int8 import _interpret_default, pack_kernel_matrix


def _stage_and_conv(xval, k_ref, shift, xs_ref, ic, w):
    """xval (ic, hw) f32 -> clipped activations (oc, hw) f32."""
    hw = w * w
    col = jax.lax.broadcasted_iota(jnp.int32, (ic, hw), 1) % w
    masks = {
        0: (col >= 1).astype(jnp.float32),
        1: None,
        2: (col <= w - 2).astype(jnp.float32),
    }
    zpad = jnp.zeros((ic, w + 1), jnp.float32)
    xflat = jnp.concatenate([zpad, xval, zpad], axis=1)
    for i, (dy, dx) in enumerate((a, c) for a in range(3) for c in range(3)):
        off = (w + 1) + (dy - 1) * w + (dx - 1)
        t = jax.lax.slice(xflat, (0, off), (ic, off + hw))
        if masks[dx] is not None:
            t = t * masks[dx]
        xs_ref[i * ic : (i + 1) * ic, :] = t
    acc = jnp.dot(k_ref[:], xs_ref[:], preferred_element_type=jnp.float32)
    scale = jnp.exp2(-shift.astype(jnp.float32))
    return jnp.clip(jnp.floor(acc * scale), 0.0, 255.0)


def _pool_flat(act, w):
    """(C, hw) f32 -> (C, hw/4) f32 2x2 maxpool in flat-lane space."""
    c, hw = act.shape
    # pltpu.roll requires non-negative shifts; roll by hw-k == shift by -k
    u = jnp.maximum(act, pltpu.roll(act, hw - 1, axis=1))  # x-pair max at even x
    u = jnp.maximum(u, pltpu.roll(u, hw - w, axis=1))  # y-pair max at even y
    w2 = w // 2
    p = jax.lax.broadcasted_iota(jnp.int32, (c, hw), 1)
    pidx = (2 * (p // w2) * w + 2 * (p % w2)) % hw  # compaction map
    g = jnp.take_along_axis(u, pidx, axis=1)
    return jax.lax.slice(g, (0, 0), (c, hw // 4))


def _mega_body(shift_ref, x_ref, *rest, layer_params):
    n_layers = len(layer_params)
    k_refs = rest[:n_layers]
    out_ref = rest[n_layers]
    xs_refs = rest[n_layers + 1 :]
    x = x_ref[0].astype(jnp.int32).astype(jnp.float32)  # (1, hw0)
    for li, (ic, oc, w) in enumerate(layer_params):
        act = _stage_and_conv(x, k_refs[li], shift_ref[li], xs_refs[li], ic, w)
        x = _pool_flat(act, w)
    out_ref[0] = x.astype(jnp.int32).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("interpret",))
def cnn_forward_megakernel(
    images: jax.Array,  # (B, S, S) or (B, S, S, 1) uint8
    kernels: Sequence[jax.Array],  # per-layer (oc, ic, 3, 3) int8
    shifts: jax.Array,  # (n_layers,) int32
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Full forward, one kernel. Returns (B, oc_last, S'*S') uint8 — same
    layout contract as ``ops.quant.cnn_forward``."""
    if images.ndim == 4:
        images = images[..., 0]
    b, s, _ = images.shape
    if interpret is None:
        interpret = _interpret_default()

    layer_params = []
    w = s
    for k in kernels:
        oc, ic = k.shape[:2]
        layer_params.append((ic, oc, w))
        w //= 2
    oc_last = layer_params[-1][1]
    hw_last = (layer_params[-1][2] // 2) ** 2

    kmats = [pack_kernel_matrix(k) for k in kernels]
    x3 = images.reshape(b, 1, s * s)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # shifts vector in SMEM
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, s * s), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in kernels],
        ],
        out_specs=pl.BlockSpec(
            (1, oc_last, hw_last), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((9 * ic, w * w), jnp.float32) for ic, oc, w in layer_params
        ],
    )
    total_macs = sum(oc * 9 * ic * w * w for ic, oc, w in layer_params)
    out = pl.pallas_call(
        partial(_mega_body, layer_params=layer_params),
        out_shape=jax.ShapeDtypeStruct((b, oc_last, hw_last), jnp.uint8),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * total_macs * b,
            bytes_accessed=b * (s * s + oc_last * hw_last),
            transcendentals=0,
        ),
        interpret=interpret,
    )(shifts.astype(jnp.int32), x3, *kmats)
    return out
