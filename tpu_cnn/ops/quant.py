"""The fixed-point contract in pure jnp/XLA — the bit-exactness oracle on device.

This module is the TPU-native equivalent of the reference's four
bit-identical implementations of the conv layer (RTL datapath
``rtl/core/conv_core.v`` + ``accumulator.v`` + ``ReLU.v`` +
``max_pooling_engine.v``; C ``software/arm_cnn.c:68-146``; numpy
``software/arm_benchmark.py:76-121``; QAT sim ``training/train_cnn.py:101-116``).

Contract per layer (uint8 activations, int8 weights):

    conv  = SAME 3x3 conv, integer accumulate
    wrap  = optional 24-bit two's-complement wraparound (QAT-sim semantics,
            ``train_cnn.py:110-111``; a no-op for all reachable activations)
    out   = clip(conv >> shift, 0, 255)      # arithmetic shift (floor)
    pool  = 2x2 stride-2 max

Why float32 is bit-exact here
-----------------------------
Every product uint8*int8 is an integer with |p| <= 255*127, and the largest
per-position accumulation is 32 channels * 9 taps * 255 * 127 = 9,327,360
< 2^24 = 16,777,216. Every partial sum is therefore an integer exactly
representable in float32's 24-bit significand, so an f32 MXU convolution
produces exactly the integer result — the fast path on TPU hardware while
keeping bit parity with the int32 oracle. (The QAT sim's 24-bit wrap could in
principle differ above +-2^23, but no uint8 input can reach it for layers 0/1,
and layer 2's theoretical max 9.3M is unreachable: it would require every
activation at 255 and every weight at 127 simultaneously, which the global
weight scale precludes — asserted in tests against the shipped weights.)
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

from tpu_cnn.models.cnn import ACCUM_BITS, LAYER_CONFIGS


def wrap_accum(x: jax.Array, bits: int = ACCUM_BITS) -> jax.Array:
    """24-bit two's-complement wraparound of an int32/f32 accumulator.

    Matches ``training/train_cnn.py:110-111``: ``((x + M) % (2M)) - M``.
    """
    m = 1 << (bits - 1)
    return ((x + m) % (2 * m)) - m


def shift_relu_clamp(conv: jax.Array, shift: jax.Array) -> jax.Array:
    """clip(conv >> shift, 0, 255) with arithmetic (floor) shift semantics.

    Works for int32 (true right_shift) and f32 (floor division by 2^shift —
    exact for integer-valued f32 below 2^24) accumulators. ``shift`` may be a
    traced scalar: it is a *runtime* register in the reference
    (``software/pynq_inference.py:226-229``), so no recompilation on change.
    """
    if jnp.issubdtype(conv.dtype, jnp.integer):
        shifted = jnp.right_shift(conv, shift.astype(conv.dtype))
    else:
        shifted = jnp.floor(conv / jnp.exp2(shift.astype(conv.dtype)))
    return jnp.clip(shifted, 0, 255)


def maxpool2x2(x: jax.Array) -> jax.Array:
    """2x2 stride-2 max pool over NHWC."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


def conv3x3_same(x: jax.Array, kernel: jax.Array, compute_dtype: str) -> jax.Array:
    """The contract's SAME 3x3 convolution with exact integer accumulation:
    (B, H, W, ic) x (oc, ic, 3, 3) -> (B, H, W, oc) in the accumulator dtype
    (f32 for f32/bf16 compute — exact below 2^24, module docstring — int32
    for int32). Shared by the layer function and the spatially-sharded halo
    path (``parallel/spatial.py``) so the contract lives in one place."""
    cdt = jnp.dtype(compute_dtype)
    acc_dt = jnp.float32 if cdt == jnp.bfloat16 else cdt
    rhs = jnp.transpose(kernel, (2, 3, 1, 0)).astype(cdt)  # (oc,ic,3,3)->HWIO
    return lax.conv_general_dilated(
        x.astype(cdt),
        rhs,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dt,
    )


def conv_epilogue(
    conv: jax.Array, shift: jax.Array, *, accum_wrap: bool
) -> jax.Array:
    """[wrap24] -> >>shift -> clip -> 2x2 pool -> uint8: the contract's
    post-accumulation chain, shared with the spatial halo path."""
    if accum_wrap:
        conv = wrap_accum(conv)
    return maxpool2x2(shift_relu_clamp(conv, shift)).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("accum_wrap", "compute_dtype"))
def fixed_point_conv_layer(
    x: jax.Array,  # (B, H, W, ic) uint8
    kernel: jax.Array,  # (oc, ic, 3, 3) int8
    shift: jax.Array,  # scalar int32 (may be traced)
    *,
    accum_wrap: bool = False,
    compute_dtype: str = "float32",
) -> jax.Array:
    """One contract layer: SAME conv3x3 -> [wrap24] -> >>shift -> clip -> pool.

    Returns (B, H/2, W/2, oc) uint8. ``compute_dtype``:
      - 'float32': exact f32 MXU path (see module docstring) — TPU fast path.
      - 'int32'  : integer conv, the literal oracle semantics.
    """
    # bf16 inputs are exact here (activations <= 255 and weights <= 127 are
    # exactly representable in bf16's 8-bit significand) and accumulate in
    # f32 to stay exact; int32/f32 accumulate in themselves (conv3x3_same).
    conv = conv3x3_same(x, kernel, compute_dtype)
    return conv_epilogue(conv, shift, accum_wrap=accum_wrap)


@partial(jax.jit, static_argnames=("accum_wrap", "compute_dtype"))
def cnn_forward(
    images: jax.Array,  # (B, 128, 128) or (B, 128, 128, 1) uint8
    kernels: Sequence[jax.Array],  # per-layer (oc, ic, 3, 3) int8
    shifts: jax.Array,  # (num_layers,) int32
    *,
    accum_wrap: bool = False,
    compute_dtype: str = "float32",
) -> jax.Array:
    """Full multi-layer forward. Returns (B, oc, S*S) uint8 features in the
    reference's (channel, flattened-spatial) dump layout
    (``software/pynq_inference.py:267-286`` -> (64, 256))."""
    x = images if images.ndim == 4 else images[..., None]
    for i, k in enumerate(kernels):
        x = fixed_point_conv_layer(
            x, k, shifts[i], accum_wrap=accum_wrap, compute_dtype=compute_dtype
        )
    # NHWC -> (B, C, H*W)
    b, h, w, c = x.shape
    return jnp.transpose(x, (0, 3, 1, 2)).reshape(b, c, h * w)


@partial(jax.jit, static_argnames=("accum_wrap", "compute_dtype", "chunk"))
def cnn_forward_chunked(
    images: jax.Array,  # (B, S, S) uint8, B % chunk == 0
    kernels: Sequence[jax.Array],
    shifts: jax.Array,
    *,
    chunk: int = 512,
    accum_wrap: bool = False,
    compute_dtype: str = "float32",
) -> jax.Array:
    """Large-batch forward with bounded peak memory: lax.map over sub-batches
    so the f32 conv intermediates (the dominant HBM cost at ~1 MB/image for
    layer 0) never exceed one chunk. Output identical to ``cnn_forward``."""
    b = images.shape[0]
    if b <= chunk:
        return cnn_forward(
            images, kernels, shifts, accum_wrap=accum_wrap, compute_dtype=compute_dtype
        )
    assert b % chunk == 0, (b, chunk)
    x = images.reshape(b // chunk, chunk, *images.shape[1:])

    def f(xc):
        return cnn_forward(
            xc, kernels, shifts, accum_wrap=accum_wrap, compute_dtype=compute_dtype
        )

    out = jax.lax.map(f, x)
    return out.reshape(b, *out.shape[2:])


def theoretical_accum_bound(
    kernels: Sequence[jax.Array] | Sequence["np.ndarray"],
) -> int:
    """Max possible |accumulator| given concrete weights: 255 * sum|w| per
    output channel. Used to certify the f32-exactness invariant and the
    irrelevance of the 24-bit wrap for a given weight set."""
    import numpy as np

    bound = 0
    for k in kernels:
        per_oc = np.abs(np.asarray(k, dtype=np.int64)).sum(axis=(1, 2, 3))
        bound = max(bound, int(per_oc.max()) * 255)
    return bound
