"""Polyphase megakernel algebra: every stage must be bit-identical to the
oracle, using only kernel-legal primitives (rolls, slices, selects, matmuls,
block copies). This is the validated blueprint for the round-2 Pallas port."""

import numpy as np
import pytest

from tpu_cnn.engine.cpu_ref import numpy_cnn_forward, numpy_conv_layer
from tpu_cnn.models.cnn import DEFAULT_SHIFTS
from tpu_cnn.ops import polyphase_ref as pp
from tests.conftest import random_kernels


def test_phase_split_roundtrip(rng):
    img = rng.randint(0, 256, (64, 64)).astype(np.uint8)
    row = pp.phase_split(img, 8)
    back = pp.phase_merge(row, 8, 1)
    np.testing.assert_array_equal(back[0], img)


def test_tap_fetch_matches_padded_shift(rng):
    """_tap_fetch must equal the zero-padded spatial shift for every tap."""
    g, t = 4, 8
    s = g * t
    img = rng.randint(0, 256, (s, s)).astype(np.int32)
    row = pp.phase_split(img, g).astype(np.int32)
    pad = np.zeros((s + 2, s + 2), np.int32)
    pad[1:-1, 1:-1] = img
    for ay in (-1, 0, 1):
        for ax in (-1, 0, 1):
            got = pp._tap_fetch(row, g, t, ay, ax)
            want_spatial = pad[1 + ay : 1 + ay + s, 1 + ax : 1 + ax + s]
            want = pp.phase_split(want_spatial, g)
            np.testing.assert_array_equal(got, want, err_msg=f"tap {(ay, ax)}")


def test_conv_layer_polyphase_matches_oracle(rng):
    g, t = 8, 16  # layer-0 geometry of the stock net
    s = g * t
    img = rng.randint(0, 256, (s, s)).astype(np.uint8)
    k = rng.randint(-127, 128, (16, 1, 3, 3)).astype(np.int8)
    row = pp.phase_split(img, g)
    act = pp.conv_layer_polyphase(row, k, shift=2, g=g, t=t)
    # oracle pre-pool activations: conv -> shift -> clip (no pooling)
    ic, h, w = 1, s, s
    xp = np.zeros((1, h + 2, w + 2), np.int32)
    xp[0, 1:-1, 1:-1] = img
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(xp, (3, 3), axis=(1, 2))
    conv = np.tensordot(k.astype(np.int32), win, axes=([1, 2, 3], [0, 3, 4]))
    want = np.clip(conv >> 2, 0, 255).astype(np.uint8)  # (16, s, s)
    got_spatial = pp.phase_merge(act, g, 16)
    np.testing.assert_array_equal(got_spatial, want)


def test_pool_polyphase_matches_maxpool(rng):
    g, t = 4, 8
    s = g * t
    c = 16
    act_spatial = rng.randint(0, 256, (c, s, s)).astype(np.uint8)
    row = np.concatenate(
        [pp.phase_split(act_spatial[i], g) for i in range(c)], axis=0
    )
    pooled = pp.pool_polyphase(row, g, t)
    want_spatial = act_spatial.reshape(c, s // 2, 2, s // 2, 2).max(axis=(2, 4))
    got_spatial = pp.phase_merge(pooled, g // 2, c)
    np.testing.assert_array_equal(got_spatial, want_spatial)


def test_full_forward_polyphase_stock(stock_kernels, ramp_image):
    got = pp.cnn_forward_polyphase(ramp_image, stock_kernels)
    want = numpy_cnn_forward(ramp_image, stock_kernels)
    np.testing.assert_array_equal(got, want)


def test_full_forward_polyphase_random(rng):
    kernels = random_kernels(rng)
    img = rng.randint(0, 256, (128, 128)).astype(np.uint8)
    got = pp.cnn_forward_polyphase(img, kernels, shifts=(1, 3, 5))
    want = numpy_cnn_forward(img, kernels, shifts=(1, 3, 5))
    np.testing.assert_array_equal(got, want)


def test_vmem_estimate_counts_every_output_block():
    """The VMEM gate must model the EXACT kernel configuration the engine
    requests: the fused bins and the bf16 feature twin are extra
    double-buffered output blocks, so each must strictly grow the estimate,
    and the flagship geometry must fit with all of them counted."""
    from tpu_cnn.models.cnn import LAYER_CONFIGS
    from tpu_cnn.ops.pallas_poly import (
        POLY_VMEM_BUDGET,
        _poly_layer_params,
        poly_vmem_estimate,
        polyphase_supported,
    )

    lp, t = _poly_layer_params(LAYER_CONFIGS)
    base = poly_vmem_estimate(lp, t)
    bins = poly_vmem_estimate(lp, t, with_bins=True)
    full = poly_vmem_estimate(lp, t, with_bins=True, with_twin=True)
    assert base < bins < full
    # bf16 twin of the (tb, oc, m) features, double-buffered
    tb = 4
    oc, m = lp[-1][1], t * t
    assert full - bins == 2 * tb * oc * m * 2
    assert full <= POLY_VMEM_BUDGET
    assert polyphase_supported(LAYER_CONFIGS, with_bins=True, with_twin=True)
