"""weights.bin codec tests — layout parity with the reference's loop parsers."""

import numpy as np
import pytest

from tpu_cnn.models.cnn import LAYER_CONFIGS, WEIGHT_BYTES
from tpu_cnn.utils import weights as wc


def loop_decode(raw, layer_configs):
    """Straight transcription of the documented layout (SURVEY.md §0) as an
    independent check of the vectorised codec."""
    kernels, idx = [], 0
    raw = np.asarray(raw, dtype=np.int8)
    for ic, oc, _ in layer_configs:
        k = np.zeros((oc, ic, 3, 3), dtype=np.int8)
        for ob in range(oc // 16):
            for i in range(ic):
                for core in range(16):
                    o = ob * 16 + core
                    for w in range(9):
                        k[o, i, w // 3, w % 3] = raw[idx]
                        idx += 1
        kernels.append(k)
    return kernels


def test_decode_matches_loop_reference(rng):
    raw = rng.randint(-128, 128, size=WEIGHT_BYTES).astype(np.int8)
    fast = wc.decode_weights(raw)
    slow = loop_decode(raw, LAYER_CONFIGS)
    for a, b in zip(fast, slow):
        np.testing.assert_array_equal(a, b)


def test_roundtrip(rng):
    raw = rng.randint(-128, 128, size=WEIGHT_BYTES).astype(np.int8)
    kernels = wc.decode_weights(raw)
    blob = wc.encode_weights(kernels)
    np.testing.assert_array_equal(np.frombuffer(blob, np.int8), raw)


def test_stock_weights_shape(stock_kernels):
    shapes = [k.shape for k in stock_kernels]
    assert shapes == [(16, 1, 3, 3), (32, 16, 3, 3), (64, 32, 3, 3)]


def test_stock_weights_range(stock_kernels):
    # Symmetric quantisation clamps to [-127, 127] (train_cnn.py:189).
    for k in stock_kernels:
        assert k.min() >= -127 and k.max() <= 127


def test_quantize_global():
    floats = [np.array([[[[0.5, -1.0, 0.25]]]]), np.array([[[[0.1]]]])]
    q, scale = wc.quantize_global(floats)
    assert scale == pytest.approx(127.0)
    assert q[0].ravel().tolist() == [64, -127, 32]
    assert q[1].ravel().tolist() == [13]


def test_size_validation():
    with pytest.raises(ValueError):
        wc.decode_weights(np.zeros(100, dtype=np.int8))


def test_quantize_per_layer_full_grid_per_layer():
    """Per-layer export scales: each layer's absmax maps to +-127 — small
    layers keep full int8 precision even next to a large-|w| layer (the
    global scale squeezes them; see ROADMAP round-3 flagship probe)."""
    rs = np.random.RandomState(0)
    big = rs.randn(16, 1, 3, 3).astype(np.float32) * 4.0
    small = rs.randn(32, 16, 3, 3).astype(np.float32) * 0.05
    qg, g_scale = wc.quantize_global([big, small])
    qp, scales = wc.quantize_per_layer([big, small])
    # per-layer: both layers use the full grid
    assert np.abs(qp[0]).max() == 127 and np.abs(qp[1]).max() == 127
    # global: the small layer is squeezed to a tiny fraction of the grid
    assert np.abs(qg[1]).max() < 8
    # scales recover the floats to rounding error, layer by layer
    for q, s, f in zip(qp, scales, (big, small)):
        np.testing.assert_allclose(q.astype(np.float32) / s, f,
                                   atol=0.5 / s + 1e-6)
    # int8 dtype + shape contract identical to the global path
    for a, b in zip(qg, qp):
        assert a.dtype == b.dtype == np.int8 and a.shape == b.shape
