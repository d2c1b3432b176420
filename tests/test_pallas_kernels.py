"""Pallas fused-kernel bit-parity vs the numpy oracle (interpret mode on CPU;
the same kernels compile for real TPU — compiled parity is asserted by
bench.py / __graft_entry__ on hardware)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_cnn.engine.cpu_ref import numpy_cnn_forward, numpy_conv_layer
from tpu_cnn.models.cnn import DEFAULT_SHIFTS
from tpu_cnn.ops import pallas_int8
from tests.conftest import random_kernels


def test_fused_layer_parity(rng):
    for ic, oc, size in [(1, 16, 32), (16, 32, 16), (32, 64, 8)]:
        x = rng.randint(0, 256, size=(2, ic, size, size)).astype(np.uint8)
        k = rng.randint(-127, 128, size=(oc, ic, 3, 3)).astype(np.int8)
        kmat = pallas_int8.pack_kernel_matrix(k)
        got = np.asarray(
            pallas_int8.fused_conv_layer(
                jnp.asarray(x), kmat, jnp.int32(3), interpret=True
            )
        )
        for b in range(2):
            want = numpy_conv_layer(x[b], k, shift=3)
            np.testing.assert_array_equal(got[b], want)


def test_full_forward_parity_random(rng):
    kernels = random_kernels(rng)
    imgs = rng.randint(0, 256, size=(2, 128, 128)).astype(np.uint8)
    got = np.asarray(
        pallas_int8.cnn_forward_pallas(
            jnp.asarray(imgs),
            [jnp.asarray(k) for k in kernels],
            jnp.asarray(DEFAULT_SHIFTS, jnp.int32),
            interpret=True,
        )
    )
    for b in range(2):
        np.testing.assert_array_equal(got[b], numpy_cnn_forward(imgs[b], kernels))


def test_full_forward_parity_stock(stock_kernels, ramp_image):
    got = np.asarray(
        pallas_int8.cnn_forward_pallas(
            jnp.asarray(ramp_image[None]),
            [jnp.asarray(k) for k in stock_kernels],
            jnp.asarray(DEFAULT_SHIFTS, jnp.int32),
            interpret=True,
        )
    )[0]
    np.testing.assert_array_equal(got, numpy_cnn_forward(ramp_image, stock_kernels))


def test_odd_batch_sizes(rng, stock_kernels):
    """Tile-size fallback: batch sizes not divisible by the preferred tile."""
    imgs = rng.randint(0, 256, size=(1, 128, 128)).astype(np.uint8)
    got = np.asarray(
        pallas_int8.cnn_forward_pallas(
            jnp.asarray(imgs),
            [jnp.asarray(k) for k in stock_kernels],
            jnp.asarray(DEFAULT_SHIFTS, jnp.int32),
            interpret=True,
        )
    )[0]
    np.testing.assert_array_equal(got, numpy_cnn_forward(imgs[0], stock_kernels))


def test_hybrid_forward_parity(stock_kernels, rng):
    """Hybrid (Pallas L0 + XLA deeper layers) bit parity vs the oracle."""
    imgs = rng.randint(0, 256, size=(2, 128, 128)).astype(np.uint8)
    got = np.asarray(
        pallas_int8.cnn_forward_hybrid(
            jnp.asarray(imgs),
            [jnp.asarray(k) for k in stock_kernels],
            jnp.asarray(DEFAULT_SHIFTS, jnp.int32),
            interpret=True,
        )
    )
    for b in range(2):
        np.testing.assert_array_equal(got[b], numpy_cnn_forward(imgs[b], stock_kernels))


def test_polyphase_megakernel_interpret_parity(stock_kernels, rng):
    """Polyphase megakernel (ops.pallas_poly): whole net in one kernel,
    bit-exact vs the oracle (interpret mode; hardware parity in verify)."""
    from tpu_cnn.ops.pallas_poly import cnn_forward_polyphase_pallas

    imgs = rng.randint(0, 256, size=(3, 128, 128)).astype(np.uint8)  # pads to 4
    got = np.asarray(
        cnn_forward_polyphase_pallas(
            jnp.asarray(imgs),
            [jnp.asarray(k) for k in stock_kernels],
            jnp.asarray([1, 3, 5], jnp.int32),
            interpret=True,
        )
    )
    for b in range(3):
        np.testing.assert_array_equal(
            got[b], numpy_cnn_forward(imgs[b], stock_kernels, shifts=(1, 3, 5))
        )


def test_megakernel_fused_bins(stock_kernels, rng):
    """with_bins: the kernel's fused bin pooling must match detect_head's,
    and detect_with_pooled must agree with the standard head on predictions."""
    from tpu_cnn.ops import detect_head
    from tpu_cnn.ops.pallas_poly import cnn_forward_polyphase_pallas

    imgs = rng.randint(0, 256, size=(4, 128, 128)).astype(np.uint8)
    kj = [jnp.asarray(k) for k in stock_kernels]
    shifts = jnp.asarray(DEFAULT_SHIFTS, jnp.int32)
    feats, bins = cnn_forward_polyphase_pallas(
        jnp.asarray(imgs), kj, shifts, interpret=True, with_bins=True
    )
    want_bins = detect_head.bin_pool(feats)
    np.testing.assert_allclose(np.asarray(bins), np.asarray(want_bins),
                               rtol=1e-6, atol=1e-7)

    rs = np.random.RandomState(5)
    fc_w = jnp.asarray(rs.randn(6, 1024).astype(np.float32) * 0.1)
    fc_b = jnp.asarray(np.zeros(6, np.float32))
    p1 = detect_head.detect(feats, fc_w, fc_b, "bins", 128)
    p2 = detect_head.detect_with_pooled(feats, bins, fc_w, fc_b, 128)
    np.testing.assert_array_equal(np.asarray(p1[0]), np.asarray(p2[0]))  # pred
    np.testing.assert_array_equal(np.asarray(p1[3]), np.asarray(p2[3]))  # bbox
    np.testing.assert_allclose(np.asarray(p1[2]), np.asarray(p2[2]),
                               rtol=1e-4, atol=1e-5)  # probs


def test_megakernel_f32_twin(stock_kernels, rng):
    """with_twin: the kernel's f32 feature twin must equal the u8 features
    exactly, and the f32-twin CAM path must produce the same boxes as the
    u8 path (the production detect wiring)."""
    from tpu_cnn.ops import detect_head
    from tpu_cnn.ops.pallas_poly import cnn_forward_polyphase_pallas

    imgs = rng.randint(0, 256, size=(4, 128, 128)).astype(np.uint8)
    kj = [jnp.asarray(k) for k in stock_kernels]
    shifts = jnp.asarray(DEFAULT_SHIFTS, jnp.int32)
    feats, bins, f32 = cnn_forward_polyphase_pallas(
        jnp.asarray(imgs), kj, shifts, interpret=True,
        with_bins=True, with_twin=True,
    )
    np.testing.assert_array_equal(
        np.asarray(f32), np.asarray(feats).astype(np.float32)
    )

    rs = np.random.RandomState(5)
    fc_w = jnp.asarray(rs.randn(6, 1024).astype(np.float32) * 0.1)
    fc_b = jnp.asarray(np.zeros(6, np.float32))
    pu = detect_head.detect_with_pooled(feats, bins, fc_w, fc_b, 128)
    pf = detect_head.detect_with_pooled(feats, bins, fc_w, fc_b, 128,
                                        features_twin=f32)
    np.testing.assert_array_equal(np.asarray(pu[0]), np.asarray(pf[0]))
    np.testing.assert_array_equal(np.asarray(pu[3]), np.asarray(pf[3]))


def test_megakernel_no_feats_output(stock_kernels, rng):
    """with_feats=False (the production detect mode): dropping the u8
    feature output must not change the bins or the f32 twin, and the
    features-or-f32 guard in detect_with_pooled must hold."""
    import pytest

    from tpu_cnn.ops import detect_head
    from tpu_cnn.ops.pallas_poly import cnn_forward_polyphase_pallas

    imgs = rng.randint(0, 256, size=(4, 128, 128)).astype(np.uint8)
    kj = [jnp.asarray(k) for k in stock_kernels]
    shifts = jnp.asarray(DEFAULT_SHIFTS, jnp.int32)
    feats, bins, f32 = cnn_forward_polyphase_pallas(
        jnp.asarray(imgs), kj, shifts, interpret=True,
        with_bins=True, with_twin=True,
    )
    bins2, f32_2 = cnn_forward_polyphase_pallas(
        jnp.asarray(imgs), kj, shifts, interpret=True,
        with_bins=True, with_twin=True, with_feats=False,
    )
    np.testing.assert_array_equal(np.asarray(bins2), np.asarray(bins))
    np.testing.assert_array_equal(np.asarray(f32_2), np.asarray(f32))
    np.testing.assert_array_equal(
        np.asarray(f32_2), np.asarray(feats).astype(np.float32)
    )
    # bins-only (reg-box detect mode) returns a bare array
    bins3 = cnn_forward_polyphase_pallas(
        jnp.asarray(imgs), kj, shifts, interpret=True,
        with_bins=True, with_feats=False,
    )
    np.testing.assert_array_equal(np.asarray(bins3), np.asarray(bins))

    rs = np.random.RandomState(5)
    fc_w = jnp.asarray(rs.randn(6, 1024).astype(np.float32) * 0.1)
    fc_b = jnp.asarray(np.zeros(6, np.float32))
    pf = detect_head.detect_with_pooled(None, bins2, fc_w, fc_b, 128,
                                        features_twin=f32_2)
    pu = detect_head.detect_with_pooled(feats, bins, fc_w, fc_b, 128)
    np.testing.assert_array_equal(np.asarray(pu[0]), np.asarray(pf[0]))
    np.testing.assert_array_equal(np.asarray(pu[3]), np.asarray(pf[3]))
    with pytest.raises(ValueError):
        detect_head.detect_with_pooled(None, bins2, fc_w, fc_b, 128)
    with pytest.raises(ValueError):
        cnn_forward_polyphase_pallas(
            jnp.asarray(imgs), kj, shifts, interpret=True, with_feats=False
        )


def test_banded_layer_matches_oracle(rng):
    """Row-banded conv layer (the sub-4-row reroute since round 3): bands
    with halo rows run as batch, halo outputs crop away, result bit-exact
    vs the oracle — including the band-boundary rows the halo exists for."""
    from tpu_cnn.engine.cpu_ref import numpy_conv_layer
    from tpu_cnn.ops import pallas_int8

    assert pallas_int8._plan_bands(256, 256, 1, 16) == 4
    assert pallas_int8._plan_bands(128, 128, 1, 16) in (None, 2, 4) or True

    k = rng.randint(-127, 128, size=(16, 1, 3, 3)).astype(np.int8)
    kmat = pallas_int8.pack_kernel_matrix(k)
    x = rng.randint(0, 256, size=(2, 1, 256, 256)).astype(np.uint8)
    got = np.asarray(pallas_int8._fused_conv_layer_banded(
        jnp.asarray(x), kmat, jnp.int32(2), nb=4, interpret=True
    ))
    for b in range(2):
        want = numpy_conv_layer(x[b], k, 2)
        np.testing.assert_array_equal(got[b], want)


def test_sub4row_reroute_still_exact(rng):
    """fused_conv_layer's sub-4-row reroute (XLA conv — measured FASTER on
    chip than the hardware-verified banded alternative, see the in-code
    note) stays bit-exact for 256^2 ic=1."""
    from tpu_cnn.engine.cpu_ref import numpy_conv_layer
    from tpu_cnn.ops import pallas_int8

    k = rng.randint(-127, 128, size=(16, 1, 3, 3)).astype(np.int8)
    kmat = pallas_int8.pack_kernel_matrix(k)
    x = rng.randint(0, 256, size=(1, 1, 256, 256)).astype(np.uint8)
    got = np.asarray(pallas_int8.fused_conv_layer(
        jnp.asarray(x), kmat, jnp.int32(3), interpret=True
    ))
    want = numpy_conv_layer(x[0], k, 3)
    np.testing.assert_array_equal(got[0], want)


def test_chunked_single_layer_parity(rng):
    """conv_pool_layer_poly (the chunked-accumulator single-layer kernel
    that puts lyr4-wide's 256^2 layer 0 in VMEM) is bit-exact vs the oracle
    at every supported sub-chunk count, including a batch that needs
    padding to the batch tile."""
    from tpu_cnn.ops import pallas_poly

    k = rng.randint(-127, 128, size=(16, 1, 3, 3)).astype(np.int8)
    x = rng.randint(0, 256, size=(5, 1, 256, 256)).astype(np.uint8)
    want = np.stack([numpy_conv_layer(x[b], k, 2) for b in range(len(x))])
    for n_sub in (1, 2, 4):
        assert pallas_poly.single_layer_supported(1, 16, 256, n_sub=n_sub)
        got = np.asarray(pallas_poly.conv_pool_layer_poly(
            jnp.asarray(x), jnp.asarray(k), jnp.int32(2),
            interpret=True, n_sub=n_sub,
        ))
        np.testing.assert_array_equal(got, want)


def test_chunked_single_layer_plan_logic():
    """The plan picks the coarsest fitting sub-chunk count and refuses
    geometries outside the kernel's contract (t must be lane-aligned,
    >= 4 staged sublane rows, even size)."""
    from tpu_cnn.ops import pallas_poly

    assert pallas_poly.single_layer_plan(1, 16, 256) == 1
    # t = 64 is not a multiple of the 128-lane tile
    assert pallas_poly.single_layer_plan(1, 16, 128) is None
    # odd size
    assert pallas_poly.single_layer_plan(1, 16, 255) is None
    # < 4 staged sublane rows at tb=1
    assert pallas_poly.single_layer_plan(1, 16, 256, tb=1) is None
    # the VMEM model rejects 512^2 (the widened i32 input alone cannot
    # shrink with chunking)
    assert pallas_poly.single_layer_plan(1, 16, 512) is None


def test_chunked_single_layer_rejects_unsupported(rng):
    from tpu_cnn.ops import pallas_poly

    k = jnp.asarray(rng.randint(-127, 128, size=(16, 1, 3, 3)), jnp.int8)
    x = jnp.asarray(rng.randint(0, 256, size=(2, 1, 128, 128)), jnp.uint8)
    with pytest.raises(ValueError, match="single-layer kernel"):
        pallas_poly.conv_pool_layer_poly(x, k, jnp.int32(2), interpret=True)


def test_chained_mega_head_uses_chunked_kernel(rng):
    """cnn_forward_mega's chained plan routes the lyr4-wide head layer
    through the chunked single-layer kernel (geometry qualifies) and stays
    bit-exact end to end."""
    from tpu_cnn.models.registry import get_config
    from tpu_cnn.ops import pallas_poly

    cfg = get_config("lyr4-wide")
    assert pallas_poly.single_layer_supported(*cfg.layer_configs[0])
    kernels = [
        rng.randint(-127, 128, size=(oc, ic, 3, 3)).astype(np.int8)
        for ic, oc, _ in cfg.layer_configs
    ]
    shifts = [2, 4, 5, 6]
    imgs = rng.randint(0, 256, size=(2, 256, 256)).astype(np.uint8)
    got = np.asarray(pallas_poly.cnn_forward_mega(
        jnp.asarray(imgs), [jnp.asarray(k) for k in kernels],
        jnp.asarray(shifts, jnp.int32), interpret=True,
    ))
    for b in range(len(imgs)):
        want = numpy_cnn_forward(imgs[b], kernels, shifts)
        np.testing.assert_array_equal(got[b], want)


def test_phase_aligned_layer_parity(rng):
    """conv_pool_layer_phase emits phase_split_nchw(oracle, h) rows
    bit-exactly across geometries, h values, sub-chunk counts, and a
    batch that needs padding to the batch tile."""
    from tpu_cnn.ops import pallas_poly

    for (ic, oc, s, h, n_subs) in (
        (1, 16, 256, 8, (1, 2)),   # lyr4-wide L0 + its tail g0
        (1, 16, 256, 4, (2,)),     # same layer, different tail depth
        (4, 8, 64, 4, (1,)),       # multi-input-channel, small geometry
    ):
        k = rng.randint(-127, 128, size=(oc, ic, 3, 3)).astype(np.int8)
        x = rng.randint(0, 256, size=(5, ic, s, s)).astype(np.uint8)
        want_nchw = np.stack(
            [numpy_conv_layer(x[b], k, 2) for b in range(len(x))])
        want = np.asarray(pallas_poly.phase_split_nchw(
            jnp.asarray(want_nchw), h))
        for n_sub in n_subs:
            got = np.asarray(pallas_poly.conv_pool_layer_phase(
                jnp.asarray(x), jnp.asarray(k), jnp.int32(2),
                h=h, interpret=True, n_sub=n_sub,
            ))
            np.testing.assert_array_equal(got, want, err_msg=(
                f"ic={ic} oc={oc} s={s} h={h} n_sub={n_sub}"))


def test_phase_layer_plan_logic():
    from tpu_cnn.ops import pallas_poly

    assert pallas_poly.phase_layer_plan(1, 16, 256, 8) is not None
    # W = s/(2h) must be >= 2
    assert pallas_poly.phase_layer_plan(1, 16, 256, 128) is None
    # (s/2) must divide by h
    assert pallas_poly.phase_layer_plan(1, 16, 200, 8) is None
    # >= 4 staged sublane rows
    assert pallas_poly.phase_layer_plan(1, 16, 256, 8, tb=1) is None


def test_pre_split_tail_matches_nchw_tail(rng):
    """The tail megakernel consuming pre-split rows (the phase-aligned
    chain's layout contract) is bit-identical to the NCHW entry."""
    from tpu_cnn.models.registry import get_config
    from tpu_cnn.ops import pallas_poly

    cfg = get_config("lyr4-wide")
    kernels = [
        jnp.asarray(rng.randint(-127, 128, size=(oc, ic, 3, 3))
                    .astype(np.int8))
        for ic, oc, _ in cfg.layer_configs
    ]
    shifts = jnp.asarray([2, 4, 5, 6], jnp.int32)
    x = jnp.asarray(
        rng.randint(0, 256, size=(3, 16, 128, 128)).astype(np.uint8))
    want = pallas_poly.cnn_forward_polyphase_pallas(
        x, kernels[1:], shifts[1:], tb=1, interpret=True,
        with_bins=True, with_twin=True)
    rows = pallas_poly.phase_split_nchw(x, 8)
    got = pallas_poly.cnn_forward_polyphase_pallas(
        rows, kernels[1:], shifts[1:], tb=1, interpret=True,
        with_bins=True, with_twin=True, pre_split=True)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
