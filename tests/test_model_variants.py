"""Model-variant generality: every engine/codec/path must work for registry
variants, not just the stock 3-layer network."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_cnn.engine.cpu_ref import numpy_cnn_forward
from tpu_cnn.models.cnn import CLASS_NAMES, FpgaCNN
from tpu_cnn.models.registry import REGISTRY, default_shifts, get_config
from tpu_cnn.ops import quant
from tpu_cnn.utils import weights as wc


def make_kernels(cfg, rng):
    return [
        rng.randint(-127, 128, size=(oc, ic, 3, 3)).astype(np.int8)
        for ic, oc, _ in cfg.layer_configs
    ]


@pytest.mark.parametrize("name", ["lyr3-tiny", "lyr2-small"])
def test_variant_xla_vs_oracle(name, rng):
    cfg = get_config(name)
    kernels = make_kernels(cfg, rng)
    shifts = default_shifts(cfg)
    s = cfg.img_size
    imgs = rng.randint(0, 256, size=(2, s, s)).astype(np.uint8)
    got = np.asarray(
        quant.cnn_forward(
            jnp.asarray(imgs), [jnp.asarray(k) for k in kernels],
            jnp.asarray(shifts, jnp.int32),
        )
    )
    for b in range(2):
        want = numpy_cnn_forward(imgs[b], kernels, shifts=shifts,
                                 layer_configs=cfg.layer_configs)
        np.testing.assert_array_equal(got[b], want)


@pytest.mark.parametrize("name", ["lyr3-tiny", "lyr2-small"])
def test_variant_native_oracle(name, rng):
    from tpu_cnn.native.oracle import NativeOracle

    cfg = get_config(name)
    kernels = make_kernels(cfg, rng)
    shifts = default_shifts(cfg)
    s = cfg.img_size
    img = rng.randint(0, 256, size=(s, s)).astype(np.uint8)
    got = NativeOracle().infer(img, kernels, shifts)
    want = numpy_cnn_forward(img, kernels, shifts=shifts,
                             layer_configs=cfg.layer_configs)
    np.testing.assert_array_equal(got, want)


def test_variant_weights_codec_roundtrip(rng):
    cfg = get_config("lyr2-small")
    kernels = make_kernels(cfg, rng)
    blob = wc.encode_weights(kernels)
    assert len(blob) == cfg.weight_bytes()
    back = wc.decode_weights(np.frombuffer(blob, np.int8), cfg.layer_configs)
    for a, b in zip(kernels, back):
        np.testing.assert_array_equal(a, b)


def test_variant_engine_and_head(rng):
    from tpu_cnn.engine.tpu import TPUEngine

    cfg = get_config("lyr3-tiny")
    kernels = make_kernels(cfg, rng)
    fc_w = rng.randn(6, cfg.feature_dim_bins).astype(np.float32) * 0.05
    model = FpgaCNN(kernels, fc_w, np.zeros(6, np.float32), CLASS_NAMES,
                    shifts=default_shifts(cfg), config=cfg)
    assert model.head_mode == "bins"
    eng = TPUEngine(model, backend="xla")
    imgs = rng.randint(0, 256, size=(3, 32, 32)).astype(np.uint8)
    res = eng.detect_batch(imgs)
    assert res.pred.shape == (3,) and res.bbox.shape == (3, 4)
    # bbox coordinates live in the variant's input pixel space
    assert res.bbox.max() <= 31


def test_variant_pallas(rng):
    from tpu_cnn.ops import pallas_int8

    cfg = get_config("lyr3-tiny")
    kernels = make_kernels(cfg, rng)
    shifts = default_shifts(cfg)
    s = cfg.img_size
    imgs = rng.randint(0, 256, size=(2, s, s)).astype(np.uint8)
    got = np.asarray(
        pallas_int8.cnn_forward_pallas(
            jnp.asarray(imgs), [jnp.asarray(k) for k in kernels],
            jnp.asarray(shifts, jnp.int32), interpret=True,
        )
    )
    for b in range(2):
        want = numpy_cnn_forward(imgs[b], kernels, shifts=shifts,
                                 layer_configs=cfg.layer_configs)
        np.testing.assert_array_equal(got[b], want)


def test_registry_names():
    assert "lyr3-std" in REGISTRY
    with pytest.raises(KeyError):
        get_config("nope")


def test_infer_cli_variant(tmp_path, rng, capsys):
    """The infer CLI drives non-stock geometries end to end via --variant."""
    from tpu_cnn.apps import infer
    from tpu_cnn.models.registry import get_config
    from tpu_cnn.utils import artifacts as art

    cfg = get_config("lyr3-tiny")  # 32x32 input
    kernels = make_kernels(cfg, rng)
    art.save_bundle(tmp_path, art.ArtifactBundle(
        kernels,
        rng.randn(6, cfg.out_channels).astype(np.float32) * 0.1,  # GAP head
        np.zeros(6, np.float32),
        list(CLASS_NAMES),
    ))
    img = rng.randint(0, 256, cfg.img_size * cfg.img_size).astype(np.uint8)
    img.tofile(str(tmp_path / "test_image_0_class2.bin"))
    infer.main(["--artifacts", str(tmp_path), "--variant", "lyr3-tiny",
                "--mode", "cpu", "--no-save", "--image-dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert "Accuracy:" in out and "[gap head]" in out


@pytest.mark.parametrize("name", ["lyr3-tiny", "lyr2-small", "lyr4-wide"])
def test_variant_megakernel(name, rng):
    """The polyphase megakernel is geometry-generic (the engine's TPU default
    routes every variant through it)."""
    from tpu_cnn.ops.pallas_poly import cnn_forward_polyphase_pallas

    cfg = get_config(name)
    kernels = make_kernels(cfg, rng)
    shifts = default_shifts(cfg)
    s = cfg.img_size
    imgs = rng.randint(0, 256, size=(2, s, s)).astype(np.uint8)
    got = np.asarray(
        cnn_forward_polyphase_pallas(
            jnp.asarray(imgs), [jnp.asarray(k) for k in kernels],
            jnp.asarray(shifts, jnp.int32), interpret=True,
        )
    )
    for b in range(2):
        np.testing.assert_array_equal(
            got[b], numpy_cnn_forward(imgs[b], kernels, shifts=shifts)
        )


def test_mega_fits_budgets_both_engine_paths(rng):
    """TPUEngine._mega_fits must budget both the features config and the
    exact detect config (with_feats follows with_twin): the stock geometry
    plans whole-net, lyr4-wide plans the head-layer + tail-megakernel
    chain (round 3), and a geometry with no fitting tail at any batch tile
    drives the hybrid fallback."""
    from tpu_cnn.engine.tpu import TPUEngine
    from tpu_cnn.models.cnn import CNNConfig
    from tpu_cnn.ops import pallas_poly

    # no tail of >= 2 layers fits VMEM at any batch tile for this monster
    no_plan_cfg = CNNConfig(layer_configs=((1, 64, 2048), (64, 1024, 1024)))
    assert pallas_poly.polyphase_plan(no_plan_cfg.layer_configs) is None

    cases = (
        ("lyr3-std", get_config("lyr3-std"), True),
        ("lyr4-wide", get_config("lyr4-wide"), True),  # chained since r3
        ("no-plan", no_plan_cfg, False),
    )
    for name, cfg, want in cases:
        kernels = make_kernels(cfg, rng)
        fc_w = rng.randn(6, cfg.feature_dim_bins).astype(np.float32) * 0.05
        bbox_w = rng.randn(cfg.feature_dim_bins + 1, 4).astype(np.float32)
        model = FpgaCNN(kernels, fc_w, np.zeros(6, np.float32), CLASS_NAMES,
                        shifts=default_shifts(cfg), config=cfg,
                        bbox_weight=bbox_w)
        for box_mode in ("ref", "reg"):
            eng = TPUEngine(model, backend="xla", box_mode=box_mode)
            assert eng._mega_fits() is want, (name, box_mode)
    # the lyr4-wide plans: 1 head layer, tb=1 tail (documented in PARITY.md)
    cfg4 = get_config("lyr4-wide")
    assert pallas_poly.polyphase_plan(cfg4.layer_configs, with_bins=False) == (1, 1)
    assert pallas_poly.polyphase_plan(
        cfg4.layer_configs, with_bins=True, with_twin=True, with_feats=True
    ) == (1, 1)


def test_variant_megakernel_chained_parity(rng):
    """cnn_forward_mega on lyr4-wide runs the chained plan (pallas_int8
    head layer -> multi-channel tail megakernel) and stays bit-exact vs the
    numpy oracle, including the fused bins/f32 outputs."""
    from tpu_cnn.head.classify import bin_pool_np
    from tpu_cnn.ops import pallas_poly

    cfg = get_config("lyr4-wide")
    kernels = make_kernels(cfg, rng)
    shifts = default_shifts(cfg)
    s = cfg.img_size
    imgs = rng.randint(0, 256, size=(2, s, s)).astype(np.uint8)
    kj = [jnp.asarray(k) for k in kernels]
    sj = jnp.asarray(shifts, jnp.int32)
    feats, bins, f32 = pallas_poly.cnn_forward_mega(
        jnp.asarray(imgs), kj, sj, with_bins=True, with_twin=True,
        interpret=True,
    )
    want = np.stack(
        [numpy_cnn_forward(im, kernels, shifts=shifts) for im in imgs]
    )
    np.testing.assert_array_equal(np.asarray(feats), want)
    np.testing.assert_array_equal(np.asarray(f32), want.astype(np.float32))
    np.testing.assert_allclose(np.asarray(bins), bin_pool_np(want), atol=1e-5)


def test_lyr4_routes_through_phase_aligned_l0(rng, monkeypatch):
    """Regression trip for the round-4 production routing (round-4 verdict
    item 6): lyr4-wide's chained plan must run layer 0 through the
    phase-aligned kernel (conv_pool_layer_phase) feeding a pre-split tail —
    NOT fall back to the XLA-L0 chain (pallas_int8.fused_conv_layer), which
    measured 27.4 vs 12.0 us/img (docs/DESIGN.md "Roofline — lyr4-wide").
    Fails if phase_layer_plan stops covering the (1, 16, 256, h=8) geometry
    or cnn_forward_mega's branch order changes."""
    from tpu_cnn.ops import pallas_int8, pallas_poly

    # the plan gate itself: the phase kernel must accept lyr4's layer 0
    assert pallas_poly.phase_layer_plan(1, 16, 256, 8) is not None

    calls = {"phase": 0, "poly": 0, "int8": 0}
    real_phase = pallas_poly.conv_pool_layer_phase

    def spy_phase(*a, **k):
        calls["phase"] += 1
        return real_phase(*a, **k)

    monkeypatch.setattr(pallas_poly, "conv_pool_layer_phase", spy_phase)
    monkeypatch.setattr(
        pallas_poly, "conv_pool_layer_poly",
        lambda *a, **k: calls.__setitem__("poly", calls["poly"] + 1)
        or (_ for _ in ()).throw(AssertionError("poly L0 route taken")),
    )
    monkeypatch.setattr(
        pallas_int8, "fused_conv_layer",
        lambda *a, **k: calls.__setitem__("int8", calls["int8"] + 1)
        or (_ for _ in ()).throw(AssertionError("XLA-L0 route taken")),
    )

    cfg = get_config("lyr4-wide")
    kernels = make_kernels(cfg, rng)
    s = cfg.img_size
    # batch 3: a shape no other test traces, so the jit cache cannot
    # serve a pre-spy trace and hide the routing
    imgs = rng.randint(0, 256, size=(3, s, s)).astype(np.uint8)
    feats = pallas_poly.cnn_forward_mega(
        jnp.asarray(imgs), [jnp.asarray(k) for k in kernels],
        jnp.asarray(default_shifts(cfg), jnp.int32), interpret=True,
    )
    assert calls == {"phase": 1, "poly": 0, "int8": 0}
    want = np.stack([
        numpy_cnn_forward(im, kernels, shifts=default_shifts(cfg))
        for im in imgs
    ])
    np.testing.assert_array_equal(np.asarray(feats), want)


def test_layer_folds_policy():
    """M-fold policy (round-5 packing lever): lyr4-wide's tb=1 tail folds
    L1 x4 / L2 x2 / L3 x1 (f*oc <= 128, f <= g/2); folding is not wired
    for tb>1 (the tb=4 flagship path must stay byte-identical)."""
    from tpu_cnn.ops.pallas_poly import _layer_folds

    assert _layer_folds([(16, 32, 8), (32, 64, 4), (64, 128, 2)], 1) == \
        (4, 2, 1)
    assert _layer_folds([(1, 16, 8), (16, 32, 4), (32, 64, 2)], 4) == \
        (1, 1, 1)
    # a tail whose oc already fills M cannot fold
    assert _layer_folds([(64, 128, 4), (128, 128, 2)], 1) == (1, 1)


def test_megakernel_fold_ab_parity(rng):
    """fold=auto and fold=1 must produce identical feats/bins/twin for the
    lyr4-wide chained tail (the A/B the hardware probe times)."""
    from tpu_cnn.ops import pallas_poly

    cfg = get_config("lyr4-wide")
    kernels = [jnp.asarray(k) for k in make_kernels(cfg, rng)]
    shifts = jnp.asarray(default_shifts(cfg), jnp.int32)
    s = cfg.img_size
    imgs = jnp.asarray(rng.randint(0, 256, size=(2, s, s)).astype(np.uint8))
    rows = pallas_poly.conv_pool_layer_phase(
        imgs[:, None, :, :], kernels[0], shifts[0], h=8, interpret=True)
    outs = {}
    for fold in (0, None, (4, 1, 1)):
        outs[fold] = pallas_poly.cnn_forward_polyphase_pallas(
            rows, kernels[1:], shifts[1:], tb=1, pre_split=True,
            with_bins=True, with_twin=True, with_feats=True,
            interpret=True, fold=fold)
    for key in (0, (4, 1, 1)):
        for a, b in zip(outs[key], outs[None]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
