"""Hardware parity lane — the automated equivalent of the reference's
golden compare running in its normal sim flow (``sim/top/tb.v:635-712``).

Interpret-mode Pallas tests CANNOT see Mosaic hardware miscompiles (two
silent classes are already documented in docs/DESIGN.md; one shipped wrong
values for lyr4-wide until the round-2 sweep). This subset reruns the
bit-parity assertions on the real chip:

    TPU_CNN_TEST_PLATFORM=axon python -m pytest tests/ -m tpu -q

On the default CPU harness these tests SKIP (they would duplicate the
interpret-mode parity tests that already run everywhere).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_cnn.engine.cpu_ref import numpy_cnn_forward
from tpu_cnn.head.classify import bin_pool_np
from tpu_cnn.models.cnn import DEFAULT_SHIFTS
from tpu_cnn.models.registry import REGISTRY, default_shifts

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.devices()[0].platform == "cpu",
        reason="hardware parity lane — run with TPU_CNN_TEST_PLATFORM=axon",
    ),
]


def _stimuli(rng, size, n=4):
    i = np.arange(size * size, dtype=np.int64)
    ramp = ((13 * i + 5) % 256).astype(np.uint8).reshape(size, size)
    rand = rng.randint(0, 256, size=(n - 1, size, size)).astype(np.uint8)
    return np.concatenate([ramp[None], rand])


@pytest.mark.parametrize("backend", ["pallas", "hybrid", "mega"])
def test_stock_backend_parity_on_hardware(backend, stock_kernels, rng):
    from tpu_cnn.ops import pallas_int8, pallas_poly

    fn = {
        "pallas": pallas_int8.cnn_forward_pallas,
        "hybrid": pallas_int8.cnn_forward_hybrid,
        "mega": pallas_poly.cnn_forward_polyphase_pallas,
    }[backend]
    imgs = _stimuli(rng, 128, n=8)
    got = np.asarray(
        fn(jnp.asarray(imgs), [jnp.asarray(k) for k in stock_kernels],
           jnp.asarray(DEFAULT_SHIFTS, jnp.int32))
    )
    for b in range(len(imgs)):
        np.testing.assert_array_equal(got[b], numpy_cnn_forward(imgs[b], stock_kernels))


def test_mega_fused_bins_on_hardware(stock_kernels, rng):
    from tpu_cnn.ops import pallas_poly

    imgs = _stimuli(rng, 128, n=4)
    feats, pooled = pallas_poly.cnn_forward_polyphase_pallas(
        jnp.asarray(imgs), [jnp.asarray(k) for k in stock_kernels],
        jnp.asarray(DEFAULT_SHIFTS, jnp.int32), with_bins=True,
    )
    feats, pooled = np.asarray(feats), np.asarray(pooled)
    want = np.stack([numpy_cnn_forward(im, stock_kernels) for im in imgs])
    np.testing.assert_array_equal(feats, want)
    np.testing.assert_allclose(pooled, bin_pool_np(want), atol=1e-5)


@pytest.mark.parametrize("variant", sorted(REGISTRY))
def test_variant_parity_on_hardware(variant, rng):
    """Every registry geometry, on the backend the engine would actually
    pick for it (the mega plan — whole-net megakernel or head-layers +
    tail-megakernel chain — when one fits, hybrid otherwise). This sweep
    caught the lyr4-wide tb=1 staging miscompile in round 2; since round 3
    it also exercises the chained multi-channel tail kernel on chip."""
    from tpu_cnn.ops import pallas_int8, pallas_poly

    cfg = REGISTRY[variant]
    kernels = [
        rng.randint(-127, 128, size=(oc, ic, 3, 3)).astype(np.int8)
        for ic, oc, _ in cfg.layer_configs
    ]
    shifts = jnp.asarray(default_shifts(cfg), jnp.int32)
    imgs = _stimuli(rng, cfg.img_size, n=4)
    kj = [jnp.asarray(k) for k in kernels]
    if pallas_poly.polyphase_plan(cfg.layer_configs, with_bins=False) is not None:
        got = np.asarray(pallas_poly.cnn_forward_mega(
            jnp.asarray(imgs), kj, shifts))
    else:
        got = np.asarray(pallas_int8.cnn_forward_hybrid(
            jnp.asarray(imgs), kj, shifts))
    sh = [int(s) for s in np.asarray(shifts)]
    for b in range(len(imgs)):
        np.testing.assert_array_equal(
            got[b], numpy_cnn_forward(imgs[b], kernels, sh)
        )


def test_fused_head_boxes_on_hardware(stock_kernels, rng):
    """The fused device head (f32 twin + MXU CAM) must reproduce the host
    CAM twins on the chip, in BOTH box profiles — the exact path
    bench.py/TPUEngine ship."""
    from tpu_cnn.head import cam as host_cam
    from tpu_cnn.head.classify import classify_np
    from tpu_cnn.models.cnn import CLASS_NAMES, FpgaCNN
    from tpu_cnn.engine.tpu import TPUEngine

    fc_w = rng.randn(6, 1024).astype(np.float32) * 0.1
    fc_b = rng.randn(6).astype(np.float32) * 0.01
    model = FpgaCNN(stock_kernels, fc_w, fc_b, CLASS_NAMES)
    imgs = _stimuli(rng, 128, n=8)
    want_feats = np.stack([numpy_cnn_forward(im, stock_kernels) for im in imgs])
    widx, _, _ = classify_np(want_feats, fc_w, fc_b)

    for box_mode, host_fn, tol in (
        ("ref", host_cam.cam_bbox_fast, 0),
        ("centroid", host_cam.cam_bbox_centroid, 1),
    ):
        eng = TPUEngine(model, backend="mega", box_mode=box_mode)
        res = eng.detect_batch(imgs)
        np.testing.assert_array_equal(res.pred, widx)
        for b in range(len(imgs)):
            want = np.asarray(host_fn(want_feats[b], int(widx[b]), fc_w))
            assert np.abs(np.asarray(res.bbox[b]) - want).max() <= tol, (
                f"{box_mode} box mismatch at image {b}: {res.bbox[b]} vs {want}"
            )


def test_reg_box_on_hardware(stock_kernels, rng):
    """Learned regression box, fused in the mega detect path on the chip,
    vs the host twin."""
    from tpu_cnn.engine.tpu import TPUEngine
    from tpu_cnn.head.bbox import bbox_regress_np
    from tpu_cnn.head.classify import bin_pool_np
    from tpu_cnn.models.cnn import CLASS_NAMES, FpgaCNN

    fc_w = rng.randn(6, 1024).astype(np.float32) * 0.1
    fc_b = rng.randn(6).astype(np.float32) * 0.01
    bbox_w = rng.randn(1025, 4).astype(np.float32) * 0.02
    model = FpgaCNN(stock_kernels, fc_w, fc_b, CLASS_NAMES, bbox_weight=bbox_w)
    imgs = _stimuli(rng, 128, n=8)
    eng = TPUEngine(model, backend="mega", box_mode="reg")
    res = eng.detect_batch(imgs)
    want_feats = np.stack([numpy_cnn_forward(im, stock_kernels) for im in imgs])
    want = bbox_regress_np(bin_pool_np(want_feats), bbox_w)
    assert np.abs(res.bbox.astype(np.int64) - want.astype(np.int64)).max() <= 1


def test_exported_deployable_runs_on_hardware(stock_kernels, rng):
    """The .tcnnx deployable (megakernel + head, exported via jax.export)
    must execute on the chip and reproduce the live mega engine exactly —
    the bitstream-analogue artifact actually programs the 'fabric'."""
    from tpu_cnn.apps.export_model import DeployedDetector, export_bundle
    from tpu_cnn.engine.tpu import TPUEngine
    from tpu_cnn.models.cnn import CLASS_NAMES, FpgaCNN

    fc_w = rng.randn(6, 1024).astype(np.float32) * 0.1
    model = FpgaCNN(stock_kernels, fc_w, np.zeros(6, np.float32), CLASS_NAMES)
    blob = export_bundle(model, batch=8, backend="mega", platforms=("tpu",),
                         multi=True, instances=2)
    det = DeployedDetector(blob)
    imgs = _stimuli(rng, 128, n=8)
    pred, conf, probs, bbox = det.detect(imgs)

    eng = TPUEngine(model, backend="mega")
    live = eng.detect_batch(imgs)
    np.testing.assert_array_equal(pred, live.pred)
    np.testing.assert_array_equal(bbox, live.bbox)
    np.testing.assert_allclose(probs, live.probs, atol=1e-6)

    # the exported multi-object program (with the baked instance head)
    # must also run on chip, box-equal to the live kernel-fused paths
    mp, _, mprobs, mboxes, miboxes, micounts = det.detect_multi(imgs)
    mlive = eng.detect_multi_batch(imgs, instances=2)
    np.testing.assert_array_equal(mp, mlive.pred)
    np.testing.assert_array_equal(mboxes, mlive.boxes)
    np.testing.assert_allclose(mprobs, mlive.probs, atol=1e-6)
    np.testing.assert_array_equal(miboxes, mlive.inst_boxes)
    np.testing.assert_array_equal(micounts, mlive.inst_counts)


def test_device_preprocess_parity_on_hardware(rng):
    """On-device preprocess (both the 3-channel and the packed BGRX layout,
    both resize paths) vs the host numpy twin, on the real chip — covers
    the XLA bitcast/one-hot-matmul lowerings the CPU tests can't."""
    from tpu_cnn.apps.realtime import preprocess as np_pp
    from tpu_cnn.ops.luma import pack_bgrx
    from tpu_cnn.ops.preprocess import preprocess_frames

    # area (512), dense nearest (480x640: lane-aligned pitch), and the
    # phase-sliced nearest path (320x240 q=8; 480x640 staged at a
    # 656-word pitch via valid_w — the pad-width production layout)
    for h, w in ((512, 640), (480, 640), (240, 320)):
        f3 = rng.randint(0, 256, size=(4, h, w, 3)).astype(np.uint8)
        got3 = np.asarray(preprocess_frames(jnp.asarray(f3), 128))
        got_packed = np.asarray(
            preprocess_frames(jnp.asarray(pack_bgrx(f3)), 128)
        )
        np.testing.assert_array_equal(got3, got_packed)
        if (min(h, w) % 128) != 0:  # nearest path: exact vs host twin
            for b in range(4):
                np.testing.assert_array_equal(got3[b], np_pp(f3[b], 128))

    f3 = rng.randint(0, 256, size=(4, 480, 640, 3)).astype(np.uint8)
    f4 = np.concatenate([f3, np.zeros_like(f3[..., :1])], axis=-1)
    staged = np.full((4, 480, 656), 0xFFFFFFFF, np.uint32)
    staged[:, :, :640] = pack_bgrx(f4)
    got = np.asarray(preprocess_frames(jnp.asarray(staged), 128, valid_w=640))
    for b in range(4):
        np.testing.assert_array_equal(got[b], np_pp(f3[b], 128))


@pytest.mark.parametrize("art_dir,variant,image_dir,floor", [
    ("artifacts/pretrained", "lyr3-std", "artifacts/pretrained", 0.80),
    ("artifacts/realphoto/bundle-qat", "lyr3-std",
     "artifacts/realphoto/val_bins", 0.90),
    ("artifacts/pretrained-lyr2", "lyr2-small",
     "artifacts/pretrained-lyr2", 0.80),
    ("artifacts/pretrained-lyr4", "lyr4-wide",
     "artifacts/pretrained-lyr4", 0.90),
])
def test_shipped_bundle_accuracy_on_hardware(art_dir, variant, image_dir,
                                             floor):
    """Every shipped bundle must hit its accuracy-gate floor ON CHIP
    through the production engine's fused detect path — the hardware twin
    of tests/test_accuracy_gates.py (which scores via the CPU oracle).
    Catches any on-chip head/shift divergence the oracle cannot."""
    import glob
    import os

    from tpu_cnn.apps.common import load_model
    from tpu_cnn.apps.infer import make_engine
    from tpu_cnn.utils.artifacts import label_from_filename

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = load_model(os.path.join(repo, art_dir), variant)
    eng = make_engine(model, "auto")
    s = model.config.img_size
    files = sorted(glob.glob(
        os.path.join(repo, image_dir, "test_image_*.bin")
    ))
    assert files
    imgs = np.stack([np.fromfile(p, np.uint8).reshape(s, s) for p in files])
    labels = np.asarray([label_from_filename(p) for p in files])
    res = eng.detect_batch(imgs)
    acc = float((np.asarray(res.pred) == labels).mean())
    assert acc >= floor, f"{art_dir} on hardware: {acc:.3f} < {floor}"


def test_multi_object_head_on_hardware(stock_kernels, rng):
    """Multi-object head on the chip: the kernel-fused per-class CAM boxes
    (bins + bf16 twin epilogue) must match the host twin for EVERY class,
    not just the argmax — the Mosaic-miscompile class interpret mode can't
    see also applies to the unrolled multi head."""
    from tpu_cnn.engine.tpu import TPUEngine
    from tpu_cnn.head import cam as host_cam
    from tpu_cnn.models.cnn import CLASS_NAMES, FpgaCNN

    fc_w = rng.randn(6, 1024).astype(np.float32) * 0.1
    fc_b = rng.randn(6).astype(np.float32) * 0.01
    model = FpgaCNN(stock_kernels, fc_w, fc_b, CLASS_NAMES)
    imgs = _stimuli(rng, 128, n=6)
    want_feats = np.stack([numpy_cnn_forward(im, stock_kernels) for im in imgs])

    eng = TPUEngine(model, backend="mega")
    res = eng.detect_multi_batch(imgs)
    single = eng.detect_batch(imgs)
    np.testing.assert_array_equal(res.pred, single.pred)
    for b in range(len(imgs)):
        want = host_cam.cam_bbox_multi(want_feats[b], fc_w)
        np.testing.assert_array_equal(res.boxes[b], want)
        np.testing.assert_array_equal(res.boxes[b, res.pred[b]],
                                      single.bbox[b])


def test_instance_head_on_hardware(stock_kernels, rng):
    """Multi-INSTANCE head on the chip: the watershed component labeling
    (two chained while_loops + virtual one-hot reductions over the
    kernel's bf16 feature twin) must reproduce the host twin's boxes and
    pixel counts EXACTLY — the instance ranking key is integer, so any
    hardware drift in the CAM threshold comparisons shows up as a box or
    count mismatch here."""
    from tpu_cnn.engine.tpu import TPUEngine
    from tpu_cnn.head import cam as host_cam
    from tpu_cnn.models.cnn import CLASS_NAMES, FpgaCNN

    fc_w = rng.randn(6, 1024).astype(np.float32) * 0.1
    fc_b = rng.randn(6).astype(np.float32) * 0.01
    model = FpgaCNN(stock_kernels, fc_w, fc_b, CLASS_NAMES)
    imgs = _stimuli(rng, 128, n=6)
    want_feats = np.stack([numpy_cnn_forward(im, stock_kernels) for im in imgs])

    eng = TPUEngine(model, backend="mega")
    res = eng.detect_multi_batch(imgs, instances=3)
    for b in range(len(imgs)):
        want_boxes, want_counts = host_cam.cam_instances(
            want_feats[b], fc_w, max_instances=3)
        np.testing.assert_array_equal(res.inst_boxes[b], want_boxes)
        np.testing.assert_array_equal(res.inst_counts[b], want_counts)


def test_chunked_single_layer_on_hardware(rng):
    """conv_pool_layer_poly — the chunked-accumulator single-layer kernel
    the lyr4-wide chained plan now uses for its 256^2 layer 0 — bit-exact
    on the chip at the planned and a finer sub-chunk count (interpret mode
    cannot catch Mosaic staging miscompiles; the round-2 lyr4 tb=1 bug was
    exactly this class)."""
    from tpu_cnn.engine.cpu_ref import numpy_conv_layer
    from tpu_cnn.ops import pallas_poly

    k = rng.randint(-127, 128, size=(16, 1, 3, 3)).astype(np.int8)
    x = _stimuli(rng, 256, n=5)[:, None, :, :]
    want = np.stack([numpy_conv_layer(x[b], k, 2) for b in range(len(x))])
    for n_sub in (1, 2):
        got = np.asarray(pallas_poly.conv_pool_layer_poly(
            jnp.asarray(x), jnp.asarray(k), jnp.int32(2), n_sub=n_sub,
        ))
        np.testing.assert_array_equal(got, want)


def test_phase_aligned_layer_on_hardware(rng):
    """conv_pool_layer_phase — the phase-ALIGNED chunked L0 whose output
    rows feed the tail megakernel with no XLA relayout (the r4 lyr4-wide
    2.4x, scripts/probe_lyr4_phase.py) — bit-exact on the chip at the
    planned and a finer sub-chunk count."""
    from tpu_cnn.engine.cpu_ref import numpy_conv_layer
    from tpu_cnn.ops import pallas_poly

    k = rng.randint(-127, 128, size=(16, 1, 3, 3)).astype(np.int8)
    x = _stimuli(rng, 256, n=5)[:, None, :, :]
    want_nchw = np.stack(
        [numpy_conv_layer(x[b], k, 2) for b in range(len(x))])
    want = np.asarray(pallas_poly.phase_split_nchw(
        jnp.asarray(want_nchw), 8))
    for n_sub in (1, 2):
        got = np.asarray(pallas_poly.conv_pool_layer_phase(
            jnp.asarray(x), jnp.asarray(k), jnp.int32(2), h=8,
            n_sub=n_sub,
        ))
        np.testing.assert_array_equal(got, want)


def test_lyr4_chain_fps_floor_on_hardware():
    """lyr4-wide perf regression trip (round-4 verdict item 6): the fused
    detect chain at batch 1024 must clear 50k FPS on the chip — ~35%
    below the measured 82.6k (batch 1536, DESIGN "Roofline — lyr4-wide"),
    but far ABOVE the 36.5k of the r3 XLA-L0 chain, so a silent routing
    fallback or a kernel-regression of similar size trips here even
    through relay-session noise. (Adds one ~1-2 min compile to the lane.)

    The routing itself is asserted shape-level in
    test_lyr4_routes_through_phase_aligned_l0 (CPU); this is the
    throughput end of the same guard."""
    import os
    import time

    from tpu_cnn.apps.common import load_model
    from tpu_cnn.ops import detect_head, pallas_poly

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = load_model(os.path.join(repo, "artifacts", "pretrained-lyr4"),
                       "lyr4-wide")
    kernels = [jnp.asarray(k) for k in model.kernels]
    shifts = jnp.asarray(model.shifts, jnp.int32)
    fc_w = jnp.asarray(model.fc_weight)
    fc_b = jnp.asarray(model.fc_bias)
    s = model.config.img_size
    batch = 1024

    @jax.jit
    def e2e(x):
        rows = pallas_poly.conv_pool_layer_phase(
            x[:, None, :, :], kernels[0], shifts[0], h=8)
        _, pooled, twin = pallas_poly.cnn_forward_polyphase_pallas(
            rows, kernels[1:], shifts[1:], tb=1, pre_split=True,
            with_bins=True, with_twin=True, with_feats=True)
        return detect_head.detect_with_pooled(
            None, pooled, fc_w, fc_b, s, features_twin=twin)

    rs = np.random.RandomState(0)
    pools = [jnp.asarray(rs.randint(0, 256, (batch, s, s), dtype=np.uint8))
             for _ in range(2)]
    jax.block_until_ready(e2e(pools[0]))  # compile outside the timing

    rounds = 10
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        probes = []
        for i in range(rounds):
            p = e2e(pools[i % 2])[0][:8]
            p.copy_to_host_async()
            probes.append(p)
        _ = [np.asarray(p) for p in probes]
        fps = rounds * batch / (time.perf_counter() - t0)
        best = max(best, fps)
    assert best >= 50_000, (
        f"lyr4-wide fused detect regressed: {best:,.0f} FPS < 50,000 "
        f"(production measured 82.6k at batch 1536 — check the "
        f"phase-aligned L0 routing and the tail megakernel)"
    )
