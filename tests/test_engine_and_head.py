"""TPUEngine + detection head tests: device head vs host head parity,
engine protocol compatibility, shift-register semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_cnn.engine.cpu_ref import CPURefEngine, numpy_cnn_forward
from tpu_cnn.engine.tpu import TPUEngine
from tpu_cnn.head import cam as host_cam
from tpu_cnn.head import classify as host_classify
from tpu_cnn.models.cnn import CLASS_NAMES, DEFAULT_SHIFTS, FpgaCNN
from tpu_cnn.ops import detect_head


@pytest.fixture(scope="module")
def bins_model(stock_kernels):
    rs = np.random.RandomState(7)
    fc_w = rs.randn(6, 1024).astype(np.float32) * 0.1
    fc_b = rs.randn(6).astype(np.float32) * 0.01
    return FpgaCNN(stock_kernels, fc_w, fc_b, CLASS_NAMES)


@pytest.fixture(scope="module")
def gap_model(stock_kernels):
    fc_w = np.load("/root/reference/weights/fc_weight.npy")
    fc_b = np.load("/root/reference/weights/fc_bias.npy")
    return FpgaCNN(stock_kernels, fc_w, fc_b, CLASS_NAMES)


@pytest.fixture(scope="module")
def images(rng):
    return rng.randint(0, 256, size=(5, 128, 128)).astype(np.uint8)


def test_engine_features_match_oracle(bins_model, images):
    eng = TPUEngine(bins_model, backend="xla")
    feats = eng.run_batch(images)
    assert feats.shape == (5, 64, 256) and feats.dtype == np.uint8
    for b in range(5):
        np.testing.assert_array_equal(
            feats[b], numpy_cnn_forward(images[b], bins_model.kernels)
        )


def test_engine_run_protocol(bins_model, ramp_image):
    eng = TPUEngine(bins_model, backend="xla")
    feat, conv_ms, read_ms = eng.run(ramp_image)
    assert feat.shape == (64, 256)
    assert conv_ms > 0 and read_ms >= 0
    np.testing.assert_array_equal(feat, numpy_cnn_forward(ramp_image, bins_model.kernels))


def test_engine_swap_parity(bins_model, ramp_image):
    """TPU and CPU engines are drop-in swappable and bit-identical — the
    reference's FPGA/ARM --mode swap (realtime_detect.py:556)."""
    tpu = TPUEngine(bins_model, backend="xla")
    cpu = CPURefEngine(bins_model.kernels)
    f1, *_ = tpu.run(ramp_image)
    f2, *_ = cpu.run(ramp_image)
    np.testing.assert_array_equal(f1, f2)


def test_head_modes(bins_model, gap_model):
    assert bins_model.head_mode == "bins"
    assert gap_model.head_mode == "gap"


def test_device_classify_matches_host(bins_model, images):
    eng = TPUEngine(bins_model, backend="xla")
    feats = eng.run_batch(images)
    res = eng.detect_batch(images)
    idx, conf, probs = host_classify.classify_np(
        feats, bins_model.fc_weight, bins_model.fc_bias
    )
    np.testing.assert_array_equal(res.pred, idx)
    # float head: XLA vs BLAS accumulation order differs at ~1e-4 in probs
    np.testing.assert_allclose(res.probs, probs, rtol=2e-3, atol=1e-3)


def test_device_bbox_matches_host(bins_model, images):
    eng = TPUEngine(bins_model, backend="xla")
    feats = eng.run_batch(images)
    res = eng.detect_batch(images)
    for b in range(len(images)):
        want = host_cam.cam_bbox_fast(feats[b], int(res.pred[b]), bins_model.fc_weight)
        assert tuple(res.bbox[b]) == want


def test_gap_head_classify(gap_model, images):
    """Shipped (6, 64) GAP head must classify without error on-device and
    agree with the host implementation."""
    eng = TPUEngine(gap_model, backend="xla")
    res = eng.detect_batch(images)
    feats = eng.run_batch(images)
    idx, conf, probs = host_classify.classify_np(
        feats, gap_model.fc_weight, gap_model.fc_bias
    )
    np.testing.assert_array_equal(res.pred, idx)


def test_shift_register_update(bins_model, ramp_image):
    eng = TPUEngine(bins_model, backend="xla")
    f1, *_ = eng.run(ramp_image)
    eng.set_shifts(1, 3, 5)
    f2, *_ = eng.run(ramp_image)
    eng.set_shifts(*DEFAULT_SHIFTS)
    assert not np.array_equal(f1, f2)
    np.testing.assert_array_equal(
        f2, numpy_cnn_forward(ramp_image, bins_model.kernels, shifts=(1, 3, 5))
    )


def test_batch_padding_buckets(bins_model, rng):
    """Non-power-of-2 batches are padded; results unaffected by padding."""
    eng = TPUEngine(bins_model, backend="xla")
    imgs = rng.randint(0, 256, size=(3, 128, 128)).astype(np.uint8)
    feats = eng.run_batch(imgs)
    assert feats.shape[0] == 3
    np.testing.assert_array_equal(feats[2], numpy_cnn_forward(imgs[2], bins_model.kernels))


def test_saturated_channel_masking():
    """CAM must ignore channels with mean > 250 (pynq_inference.py:367-369)."""
    feats = np.zeros((1, 64, 256), np.uint8)
    feats[0, 0] = 255  # saturated channel
    feats[0, 1].reshape(16, 16)[4:8, 4:8] = 200  # localised activation
    fc_w = np.zeros((6, 1024), np.float32)
    fc_w[2, 0:16] = 10.0  # big weight on the saturated channel
    fc_w[2, 16:32] = 1.0  # modest weight on the informative channel
    bbox = np.asarray(
        detect_head.cam_bbox(jnp.asarray(feats), jnp.asarray([2]), jnp.asarray(fc_w))
    )[0]
    # box must localise around rows/cols 4..8 (scaled x8), not span the image
    x1, y1, x2, y2 = bbox
    assert (x2 - x1) < 127 and (y2 - y1) < 127
    host = host_cam.cam_bbox_fast(feats[0], 2, fc_w)
    assert tuple(bbox) == host


def test_run_batch_pooled_matches_host(bins_model, images):
    """Device-pooled fetch (read_features_sub analogue) == host bin pooling."""
    from tpu_cnn.head.classify import bin_pool_np

    eng = TPUEngine(bins_model, backend="xla")
    pooled = eng.run_batch_pooled(images)
    feats = eng.run_batch(images)
    want = bin_pool_np(feats)
    assert pooled.shape == (5, 1024)
    np.testing.assert_allclose(pooled, want, rtol=1e-6, atol=1e-6)


def test_run_batch_pooled_mega_fused_bins(bins_model, images):
    """On the mega backend the pooled fetch rides the kernel's fused-bins
    epilogue (with_bins=True, features never materialised) and matches the
    host twin within the /16/255 fold's 1-ulp rounding."""
    from tpu_cnn.head.classify import bin_pool_np

    eng = TPUEngine(bins_model, backend="mega")
    pooled = eng.run_batch_pooled(images)
    feats = eng.run_batch(images)
    want = bin_pool_np(feats)
    assert pooled.shape == (5, 1024)
    np.testing.assert_allclose(pooled, want, atol=1e-5)


def test_centroid_bbox_matches_host(bins_model, images):
    """Device centroid-profile box == host twin (f32 reduction-order may
    shift a floor by one pixel; allow 1 px)."""
    eng = TPUEngine(bins_model, backend="xla", box_mode="centroid")
    feats = eng.run_batch(images)
    res = eng.detect_batch(images)
    for b in range(len(images)):
        want = host_cam.cam_bbox_centroid(
            feats[b], int(res.pred[b]), bins_model.fc_weight
        )
        assert np.abs(np.asarray(res.bbox[b]) - np.asarray(want)).max() <= 1


def test_centroid_bbox_localises():
    """Point-mass CAM -> small box around the mass; zero CAM -> full frame."""
    feats = np.zeros((2, 64, 256), np.uint8)
    feats[0, 1].reshape(16, 16)[6:8, 9:11] = 200  # compact blob
    fc_w = np.zeros((6, 1024), np.float32)
    fc_w[2, 16:32] = 1.0
    boxes = np.asarray(detect_head.cam_bbox(
        jnp.asarray(feats), jnp.asarray([2, 2]), jnp.asarray(fc_w),
        box_mode="centroid",
    ))
    x1, y1, x2, y2 = boxes[0]
    assert 60 <= x1 and x2 <= 100 and 36 <= y1 and y2 <= 76  # around (9..11, 6..8)*8
    assert (x2 - x1) < 48 and (y2 - y1) < 48
    np.testing.assert_array_equal(boxes[1], [0, 0, 127, 127])  # zero CAM
    host = host_cam.cam_bbox_centroid(feats[0], 2, fc_w)
    assert np.abs(boxes[0] - np.asarray(host)).max() <= 1


def test_centroid_bbox_beats_reference_iou():
    """The tuned centroid profile must beat the reference threshold box on
    the held-out synthetic eval (the round-1 weak-spot metric)."""
    from tpu_cnn.apps.eval_detection import evaluate
    from tpu_cnn.utils import artifacts as art
    from tpu_cnn.utils.paths import default_artifacts

    bundle = art.load_bundle(default_artifacts())
    model = FpgaCNN(bundle.kernels, bundle.fc_weight, bundle.fc_bias,
                    bundle.class_names, shifts=DEFAULT_SHIFTS)
    ref = evaluate(model, mode="xla", n_per_class=10, verbose=False, box="ref")
    cen = evaluate(model, mode="xla", n_per_class=10, verbose=False,
                   box="centroid")
    assert cen["mean_iou"] > ref["mean_iou"]
    assert cen["iou_gain"] > 0


def test_reg_bbox_matches_host(bins_model, images, stock_kernels):
    """Device regression box == host twin (within 1 px of floor jitter)."""
    from tpu_cnn.head.bbox import bbox_regress_np
    from tpu_cnn.head.classify import bin_pool_np
    from tpu_cnn.models.cnn import CLASS_NAMES

    rs = np.random.RandomState(3)
    bbox_w = rs.randn(1025, 4).astype(np.float32) * 0.02
    model = FpgaCNN(stock_kernels, bins_model.fc_weight, bins_model.fc_bias,
                    CLASS_NAMES, bbox_weight=bbox_w)
    eng = TPUEngine(model, backend="xla", box_mode="reg")
    res = eng.detect_batch(images)
    feats = eng.run_batch(images)
    want = bbox_regress_np(bin_pool_np(feats), bbox_w)
    assert np.abs(res.bbox.astype(np.int64) - want.astype(np.int64)).max() <= 1


def test_reg_bbox_requires_weights(bins_model):
    with pytest.raises(ValueError, match="train_bbox"):
        TPUEngine(bins_model, backend="xla", box_mode="reg")


def test_reg_bbox_beats_cam_iou():
    """The shipped regression head must beat both CAM box profiles on the
    held-out synthetic eval."""
    from tpu_cnn.apps.eval_detection import evaluate
    from tpu_cnn.utils import artifacts as art
    from tpu_cnn.utils.paths import default_artifacts

    bundle = art.load_bundle(default_artifacts())
    if bundle.bbox_weight is None:
        pytest.skip("no bbox_weight.npy in the default bundle")
    model = FpgaCNN(bundle.kernels, bundle.fc_weight, bundle.fc_bias,
                    bundle.class_names, bbox_weight=bundle.bbox_weight)
    ref = evaluate(model, mode="xla", n_per_class=10, verbose=False, box="ref")
    reg = evaluate(model, mode="xla", n_per_class=10, verbose=False, box="reg")
    assert reg["mean_iou"] > ref["mean_iou"] + 0.15
    assert reg["mean_iou"] > 0.5


# ── multi-object head (beyond-reference: one CAM box per class) ──────


def test_multi_detect_matches_host_twin(bins_model, images):
    """detect_multi_batch: per-class boxes equal the host twin, and the
    argmax class's row equals the single-box production path."""
    eng = TPUEngine(bins_model, backend="xla")
    res = eng.detect_multi_batch(images)
    assert res.boxes.shape == (len(images), 6, 4)
    feats = eng.run_batch(images)
    single = eng.detect_batch(images)
    np.testing.assert_array_equal(res.pred, single.pred)
    np.testing.assert_allclose(res.probs, single.probs, rtol=1e-6)
    for b in range(len(images)):
        want = host_cam.cam_bbox_multi(feats[b], bins_model.fc_weight)
        np.testing.assert_array_equal(res.boxes[b], want)
        np.testing.assert_array_equal(res.boxes[b, res.pred[b]],
                                      single.bbox[b])


def test_multi_detect_mega_matches_xla(bins_model, images):
    """The kernel-fused multi path (bins + twin epilogue) agrees with the
    XLA path box-for-box."""
    ref = TPUEngine(bins_model, backend="xla").detect_multi_batch(images)
    got = TPUEngine(bins_model, backend="mega").detect_multi_batch(images)
    np.testing.assert_array_equal(got.pred, ref.pred)
    np.testing.assert_array_equal(got.boxes, ref.boxes)


def test_multi_detect_centroid_mode(bins_model, images):
    """box_mode='centroid' engines produce centroid-profile multi boxes."""
    eng = TPUEngine(bins_model, backend="xla", box_mode="centroid")
    res = eng.detect_multi_batch(images)
    feats = eng.run_batch(images)
    for b in range(len(images)):
        want = host_cam.cam_bbox_multi(feats[b], bins_model.fc_weight,
                                       box_mode="centroid")
        assert np.abs(res.boxes[b].astype(np.int64)
                      - want.astype(np.int64)).max() <= 1


def test_multi_detections_filter_and_sort(bins_model, images):
    """MultiDetectResult.detections: thresholded, descending by prob, and
    always contains the argmax class at thresh <= 1/num_classes."""
    eng = TPUEngine(bins_model, backend="xla")
    res = eng.detect_multi_batch(images)
    dets = res.detections(threshold=1 / 6)
    for b, d in enumerate(dets):
        assert d, "argmax prob >= 1/6 must always pass a 1/6 threshold"
        assert d[0][0] == res.pred[b]
        probs = [p for _, p, _ in d]
        assert probs == sorted(probs, reverse=True)
        assert all(p >= 1 / 6 for p in probs)
        for k, p, box in d:
            np.testing.assert_array_equal(np.asarray(box), res.boxes[b, k])
    # threshold above the max prob -> no detections
    hi = res.probs.max() + 0.01
    assert all(len(d) == 0 for d in res.detections(threshold=hi))


def test_multi_detect_gap_head(gap_model, images):
    """GAP-head multi mode: the CAM has no per-class spatial weights, so
    all classes share the unweighted activation box (detect() fallback)."""
    eng = TPUEngine(gap_model, backend="xla")
    res = eng.detect_multi_batch(images)
    assert res.boxes.shape == (len(images), 6, 4)
    for b in range(len(images)):
        assert (res.boxes[b] == res.boxes[b, 0]).all()


def test_multi_detect_reg_engine_uses_ref_cam(bins_model, images):
    """A box_mode='reg' engine still produces CAM multi boxes (the learned
    regressor is class-agnostic), matching the 'ref' profile."""
    from tpu_cnn.models.cnn import FpgaCNN as _F

    bbox_w = np.random.RandomState(0).randn(1025, 4).astype(np.float32) * 0.01
    model = _F(bins_model.kernels, bins_model.fc_weight, bins_model.fc_bias,
               CLASS_NAMES, bbox_weight=bbox_w)
    reg = TPUEngine(model, backend="xla", box_mode="reg")
    ref = TPUEngine(bins_model, backend="xla")
    np.testing.assert_array_equal(reg.detect_multi_batch(images).boxes,
                                  ref.detect_multi_batch(images).boxes)


def test_multi_detect_async_roundtrip(bins_model, images):
    eng = TPUEngine(bins_model, backend="xla")
    handle = eng.detect_multi_batch_async(images)
    res = eng.detect_multi_resolve(handle)
    want = eng.detect_multi_batch(images)
    np.testing.assert_array_equal(res.boxes, want.boxes)
    np.testing.assert_array_equal(res.pred, want.pred)


def test_detections_above_vector_threshold(bins_model, images):
    """detections_above accepts a per-class threshold vector (the
    calibrated multi_thresh.json semantics): class k passes iff
    probs[k] >= thr[k]."""
    from tpu_cnn.engine.tpu import detections_above

    eng = TPUEngine(bins_model, backend="xla")
    res = eng.detect_multi_batch(images)
    probs, boxes = res.probs[0], res.boxes[0]
    # thresholds exactly at each prob -> all classes pass
    assert len(detections_above(probs, boxes, probs.astype(np.float64))) == 6
    # one class's floor raised above its prob -> exactly that class drops
    thr = probs.astype(np.float64).copy()
    k0 = int(np.argmin(probs))
    thr[k0] = probs[k0] + 1e-6
    dets = detections_above(probs, boxes, thr)
    assert len(dets) == 5 and all(k != k0 for k, _, _ in dets)
    # scalar still works and sorts descending
    dets = detections_above(probs, boxes, 0.0)
    assert [p for _, p, _ in dets] == sorted((float(v) for v in probs),
                                             reverse=True)


# ── multi-label presence head (beyond-reference: sigmoid scores) ─────


@pytest.fixture(scope="module")
def ml_model(stock_kernels):
    """bins model with a multi-label presence head attached."""
    rs = np.random.RandomState(7)
    fc_w = rs.randn(6, 1024).astype(np.float32) * 0.1
    fc_b = rs.randn(6).astype(np.float32) * 0.01
    mw = rs.randn(6, 1024).astype(np.float32) * 0.1
    mb = rs.randn(6).astype(np.float32) * 0.01
    return FpgaCNN(stock_kernels, fc_w, fc_b, CLASS_NAMES,
                   multi_head=(mw, mb))


def test_multi_scores_match_host_twin(ml_model, images):
    """Device multi-label scores equal multi_scores_np on the engine's
    own features (sigmoid is transcendental: tight allclose, not bits);
    pred/conf/probs stay the softmax classifier, boxes unchanged."""
    eng = TPUEngine(ml_model, backend="xla")
    res = eng.detect_multi_batch(images)
    assert res.scores is not None and res.scores.shape == (len(images), 6)
    feats = eng.run_batch(images)
    want = host_classify.multi_scores_np(
        host_classify.pool_for_head(feats, ml_model.fc_weight),
        *ml_model.multi_head)
    # f32 dot accumulation order differs device vs numpy (z is a 1024-sum)
    np.testing.assert_allclose(res.scores, want, atol=1e-4)
    # softmax surfaces unaffected by the head
    plain = FpgaCNN(ml_model.kernels, ml_model.fc_weight, ml_model.fc_bias,
                    CLASS_NAMES)
    ref = TPUEngine(plain, backend="xla").detect_multi_batch(images)
    assert ref.scores is None
    np.testing.assert_array_equal(res.pred, ref.pred)
    np.testing.assert_allclose(res.probs, ref.probs, rtol=1e-6)
    np.testing.assert_array_equal(res.boxes, ref.boxes)


def test_multi_scores_instances_mode(ml_model, images):
    """scores ride as the LAST output in instance mode too — resolve
    must not confuse them with inst outputs."""
    eng = TPUEngine(ml_model, backend="xla")
    res = eng.detect_multi_batch(images, instances=2)
    assert res.scores is not None and res.scores.shape == (len(images), 6)
    assert res.inst_boxes.shape == (len(images), 6, 2, 4)
    ref = eng.detect_multi_batch(images)
    np.testing.assert_allclose(res.scores, ref.scores, rtol=1e-6)


def test_detections_use_scores_when_present(ml_model, images):
    """MultiDetectResult.detections thresholds the sigmoid scores (the
    space multi_thresh.json is calibrated in), NOT softmax probs."""
    from tpu_cnn.engine.tpu import presence_scores

    eng = TPUEngine(ml_model, backend="xla")
    res = eng.detect_multi_batch(images)
    np.testing.assert_array_equal(presence_scores(res), res.scores)
    sc = res.scores[0]
    thr = np.asarray(sc, np.float64).copy()
    k0 = int(np.argmin(sc))
    thr[k0] = sc[k0] + 1e-6  # floor just above class k0's SCORE
    dets = res.detections(thr)[0]
    assert len(dets) == 5 and all(k != k0 for k, _, _ in dets)
    # reported confidence is the score, sorted descending
    assert [p for _, p, _ in dets] == sorted(
        (float(v) for k, v in enumerate(sc) if k != k0), reverse=True)


def test_multi_head_bundle_roundtrip(tmp_path, stock_kernels):
    """multi_head.npz rides the bundle save/load like every per-head
    artifact."""
    from tpu_cnn.utils import artifacts as art

    rs = np.random.RandomState(3)
    bundle = art.ArtifactBundle(
        kernels=stock_kernels,
        fc_weight=rs.randn(6, 1024).astype(np.float32),
        fc_bias=rs.randn(6).astype(np.float32),
        class_names=list(CLASS_NAMES),
        multi_thresh=[0.5, 0.4, 0.3, 0.2, 0.6, 0.7],
        multi_head=(rs.randn(6, 1024).astype(np.float32),
                    rs.randn(6).astype(np.float32)),
    )
    art.save_bundle(tmp_path, bundle)
    got = art.load_bundle(tmp_path)
    np.testing.assert_array_equal(got.multi_head[0], bundle.multi_head[0])
    np.testing.assert_array_equal(got.multi_head[1], bundle.multi_head[1])
    model = FpgaCNN(got.kernels, got.fc_weight, got.fc_bias,
                    got.class_names, multi_thresh=got.multi_thresh,
                    multi_head=got.multi_head)
    assert model.multi_head is not None


def test_multi_head_shape_validation(stock_kernels):
    rs = np.random.RandomState(3)
    fc_w = rs.randn(6, 1024).astype(np.float32)
    fc_b = rs.randn(6).astype(np.float32)
    with pytest.raises(ValueError, match="multi_head"):
        FpgaCNN(stock_kernels, fc_w, fc_b, CLASS_NAMES,
                multi_head=(rs.randn(6, 64).astype(np.float32),
                            rs.randn(6).astype(np.float32)))


def test_multi_scores_mega_matches_xla(ml_model, images):
    """The fused-bins mega path produces the same scores as the XLA
    path (pooled bins are bit-identical; sigmoid rounding may differ by
    ulps)."""
    ref = TPUEngine(ml_model, backend="xla").detect_multi_batch(images)
    got = TPUEngine(ml_model, backend="mega").detect_multi_batch(images)
    np.testing.assert_allclose(got.scores, ref.scores, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_array_equal(got.boxes, ref.boxes)
