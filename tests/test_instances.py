"""Multi-INSTANCE detection head tests: watershed component labeling
(device vs host twin, exact), instance box extraction, the shared
emission policy, engine surface, and the evaluation harness.

Beyond-reference surface: the reference boxes the argmax class only
(``software/realtime_detect.py:85-116``); the instance head splits each
class's CAM mask at its percentile-88 cores so two objects of the SAME
class get separate boxes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_cnn.engine.tpu import TPUEngine, instance_detections
from tpu_cnn.head import cam as host_cam
from tpu_cnn.models.cnn import CLASS_NAMES, FpgaCNN
from tpu_cnn.ops import detect_head


@pytest.fixture(scope="module")
def bins_model(stock_kernels):
    rs = np.random.RandomState(7)
    fc_w = rs.randn(6, 1024).astype(np.float32) * 0.1
    fc_b = rs.randn(6).astype(np.float32) * 0.01
    return FpgaCNN(stock_kernels, fc_w, fc_b, CLASS_NAMES)


@pytest.fixture(scope="module")
def images(rng):
    return rng.randint(0, 256, size=(4, 128, 128)).astype(np.uint8)


# ── component labeling primitives ────────────────────────────────────


def _device_labels(mask):
    return np.asarray(
        jax.jit(detect_head._connected_labels)(jnp.asarray(mask))
    )


def test_connected_labels_crafted():
    """Hand-built mask: two blobs, one L-shape, a diagonal pair (diagonals
    are NOT connected under 4-connectivity)."""
    s = 16
    mask = np.zeros((s, s), bool)
    mask[1:4, 1:4] = True  # blob A, min index 1*16+1 = 17
    mask[1:3, 8:12] = True  # blob B, min index 1*16+8 = 24
    mask[10, 10] = True  # diagonal pair: two separate components
    mask[11, 11] = True
    mask[6:9, 2] = True  # L-shape
    mask[8, 2:5] = True
    lab = _device_labels(mask[None])[0]
    want = host_cam.connected_labels_np(mask)
    assert np.array_equal(lab, want)
    assert lab[1, 1] == 17 and lab[3, 3] == 17
    assert lab[1, 8] == 24
    assert lab[10, 10] != lab[11, 11]  # 4-connectivity
    assert lab[6, 2] == lab[8, 4]  # L-shape is one component
    assert lab[0, 0] == s * s  # background sentinel


def test_connected_labels_random_parity(rng):
    masks = rng.rand(6, 16, 16) < 0.35
    lab = _device_labels(masks)
    for i in range(len(masks)):
        assert np.array_equal(lab[i], host_cam.connected_labels_np(masks[i]))


def test_component_stats_matches_onehot_ranking(rng):
    """_component_stats (run-length counts over sorted labels) must
    reproduce the brute-force one-hot ranking it replaced: exact integer
    key count*1024 + (1023 - label), absent slots -> (label -1, count 0).
    Includes an all-background row and a single-component row."""
    s = 16
    masks = rng.rand(8, s, s) < 0.3
    masks[5] = False  # all background
    masks[6] = False
    masks[6, 2:5, 3:7] = True  # exactly one component
    labels = _device_labels(masks).reshape(8, s * s)
    for max_i in (1, 2, 4):
        lab_d, cnt_d = jax.jit(
            detect_head._component_stats, static_argnums=1
        )(jnp.asarray(labels), max_i)
        lab_d, cnt_d = np.asarray(lab_d), np.asarray(cnt_d)
        for r in range(len(labels)):
            uniq = [int(v) for v in np.unique(labels[r]) if v != s * s]
            ranked = sorted(
                uniq,
                key=lambda v: -(int((labels[r] == v).sum()) * 1024
                                + (1023 - v)),
            )[:max_i]
            want_lab = ranked + [-1] * (max_i - len(ranked))
            want_cnt = [int((labels[r] == v).sum()) for v in ranked]
            want_cnt += [0] * (max_i - len(ranked))
            assert lab_d[r].tolist() == want_lab
            assert cnt_d[r].tolist() == want_cnt


def test_grow_labels_parity(rng):
    """Watershed growth: same layer-synchronous min-label rule on device
    and host, including contested (equidistant) pixels."""
    for seed in range(4):
        rs = np.random.RandomState(seed)
        mask = rs.rand(16, 16) < 0.6
        cores = mask & (rs.rand(16, 16) < 0.2)
        seeds = host_cam.connected_labels_np(cores)
        got = np.asarray(
            jax.jit(detect_head._grow_labels)(
                jnp.asarray(seeds[None]), jnp.asarray(mask[None])
            )
        )[0]
        want = host_cam.grow_labels_np(seeds, mask)
        assert np.array_equal(got, want)
        # grown labels cover exactly the mask pixels reachable from cores
        assert ((got != 256) <= mask).all()


def test_cam_instances_device_host_parity(rng):
    feats = rng.randint(0, 200, (5, 64, 256)).astype(np.uint8)
    feats[:, 3] = 255  # saturated channel exercises the validity mask
    fc_w = rng.randn(6, 1024).astype(np.float32)
    d_boxes, d_counts = jax.jit(
        lambda f: detect_head.cam_instances_f32(
            f.astype(jnp.float32), jnp.asarray(fc_w), 128, 3
        )
    )(jnp.asarray(feats))
    d_boxes, d_counts = np.asarray(d_boxes), np.asarray(d_counts)
    assert d_boxes.shape == (5, 6, 3, 4) and d_counts.shape == (5, 6, 3)
    for b in range(5):
        hb, hc = host_cam.cam_instances(feats[b], fc_w, 128, 3)
        assert np.array_equal(hb, d_boxes[b])
        assert np.array_equal(hc, d_counts[b])


def _two_blob_features():
    """Features whose class-0 CAM has two well-separated blobs: channel 0
    active in two 5x5 regions of the 16x16 map, fc row 0 uniform positive
    on channel 0's bins."""
    feats = np.zeros((1, 64, 256), np.uint8)
    fm = np.zeros((16, 16), np.uint8)
    fm[2:7, 2:7] = 200  # blob 1: rows 2-6, cols 2-6
    fm[9:14, 10:15] = 200  # blob 2: rows 9-13, cols 10-14
    feats[0, 0] = fm.reshape(-1)
    fc_w = np.zeros((6, 1024), np.float32)
    fc_w[0, 0:16] = 1.0  # channel 0, all 16 bins
    fc_w[1:, 16:32] = 0.5  # other classes look at the (empty) channel 1
    return feats, fc_w


def test_instances_separate_two_blobs():
    """The watershed head yields one instance per blob with the exact
    boxes; the per-class (union) box spans both."""
    feats, fc_w = _two_blob_features()
    boxes, counts = jax.jit(
        lambda f: detect_head.cam_instances_f32(
            f.astype(jnp.float32), jnp.asarray(fc_w), 128, 3
        )
    )(jnp.asarray(feats))
    boxes, counts = np.asarray(boxes)[0, 0], np.asarray(counts)[0, 0]
    assert counts[0] == 25 and counts[1] == 25 and counts[2] == 0
    # size tie -> smaller min-index label (blob 1, top-left) first
    assert tuple(boxes[0]) == (2 * 8, 2 * 8, 7 * 8, 7 * 8)
    assert tuple(boxes[1]) == (10 * 8, 9 * 8, 15 * 8, 14 * 8)
    union = np.asarray(jax.jit(
        lambda f: detect_head.cam_bbox_multi_f32(
            f.astype(jnp.float32), jnp.asarray(fc_w), 128
        )
    )(jnp.asarray(feats)))[0, 0]
    assert tuple(union) == (2 * 8, 2 * 8, 15 * 8, 14 * 8)  # spans both


# ── emission policy (instance_detections) ────────────────────────────


def test_instance_detections_policy():
    probs = np.array([0.9, 0.5, 0.01])
    boxes = np.array([[0, 0, 99, 99], [10, 10, 20, 20], [0, 0, 5, 5]])
    inst_boxes = np.array([
        [[0, 0, 40, 40], [60, 60, 99, 99], [0, 0, 0, 0]],  # two instances
        [[10, 10, 20, 20], [0, 0, 2, 2], [0, 0, 0, 0]],  # one (2nd tiny)
        [[0, 0, 5, 5], [0, 0, 0, 0], [0, 0, 0, 0]],  # below prob thresh
    ])
    inst_counts = np.array([[30, 28, 0], [40, 2, 0], [10, 0, 0]])
    dets = instance_detections(probs, boxes, inst_boxes, inst_counts,
                               threshold=0.15)
    # class 0: both instances (comparable sizes); class 1: the tiny second
    # component fails min_pixels/min_frac -> union box; class 2: filtered
    assert dets == [
        (0, pytest.approx(0.9), (0, 0, 40, 40)),
        (0, pytest.approx(0.9), (60, 60, 99, 99)),
        (1, pytest.approx(0.5), (10, 10, 20, 20)),
    ]


def test_instance_detections_min_frac():
    """A second component far smaller than the largest is suppressed even
    above min_pixels (over-split suppression)."""
    probs = np.array([0.9])
    boxes = np.array([[0, 0, 99, 99]])
    inst_boxes = np.array([[[0, 0, 40, 40], [60, 60, 99, 99]]])
    inst_counts = np.array([[100, 8]])  # 8 >= min_pixels but < 0.25 * 100
    dets = instance_detections(probs, boxes, inst_boxes, inst_counts, 0.15)
    assert dets == [(0, pytest.approx(0.9), (0, 0, 99, 99))]
    # with the relative floor disabled both survive
    dets = instance_detections(probs, boxes, inst_boxes, inst_counts, 0.15,
                               min_frac=0.0)
    assert [d[2] for d in dets] == [(0, 0, 40, 40), (60, 60, 99, 99)]


# ── engine surface ───────────────────────────────────────────────────


def test_engine_detect_multi_instances(bins_model, images):
    eng = TPUEngine(bins_model, backend="xla")
    res = eng.detect_multi_batch(images, instances=2)
    assert res.inst_boxes.shape == (len(images), 6, 2, 4)
    assert res.inst_counts.shape == (len(images), 6, 2)
    plain = eng.detect_multi_batch(images)
    assert plain.inst_boxes is None and plain.inst_counts is None
    assert np.array_equal(res.boxes, plain.boxes)
    feats = eng.run_batch(images)
    for b in range(len(images)):
        hb, hc = host_cam.cam_instances(feats[b], bins_model.fc_weight,
                                        max_instances=2)
        assert np.array_equal(hb, res.inst_boxes[b])
        assert np.array_equal(hc, res.inst_counts[b])
    # result-level detections use the instance expansion
    dets = res.detections(0.0)
    assert all(isinstance(d, tuple) and len(d) == 3 for d in dets[0])


def test_engine_instances_async(bins_model, images):
    eng = TPUEngine(bins_model, backend="xla")
    h = eng.detect_multi_batch_async(images, instances=3)
    res = eng.detect_multi_resolve(h)
    want = eng.detect_multi_batch(images, instances=3)
    assert np.array_equal(res.inst_boxes, want.inst_boxes)
    assert np.array_equal(res.inst_counts, want.inst_counts)


# ── evaluation harness ───────────────────────────────────────────────


def test_same_class_scenes():
    from tpu_cnn.train.data import CompositeScenes

    ds = CompositeScenes(n_scenes=6, seed=3, same_class=True)
    _, truths = ds.arrays()
    for truth in truths:
        classes = [cls for cls, _ in truth]
        assert len(set(classes)) == 1 and len(classes) == 2


def test_evaluate_instances_runs(bins_model):
    from tpu_cnn.apps.eval_detection import evaluate_instances

    out = evaluate_instances(bins_model, mode="xla", n_scenes=4,
                             instances=2, same_class=True, verbose=False)
    for key in ("recall@0.1", "recall@0.3", "matched_iou",
                "false_boxes_per_frame"):
        assert key in out
    assert out["objects"] == 8


def test_mesh_engine_instances_match_single_device(bins_model, images):
    """The meshed multi-instance program (8-device virtual mesh) is
    bit-identical to the single-device engine's instance outputs."""
    import jax as _jax

    from tpu_cnn.parallel.mesh import MeshEngine, make_mesh

    if len(_jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device CPU mesh")
    mesh = make_mesh()
    meng = MeshEngine(bins_model, mesh, backend="xla")
    res = meng.detect_multi_batch(images, instances=2)
    want = TPUEngine(bins_model, backend="xla").detect_multi_batch(
        images, instances=2)
    assert np.array_equal(res.inst_boxes, want.inst_boxes)
    assert np.array_equal(res.inst_counts, want.inst_counts)
    assert np.array_equal(res.boxes, want.boxes)
    plain = meng.detect_multi_batch(images)
    assert plain.inst_boxes is None


def test_serve_batcher_instances(bins_model, images):
    """DynamicBatcher with instances: responses carry per-instance
    detections via the shared instance_detections policy."""
    from tpu_cnn.apps.serve import DynamicBatcher

    eng = TPUEngine(bins_model, backend="xla")
    b = DynamicBatcher(eng, CLASS_NAMES, max_batch=4, max_wait_ms=2.0,
                       multi=True, multi_thresh=0.0, instances=2)
    try:
        out = b.submit(images[0], timeout_s=120.0)
        assert "detections" in out
        res = eng.detect_multi_batch(images[:1], instances=2)
        want = res.detections(0.0)[0]
        got = out["detections"]
        # the batcher pads to max_batch, a different XLA program than the
        # direct batch-1 dispatch — probabilities may differ at ulp scale,
        # boxes and ordering must not
        assert [(d["pred"], tuple(d["bbox"])) for d in got] == \
            [(k, bbox) for k, _, bbox in want]
        for d, (_, prob, _) in zip(got, want):
            assert d["conf"] == pytest.approx(prob, abs=1e-5)
    finally:
        b.stop()


def test_serve_batcher_rejects_unsupported_instances(bins_model):
    from tpu_cnn.apps.serve import DynamicBatcher, _HostDetectAdapter
    from tpu_cnn.engine.cpu_ref import CPURefEngine

    adapter = _HostDetectAdapter(CPURefEngine(bins_model.kernels), bins_model)
    with pytest.raises(ValueError, match="instances"):
        DynamicBatcher(adapter, CLASS_NAMES, multi=True, instances=2)


def test_evaluate_instances_cpu_engine_fallback(bins_model):
    """Engines without detect_multi_batch ride the host twins."""
    from tpu_cnn.apps.eval_detection import evaluate_instances

    out = evaluate_instances(bins_model, mode="cpu", n_scenes=2,
                             instances=2, verbose=False)
    assert out["objects"] == 4
