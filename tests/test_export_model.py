"""Deployable-export tests (``apps.export_model`` — the bitstream's role).

The exported .tcnnx must round-trip and reproduce the live engine exactly
(weights folded in, shifts still a runtime argument), and the megakernel
program must serialize for TPU even from this CPU-only harness.
"""

import os

import numpy as np
import pytest

from tpu_cnn.apps.export_model import (
    DeployedDetector,
    export_bundle,
    main as export_main,
)
from tpu_cnn.models.cnn import CLASS_NAMES, FpgaCNN
from tpu_cnn.utils import artifacts as art


@pytest.fixture(scope="module")
def artifact_dir(tmp_path_factory, stock_kernels):
    d = tmp_path_factory.mktemp("bundle")
    rs = np.random.RandomState(3)
    bundle = art.ArtifactBundle(
        kernels=stock_kernels,
        fc_weight=rs.randn(6, 1024).astype(np.float32) * 0.05,
        fc_bias=np.zeros(6, np.float32),
        class_names=list(CLASS_NAMES),
    )
    art.save_bundle(d, bundle)
    img = rs.randint(0, 256, (128, 128)).astype(np.uint8)
    img.tofile(os.path.join(d, "test_image_0_class2.bin"))
    return str(d)


@pytest.fixture(scope="module")
def images(rng):
    return rng.randint(0, 256, size=(5, 128, 128)).astype(np.uint8)


@pytest.fixture(scope="module")
def model(artifact_dir):
    bundle = art.load_bundle(artifact_dir)
    return FpgaCNN(bundle.kernels, bundle.fc_weight, bundle.fc_bias,
                   CLASS_NAMES, bbox_weight=bundle.bbox_weight)


def test_export_roundtrip_matches_live_engine(model, images):
    """CPU-platform xla export: deserialize + execute == the live engine's
    fused detect, bit-for-bit; padding/chunking handles batches that are
    not the compiled shape; runtime shift override still works."""
    from tpu_cnn.engine.tpu import TPUEngine

    blob = export_bundle(model, batch=(2, 4), backend="xla",
                         platforms=("cpu",))
    det = DeployedDetector(blob)
    assert det.manifest["batches"] == [2, 4]
    assert det.manifest["classes"] == list(CLASS_NAMES)

    eng = TPUEngine(model, backend="xla")
    live = eng.detect_batch(images)  # 5 images: exercises the chunk+pad path
    pred, conf, probs, bbox = det.detect(images)
    np.testing.assert_array_equal(pred, live.pred)
    np.testing.assert_array_equal(bbox, live.bbox)
    np.testing.assert_allclose(probs, live.probs, atol=1e-6)

    # runtime register: different shifts change the result through the SAME
    # exported program
    pred2, _, _, _ = det.detect(images, shifts=[0, 0, 0])
    eng.set_shifts(0, 0, 0)
    live2 = eng.detect_batch(images)
    np.testing.assert_array_equal(pred2, live2.pred)


def test_export_mega_for_tpu_from_cpu_host(model):
    """The megakernel program (Mosaic custom call embedded) must export for
    platform 'tpu' from this CPU-only host and survive serialization —
    execution is covered by the hardware lane."""
    blob = export_bundle(model, batch=8, backend="mega", platforms=("tpu",))
    det = DeployedDetector(blob)
    assert det.manifest["platforms"] == ["tpu"]
    assert det.manifest["backend"] == "mega"
    avals = det._exported.in_avals
    assert avals[0].shape == (8, 128, 128)
    assert len(det._exported.out_avals) == 4


def test_export_chained_mega_variant(stock_kernels, rng):
    """A geometry on the CHAINED mega plan (lyr4-wide) must export for TPU
    too — the head-layer reroute + tail megakernel serialize together."""
    from tpu_cnn.models.registry import default_shifts, get_config

    cfg = get_config("lyr4-wide")
    kernels = [
        rng.randint(-127, 128, size=(oc, ic, 3, 3)).astype(np.int8)
        for ic, oc, _ in cfg.layer_configs
    ]
    fc_w = rng.randn(6, cfg.feature_dim_bins).astype(np.float32) * 0.05
    m = FpgaCNN(kernels, fc_w, np.zeros(6, np.float32), CLASS_NAMES,
                shifts=default_shifts(cfg), config=cfg)
    blob = export_bundle(m, batch=4, backend="mega", platforms=("tpu",))
    det = DeployedDetector(blob)
    assert det.manifest["img_size"] == 256
    assert det._exported.in_avals[0].shape == (4, 256, 256)


def test_export_mega_refuses_cpu_platform(model):
    with pytest.raises(ValueError, match="TPU only"):
        export_bundle(model, batch=4, backend="mega", platforms=("cpu",))


def test_serve_from_deployable(tmp_path, model, images):
    """The serving batcher runs straight off a .tcnnx deployable — no model
    construction on the serving host — and matches the live engine."""
    from tpu_cnn.apps.serve import build_service
    from tpu_cnn.engine.tpu import TPUEngine

    path = tmp_path / "m.tcnnx"
    path.write_bytes(
        export_bundle(model, batch=4, backend="xla", platforms=("cpu",))
    )
    batcher, backend = build_service(None, deployable=str(path),
                                     max_batch=4, max_wait_ms=1.0)
    try:
        assert backend == "deployable:xla@cpu"
        res = batcher.submit(images[0])
        live = TPUEngine(model, backend="xla").detect_batch(images[:1])
        assert res["name"] == CLASS_NAMES[int(live.pred[0])]
        assert res["bbox"] == [int(v) for v in live.bbox[0]]
    finally:
        batcher.stop()


def test_export_cli_roundtrip(tmp_path, artifact_dir, capsys):
    out = str(tmp_path / "model.tcnnx")
    rc = export_main([
        "--artifacts", artifact_dir, "--output", out,
        "--backend", "xla", "--platforms", "cpu", "--batch", "4",
    ])
    assert rc == 0 and os.path.exists(out)
    img = sorted(
        p for p in os.listdir(artifact_dir) if p.startswith("test_image_")
    )[0]
    rc = export_main([
        "--load", out, "--image", os.path.join(artifact_dir, img),
    ])
    assert rc == 0
    txt = capsys.readouterr().out
    assert "backend xla" in txt and "box [" in txt


def test_export_multi_roundtrip(model, images):
    """--multi export: the container carries the multi-object program per
    bucket; detect_multi reproduces the live engine's multi path exactly,
    incl. chunking and shift override; single-program containers refuse
    detect_multi loudly."""
    from tpu_cnn.engine.tpu import TPUEngine

    blob = export_bundle(model, batch=(2, 4), backend="xla",
                         platforms=("cpu",), multi=True)
    det = DeployedDetector(blob)
    assert det.manifest["multi"] is True
    pred, conf, probs, boxes = det.detect_multi(images)  # 5 -> chunks 4+2pad
    assert boxes.shape == (5, 6, 4)
    want = TPUEngine(model, backend="xla").detect_multi_batch(images)
    np.testing.assert_array_equal(pred, want.pred)
    np.testing.assert_array_equal(boxes, want.boxes)
    # single detect still present and consistent
    p1, _, _, bb1 = det.detect(images)
    np.testing.assert_array_equal(p1, pred)
    for i in range(len(images)):
        np.testing.assert_array_equal(boxes[i, pred[i]], bb1[i])
    # runtime shift override flows into the multi program too
    p_shift, _, _, b_shift = det.detect_multi(images, shifts=(1, 2, 3))
    assert (b_shift != boxes).any() or (p_shift != pred).any()

    plain = DeployedDetector(export_bundle(model, batch=2, backend="xla",
                                           platforms=("cpu",)))
    assert plain.manifest["multi"] is False
    with pytest.raises(ValueError, match="--multi"):
        plain.detect_multi(images)


def test_export_instances_roundtrip(model, images):
    """--multi --instances export: the baked watershed instance head
    reproduces the live engine's instance outputs exactly (two chained
    while_loops survive jax.export serialization), and instances=1
    containers keep the plain 4-output contract."""
    from tpu_cnn.engine.tpu import TPUEngine

    blob = export_bundle(model, batch=(2, 4), backend="xla",
                         platforms=("cpu",), multi=True, instances=2)
    det = DeployedDetector(blob)
    assert det.manifest["instances"] == 2
    out = det.detect_multi(images)
    assert len(out) == 6
    want = TPUEngine(model, backend="xla").detect_multi_batch(
        images, instances=2)
    np.testing.assert_array_equal(out[3], want.boxes)
    np.testing.assert_array_equal(out[4], want.inst_boxes)
    np.testing.assert_array_equal(out[5], want.inst_counts)

    plain = DeployedDetector(export_bundle(model, batch=(2,), backend="xla",
                                           platforms=("cpu",), multi=True))
    assert plain.manifest["instances"] == 1
    assert len(plain.detect_multi(images)) == 4


def test_serve_from_deployable_instances(tmp_path, model, images):
    """serve --deployable --multi --instances: detections ride the baked
    instance program; a plain-multi container is refused for instances."""
    from tpu_cnn.apps.serve import build_service

    path = os.path.join(tmp_path, "mi.tcnnx")
    with open(path, "wb") as f:
        f.write(export_bundle(model, batch=(2,), backend="xla",
                              platforms=("cpu",), multi=True, instances=2))
    batcher, _ = build_service(None, max_batch=2, max_wait_ms=2.0,
                               deployable=path, multi=True,
                               multi_thresh=0.0, instances=2)
    res = batcher.submit(images[0])
    assert "detections" in res and len(res["detections"]) >= 6
    batcher.stop()

    plain = os.path.join(tmp_path, "pm.tcnnx")
    with open(plain, "wb") as f:
        f.write(export_bundle(model, batch=(2,), backend="xla",
                              platforms=("cpu",), multi=True))
    batcher2, _ = build_service(None, max_batch=2, max_wait_ms=2.0,
                                deployable=plain, multi=True,
                                multi_thresh=0.0, instances=2)
    try:
        res2 = batcher2.submit(images[0])
        assert "error" in res2 and "instance" in res2["error"]
    finally:
        batcher2.stop()


def test_serve_from_deployable_multi(tmp_path, model, images):
    """serve --deployable --multi: responses carry detections from the
    exported multi program; a non-multi container is refused."""
    from tpu_cnn.apps.serve import build_service

    path = os.path.join(tmp_path, "m.tcnnx")
    with open(path, "wb") as f:
        f.write(export_bundle(model, batch=(2,), backend="xla",
                              platforms=("cpu",), multi=True))
    batcher, backend = build_service(None, max_batch=2, max_wait_ms=2.0,
                                     deployable=path, multi=True,
                                     multi_thresh=0.0)
    assert backend.startswith("deployable:")
    res = batcher.submit(images[0])
    assert len(res["detections"]) == 6
    batcher.stop()

    plain = os.path.join(tmp_path, "p.tcnnx")
    with open(plain, "wb") as f:
        f.write(export_bundle(model, batch=(2,), backend="xla",
                              platforms=("cpu",)))
    with pytest.raises(ValueError, match="re-export"):
        build_service(None, max_batch=2, deployable=plain, multi=True)


@pytest.fixture(scope="module")
def ml_model(artifact_dir):
    """model with a multi-label presence head + calibrated floors — the
    full deployment contract the manifest must carry."""
    bundle = art.load_bundle(artifact_dir)
    rs = np.random.RandomState(11)
    mh = (rs.randn(6, 1024).astype(np.float32) * 0.05,
          rs.randn(6).astype(np.float32) * 0.1)
    return FpgaCNN(bundle.kernels, bundle.fc_weight, bundle.fc_bias,
                   CLASS_NAMES, multi_head=mh,
                   multi_thresh=[0.5, 0.45, 0.55, 0.5, 0.48, 0.52])


def test_export_multi_head_scores(ml_model, images):
    """A bundle shipping multi_head.npz bakes the presence head into the
    exported multi program; scores ride LAST and match the live engine."""
    from tpu_cnn.engine.tpu import TPUEngine

    blob = export_bundle(ml_model, batch=(2, 4), backend="xla",
                         platforms=("cpu",), multi=True)
    det = DeployedDetector(blob)
    assert det.manifest["multi_head"] is True
    out = det.detect_multi(images)
    assert len(out) == 5
    want = TPUEngine(ml_model, backend="xla").detect_multi_batch(images)
    np.testing.assert_allclose(out[-1], want.scores, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(out[3], want.boxes)


def test_deployable_detections_match_live_engine(ml_model, images):
    """VERDICT r3 item 7: the .tcnnx manifest carries the calibrated
    floors + instance emission policy, and DeployedDetector.detections()
    equals the live engine's filtered output on the same frames — the
    deployable IS the deployment contract (reference: weights/ + .bit +
    .hwh)."""
    from tpu_cnn.engine.tpu import TPUEngine

    for instances in (1, 2):
        blob = export_bundle(ml_model, batch=(2, 4), backend="xla",
                             platforms=("cpu",), multi=True,
                             instances=instances)
        det = DeployedDetector(blob)
        assert det.manifest["multi_thresh"] == [
            float(t) for t in ml_model.multi_thresh]
        assert det.manifest["instance_min_pixels"] > 0
        got = det.detections(images)
        eng = TPUEngine(ml_model, backend="xla")
        want = eng.detect_multi_batch(
            images, instances=instances).detections(ml_model.multi_thresh)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert [(k, b) for k, _, b in g] == [(k, b) for k, _, b in w]
            np.testing.assert_allclose([p for _, p, _ in g],
                                       [p for _, p, _ in w], rtol=1e-5)


def test_serve_from_deployable_multi_head(tmp_path, ml_model, images):
    """serve --deployable: the adapter unpacks the scores output, and the
    served detections threshold scores (not softmax probs)."""
    from tpu_cnn.apps.serve import build_service

    path = os.path.join(tmp_path, "mh.tcnnx")
    with open(path, "wb") as f:
        f.write(export_bundle(ml_model, batch=(2,), backend="xla",
                              platforms=("cpu",), multi=True))
    batcher, _ = build_service(None, max_batch=2, max_wait_ms=2.0,
                               deployable=path, multi=True)
    try:
        res = batcher.submit(images[0])
        assert "detections" in res
        from tpu_cnn.engine.tpu import TPUEngine, detections_above

        live = TPUEngine(ml_model, backend="xla").detect_multi_batch(
            images[:1])
        want = detections_above(live.scores[0], live.boxes[0],
                                ml_model.multi_thresh)
        got = [(d["pred"], tuple(d["bbox"])) for d in res["detections"]]
        assert got == [(k, b) for k, _, b in want]
    finally:
        batcher.stop()
