"""App-surface tests: the CLI pipelines end-to-end on synthetic data —
infer (single + batch accuracy scoring), dump->retrain loop, realtime
synthetic smoke run, benchmark smoke."""

import json
import os

import numpy as np
import pytest

from tpu_cnn.models.cnn import CLASS_NAMES, DEFAULT_SHIFTS
from tpu_cnn.train import data as D
from tpu_cnn.utils import artifacts as art
from tpu_cnn.utils import weights as wc


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
    # a few labelled test images from the synthetic set
    ds = D.SyntheticShapes(n_per_class=3)
    imgs, labels = ds.arrays()
    for i, (img, lab) in enumerate(zip(imgs, labels)):
        raw = np.round(img * 255).astype(np.uint8)
        raw.tofile(os.path.join(d, f"test_image_{i}_class{int(lab)}.bin"))
    return str(d)


def test_infer_cli_single(artifact_dir, capsys):
    from tpu_cnn.apps import infer

    img = sorted(f for f in os.listdir(artifact_dir) if f.endswith(".bin"))[0]
    infer.main([
        "--artifacts", artifact_dir,
        "--image", os.path.join(artifact_dir, img),
        "--mode", "cpu",
    ])
    out = capsys.readouterr().out
    assert "Prediction:" in out and "BBox:" in out
    # annotated JPEG written next to the input (reference behaviour)
    stem = os.path.splitext(img)[0]
    assert os.path.exists(os.path.join(artifact_dir, f"{stem}_result.jpg"))


def test_infer_cli_batch_scoring(artifact_dir, capsys):
    from tpu_cnn.apps import infer

    infer.main(["--artifacts", artifact_dir, "--mode", "cpu", "--no-save",
                "--image-dir", artifact_dir])
    out = capsys.readouterr().out
    assert "Accuracy:" in out


def test_dump_then_retrain_loop(artifact_dir, tmp_path, capsys):
    """The dump->retrain loop must produce a (6, 1024) head that beats the
    random head on the dumped features (reference loop SURVEY.md §3.5)."""
    from tpu_cnn.apps import dump_features, retrain_classifier

    npz = str(tmp_path / "feats.npz")
    dump_features.main([
        "--artifacts", artifact_dir, "--image-dir", artifact_dir,
        "--output", npz, "--mode", "cpu",
    ])
    features, labels, names, shifts = art.load_feature_dump(npz)
    assert features.shape[1:] == (64, 256) and features.dtype == np.uint8
    assert list(shifts) == list(DEFAULT_SHIFTS)
    assert len(names) == len(labels) == len(features)

    out_dir = str(tmp_path / "retrained")
    retrain_classifier.main([
        "--features", npz, "--output-dir", out_dir,
        "--epochs", "300",
        "--classes", os.path.join(artifact_dir, "classes.json"),
    ])
    w = np.load(os.path.join(out_dir, "fc_weight.npy"))
    b = np.load(os.path.join(out_dir, "fc_bias.npy"))
    assert w.shape == (6, 1024) and b.shape == (6,)

    from tpu_cnn.head.classify import classify_np

    idx, conf, probs = classify_np(features, w, b)
    acc = (idx == labels).mean()
    assert acc > 0.5, f"retrained head accuracy {acc}"


def test_retrain_optimizer_adam(artifact_dir, tmp_path):
    """--optimizer adam: the beyond-reference adaptive Adam head fit
    through the SAME retrain CLI — measured 95.3% vs 78.2% held-out on
    the hard augmented-backbone realphoto features (ROADMAP probes)."""
    from tpu_cnn.apps import dump_features, retrain_classifier
    from tpu_cnn.head.classify import classify_np

    npz = str(tmp_path / "feats.npz")
    dump_features.main(["--artifacts", artifact_dir, "--image-dir", artifact_dir,
                        "--output", npz, "--mode", "cpu"])
    out_dir = str(tmp_path / "adam")
    retrain_classifier.main([
        "--features", npz, "--output-dir", out_dir, "--optimizer", "adam",
        "--classes", os.path.join(artifact_dir, "classes.json"),
    ])
    w = np.load(os.path.join(out_dir, "fc_weight.npy"))
    b = np.load(os.path.join(out_dir, "fc_bias.npy"))
    assert w.shape == (6, 1024) and b.shape == (6,)
    features, labels, _, _ = art.load_feature_dump(npz)
    idx, _, _ = classify_np(features, w, b)
    assert (idx == labels).mean() > 0.5


def test_retrain_prefix(artifact_dir, tmp_path):
    """--prefix arm_ names the outputs arm_fc_*.npy (engine-specific heads)."""
    from tpu_cnn.apps import dump_features, retrain_classifier

    npz = str(tmp_path / "feats.npz")
    dump_features.main(["--artifacts", artifact_dir, "--image-dir", artifact_dir,
                        "--output", npz, "--mode", "cpu"])
    out_dir = str(tmp_path / "r2")
    retrain_classifier.main(["--features", npz, "--output-dir", out_dir,
                             "--epochs", "50", "--prefix", "arm_",
                             "--classes", os.path.join(artifact_dir, "classes.json")])
    assert os.path.exists(os.path.join(out_dir, "arm_fc_weight.npy"))
    bundle = art.load_bundle(artifact_dir)  # sanity: default still loads


def test_realtime_synthetic_smoke(artifact_dir, capsys):
    from tpu_cnn.apps import realtime

    realtime.main([
        "--artifacts", artifact_dir, "--mode", "cpu",
        "--source", "synthetic", "--frames", "25", "--no-serve",
    ])
    out = capsys.readouterr().out
    assert "Done. 25 frames." in out
    assert "FPS" in out  # periodic status line printed at frame 20


def test_realtime_fused_head_smoke(artifact_dir, capsys):
    """--fused: the whole head runs in the engine's jitted detect; the
    loop consumes DetectResult fields instead of host-twin outputs."""
    from tpu_cnn.apps import realtime

    realtime.main([
        "--artifacts", artifact_dir, "--mode", "xla",
        "--source", "synthetic", "--frames", "3", "--no-serve", "--fused",
    ])
    out = capsys.readouterr().out
    assert ":fused" in out
    assert "Done. 3 frames." in out


def test_realtime_fused_falls_back_on_host_engine(artifact_dir, capsys):
    from tpu_cnn.apps import realtime

    realtime.main([
        "--artifacts", artifact_dir, "--mode", "cpu",
        "--source", "synthetic", "--frames", "2", "--no-serve", "--fused",
    ])
    out = capsys.readouterr().out
    assert "no fused detect" in out
    assert "Done. 2 frames." in out


def test_realtime_video_file_source(tmp_path, artifact_dir, capsys):
    """--source <path> drives the loop from a video file (beyond-reference;
    loops at EOF so --frames beyond the clip length still completes)."""
    cv2 = pytest.importorskip("cv2")

    path = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (64, 48))
    rs = np.random.RandomState(0)
    for _ in range(5):
        w.write(rs.randint(0, 256, (48, 64, 3), dtype=np.uint8))
    w.release()

    from tpu_cnn.apps import realtime

    realtime.main([
        "--artifacts", artifact_dir, "--mode", "cpu",
        "--source", path, "--frames", "8", "--no-serve",
    ])
    out = capsys.readouterr().out
    assert "Done. 8 frames." in out  # > clip length proves the EOF loop


def test_overlay_burns_text_into_pixels():
    """The MJPEG viewer must see class/conf/FPS/stage-ms IN the frame
    (reference ``realtime_detect.py:490-514``), not only on the console:
    the overlay's text regions must perturb a uniform background."""
    from tpu_cnn.apps.realtime import draw_overlay

    frame = np.full((480, 640, 3), 90, np.uint8)
    probs = np.asarray([0.7, 0.1, 0.05, 0.05, 0.05, 0.05], np.float32)
    names = ["airplane", "cat", "zebra", "bus", "bicycle", "donut"]
    draw_overlay(frame, 0, "airplane", 0.7, probs, (30, 40, 90, 100),
                 123.4, 1.23, 0.45, "TPUEngine:mega", names)
    # header block (label+conf / FPS+stage-ms / engine line)
    hdr = frame[4:50, 8:260]
    assert (hdr != 90).any(axis=2).sum() > 200
    # class-name labels burned beside the probability bars
    lbl = frame[8:96, 640 - 176 : 640 - 120]
    assert (lbl != 90).any(axis=2).sum() > 100


def test_realtime_mjpeg_stream_endpoints():
    """Drive the MJPEG server end-to-end: index page + one multipart frame
    delivered through a real socket (publisher/subscriber wakeup path)."""
    import http.client
    import threading
    import time
    from http.server import ThreadingHTTPServer

    from tpu_cnn.apps import realtime

    srv = ThreadingHTTPServer(("127.0.0.1", 0), realtime.Stream)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
        conn.request("GET", "/")
        resp = conn.getresponse()
        body = resp.read()
        assert resp.status == 200 and b"/stream" in body
        conn.close()

        frame = np.zeros((32, 32, 3), np.uint8)

        def feed():
            for _ in range(50):
                realtime.PUBLISHER.publish(frame)
                time.sleep(0.01)

        t = threading.Thread(target=feed, daemon=True)
        t.start()
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
        conn.request("GET", "/stream")
        resp = conn.getresponse()
        assert resp.status == 200
        assert "multipart/x-mixed-replace" in resp.getheader("Content-Type")
        chunk = resp.fp.read(2048)  # one boundary + JPEG header
        assert b"tpuframe" in chunk and b"image/jpeg" in chunk
        assert b"\xff\xd8" in chunk  # JPEG SOI marker
        conn.close()
        t.join()
    finally:
        srv.shutdown()


def test_realtime_preprocess():
    from tpu_cnn.apps.realtime import preprocess

    frame = np.random.RandomState(0).randint(0, 256, (480, 640, 3)).astype(np.uint8)
    small = preprocess(frame)
    assert small.shape == (128, 128) and small.dtype == np.uint8


def test_benchmark_smoke(artifact_dir, capsys):
    from tpu_cnn.apps import benchmark

    results = benchmark.main([
        "--artifacts", artifact_dir, "--batch", "4", "--runs", "1",
        "--modes", "cpu",
    ])
    assert "cpu" in results and results["cpu"] > 0
    out = capsys.readouterr().out
    assert "M MACs" in out


def test_benchmark_camera_pipeline_pitch(artifact_dir, capsys):
    """--camera-pipeline accepts --cam-pitch (padded-row staging) and the
    measured path still produces boxes: plumbing check for the pad-width
    preprocess lever (the perf claim itself is probed on hardware,
    scripts/probe_preprocess_phase.py)."""
    from tpu_cnn.apps import benchmark

    res = benchmark.main([
        "--artifacts", artifact_dir, "--batch", "4", "--runs", "1",
        "--camera-pipeline", "--cam-res", "320x240", "--cam-pitch", "336",
        "--modes", "xla",
    ])
    assert res["camera_pipeline"] > 0
    assert "320x240x4@336" in capsys.readouterr().out


def test_benchmark_train_mode(capsys):
    """--train measures the phase-1 train step (fwd+bwd+Adam) and reports
    ms/step, img/s, MFU for both compute dtypes."""
    from tpu_cnn.apps import benchmark

    for dtype in ("float32", "bfloat16"):
        res = benchmark.main([
            "--train", "--train-dtype", dtype, "--batch", "4", "--runs", "2",
        ])
        assert res["train_img_per_s"] > 0
        assert "train step" in capsys.readouterr().out


def test_bench_script_importable():
    """bench.py must exist, be importable, and target the required schema."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert hasattr(mod, "main") and mod.BASELINE_FPS == 22.0


def test_verify_cli(capsys):
    from tpu_cnn.apps import verify

    rc = verify.main(["--backends", "numpy,native,xla-f32,torch", "--images", "2"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "DESIGN IS BIT-ACCURATE" in out


def test_verify_cli_head_stage_gates_verdict(capsys, monkeypatch):
    """The fused-head stage is part of the canonical verdict: a head
    mismatch must flip the exit code even when the feature backends agree,
    and --no-head must skip the stage."""
    from tpu_cnn.apps import verify

    rc = verify.main(["--backends", "numpy", "--images", "1", "--no-head"])
    out = capsys.readouterr().out
    assert rc == 0 and "head[" not in out

    monkeypatch.setattr(verify, "verify_head", lambda *a, **k: False)
    rc = verify.main(["--backends", "numpy", "--images", "1"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "MISMATCHES FOUND" in out


def test_benchmark_roofline_smoke(capsys):
    from tpu_cnn.apps import benchmark

    res = benchmark.main(["--roofline", "--batch", "8", "--runs", "1"])
    txt = capsys.readouterr().out
    assert "ROOFLINE" in txt and "VMEM bytes moved" in txt
    assert res["roofline"]["bytes_per_img"] > 5e6  # ~10.6 MB/img model


def test_verify_cli_detects_mismatch(capsys, monkeypatch):
    """Corrupt one backend and confirm the verifier reports per-channel
    mismatches instead of a pass."""
    from tpu_cnn.apps import verify

    real = verify.build_backends

    def corrupted(kernels, shifts, names, img_size=128):
        b = real(kernels, shifts, names, img_size)
        orig = b["native"]

        def bad(imgs):
            out = orig(imgs).copy()
            out[0, 3, 7] ^= 0xFF
            return out

        b["native"] = bad
        return b

    monkeypatch.setattr(verify, "build_backends", corrupted)
    rc = verify.main(["--backends", "numpy,native", "--images", "1"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "MISMATCH" in out and "channels [3]" in out


def test_eval_detection(artifact_dir):
    """IoU harness: CAM boxes must beat the full-frame baseline and
    classification must beat chance on the retrained head."""
    from tpu_cnn.apps import dump_features, retrain_classifier
    from tpu_cnn.apps.eval_detection import evaluate, iou
    from tpu_cnn.models.cnn import FpgaCNN

    assert iou((0, 0, 10, 10), (0, 0, 10, 10)) == 1.0
    assert iou((0, 0, 10, 10), (20, 20, 30, 30)) == 0.0

    # quick head fit so the CAM has meaningful weights
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        npz = os.path.join(td, "f.npz")
        dump_features.main(["--artifacts", artifact_dir, "--image-dir",
                            artifact_dir, "--output", npz, "--mode", "cpu"])
        retrain_classifier.main(["--features", npz, "--output-dir", td,
                                 "--epochs", "200",
                                 "--classes", os.path.join(artifact_dir, "classes.json")])
        model = FpgaCNN(
            art.load_bundle(artifact_dir).kernels,
            np.load(os.path.join(td, "fc_weight.npy")),
            np.load(os.path.join(td, "fc_bias.npy")),
            CLASS_NAMES,
        )
    out = evaluate(model, mode="cpu", n_per_class=6, verbose=False)
    assert out["accuracy"] > 1 / 6
    assert 0.0 <= out["mean_iou"] <= 1.0


def test_tune_shifts_smoke(artifact_dir):
    from tpu_cnn.apps.tune_shifts import candidate_grid, tune
    from tpu_cnn.models.cnn import FpgaCNN

    assert len(candidate_grid((2, 4, 6), radius=1)) == 27
    assert candidate_grid((0, 4, 6), radius=1)[0][0] == 0  # lo clamp
    bundle = art.load_bundle(artifact_dir)
    model = FpgaCNN(bundle.kernels, bundle.fc_weight, bundle.fc_bias,
                    CLASS_NAMES)
    best, results = tune(model, mode="cpu", n_per_class=6, radius=0,
                         head_epochs=50, verbose=False)
    assert best == (2, 4, 6) and len(results) == 1
    # real-data mode: the artifact dir's own test_image_*_class*.bin files
    # are a valid BinFolder
    best2, results2 = tune(model, mode="cpu", n_per_class=4, radius=0,
                           head_epochs=50, verbose=False,
                           image_dir=artifact_dir)
    assert best2 == (2, 4, 6) and len(results2) == 1


def test_tune_shifts_save_respects_head_prefix(tmp_path, stock_kernels,
                                               capsys):
    """--save with --head-prefix writes <prefix>shifts.json (per-head
    scoping), leaving the default head's shifts untouched."""
    import json

    from tpu_cnn.apps import tune_shifts

    rs = np.random.RandomState(5)
    d = str(tmp_path / "bundle")
    bundle = art.ArtifactBundle(
        kernels=stock_kernels,
        fc_weight=rs.randn(6, 1024).astype(np.float32) * 0.05,
        fc_bias=np.zeros(6, np.float32),
        class_names=list(CLASS_NAMES),
    )
    art.save_bundle(d, bundle)
    art.save_bundle(d, bundle, prefix="alt_")
    tune_shifts.main([
        "--artifacts", d, "--mode", "cpu", "--radius", "0",
        "--n-per-class", "4", "--head-epochs", "50",
        "--head-prefix", "alt_", "--save",
    ])
    assert os.path.exists(os.path.join(d, "alt_shifts.json"))
    assert not os.path.exists(os.path.join(d, "shifts.json"))
    assert json.load(open(os.path.join(d, "alt_shifts.json"))) == [2, 4, 6]


def test_tune_restores_best_shifts(artifact_dir, monkeypatch):
    """After the sweep the engine/model sit at the BEST candidate, not the
    last one visited (a caller reusing the model would otherwise silently
    run at arbitrary shifts)."""
    import tpu_cnn.apps.tune_shifts as ts
    from tpu_cnn.models.cnn import FpgaCNN

    bundle = art.load_bundle(artifact_dir)
    model = FpgaCNN(bundle.kernels, bundle.fc_weight, bundle.fc_bias,
                    CLASS_NAMES)
    # fixed grid + scripted scores: the winner is deliberately NOT the last
    # candidate the sweep visits
    monkeypatch.setattr(ts, "candidate_grid",
                        lambda *a, **k: [(2, 4, 6), (3, 5, 7)])
    scores = {(2, 4, 6): 0.9, (3, 5, 7): 0.1}
    monkeypatch.setattr(
        ts, "score_shifts",
        lambda engine, imgs, labels, cand, **k: (
            engine.set_shifts(*cand) or (scores[cand], {"saturated": 0.0,
                                                        "dead": 0.0})
        ),
    )
    best, _ = ts.tune(model, mode="cpu", n_per_class=4, head_epochs=50,
                      verbose=False)
    assert best == (2, 4, 6)
    assert tuple(model.shifts.tolist()) == best


def test_bundle_persisted_shifts(tmp_path, stock_kernels):
    """shifts.json round-trips through save/load_bundle, load_model picks
    it up by default, and an explicit shifts argument still overrides."""
    import json

    from tpu_cnn.apps.common import load_model

    rs = np.random.RandomState(3)
    bundle = art.ArtifactBundle(
        kernels=stock_kernels,
        fc_weight=rs.randn(6, 1024).astype(np.float32) * 0.05,
        fc_bias=np.zeros(6, np.float32),
        class_names=list(CLASS_NAMES),
        shifts=[1, 5, 7],
    )
    art.save_bundle(tmp_path, bundle)
    with open(tmp_path / "shifts.json") as f:
        assert json.load(f) == [1, 5, 7]
    loaded = art.load_bundle(tmp_path)
    assert loaded.shifts == [1, 5, 7]

    m = load_model(str(tmp_path))
    assert list(m.shifts) == [1, 5, 7]
    m2 = load_model(str(tmp_path), shifts=[2, 4, 6])
    assert list(m2.shifts) == [2, 4, 6]
    # wrong-length shifts.json is ignored (variant mismatch safety)
    with open(tmp_path / "shifts.json", "w") as f:
        json.dump([1, 2], f)
    m3 = load_model(str(tmp_path))
    assert list(m3.shifts) == [2, 4, 6]


def test_image_decode_paths(tmp_path):
    """PIL decode branches: load_image_any on .png, serve.decode_image on
    encoded bytes, infer CLI on a non-.bin image."""
    from PIL import Image

    from tpu_cnn.apps.serve import decode_image
    from tpu_cnn.utils.artifacts import load_image_any

    rs = np.random.RandomState(0)
    arr = rs.randint(0, 256, (200, 300), dtype=np.uint8)
    png = str(tmp_path / "t.png")
    Image.fromarray(arr).save(png)

    flat = load_image_any(png)
    assert flat.shape == (128 * 128,) and flat.dtype == np.uint8

    with open(png, "rb") as f:
        body = f.read()
    img = decode_image(body)
    assert img.shape == (128, 128) and img.dtype == np.uint8

    raw = decode_image(arr[:128, :128].tobytes())
    np.testing.assert_array_equal(raw, arr[:128, :128])

    # encoded COLOR images go through the same cv2-exact preprocess twin as
    # the camera pipeline (not PIL's convert("L")+resize)
    from tpu_cnn.apps.realtime import preprocess as host_preprocess

    rgb = rs.randint(0, 256, (192, 256, 3), dtype=np.uint8)
    png_c = str(tmp_path / "c.png")
    Image.fromarray(rgb).save(png_c)
    with open(png_c, "rb") as f:
        got = decode_image(f.read())
    np.testing.assert_array_equal(got, host_preprocess(rgb[..., ::-1], 128))


def test_infer_cli_png(artifact_dir, tmp_path, capsys):
    from PIL import Image

    from tpu_cnn.apps import infer

    rs = np.random.RandomState(1)
    png = str(tmp_path / "photo.png")
    Image.fromarray(rs.randint(0, 256, (128, 128), dtype=np.uint8)).save(png)
    infer.main(["--artifacts", artifact_dir, "--image", png, "--mode", "cpu"])
    out = capsys.readouterr().out
    assert "Prediction:" in out
    assert os.path.exists(str(tmp_path / "photo_result.jpg"))


def test_camera_recovery_ladder(monkeypatch):
    """The stall watchdog escalates reopen -> free-device -> usb-reset and
    resets to healthy when frames return."""
    import sys
    import time as _time
    import types

    from tpu_cnn.apps import realtime

    state = {"opens": 0, "frames_after": 99999}

    class FakeCap:
        def __init__(self):
            state["opens"] += 1
            self._n = 0

        def isOpened(self):
            return True

        def set(self, *a):
            pass

        def read(self):
            self._n += 1
            if state["opens"] >= state["frames_after"]:
                return True, np.zeros((8, 8, 3), np.uint8)
            return False, None

        def release(self):
            pass

    fake_cv2 = types.SimpleNamespace(
        VideoCapture=lambda idx: FakeCap(),
        CAP_PROP_FRAME_WIDTH=3, CAP_PROP_FRAME_HEIGHT=4,
    )
    monkeypatch.setitem(sys.modules, "cv2", fake_cv2)

    rungs = []
    monkeypatch.setattr(realtime, "_free_video_device",
                        lambda idx: rungs.append("free") or True)
    monkeypatch.setattr(realtime, "_usb_reset_video_device",
                        lambda idx: rungs.append("usb") or False)

    cam = realtime.CameraThread(0, stall_timeout=0.05)
    try:
        deadline = _time.time() + 5.0
        while cam._stall_strikes < 3 and _time.time() < deadline:
            _time.sleep(0.02)
        assert cam._stall_strikes >= 3  # walked the whole ladder
        assert "free" in rungs and "usb" in rungs
        # frames come back -> healthy, strikes reset
        state["frames_after"] = 0
        deadline = _time.time() + 5.0
        while cam._stall_strikes != 0 and _time.time() < deadline:
            _time.sleep(0.02)
        assert cam._stall_strikes == 0
        assert cam.read() is not None
    finally:
        cam.release()


def test_train_bbox_cli(tmp_path, artifact_dir):
    """train_bbox fits + saves a usable regression head, and the bundle
    loader round-trips it."""
    import shutil

    from tpu_cnn.apps import train_bbox
    from tpu_cnn.utils import artifacts as art

    train_bbox.main([
        "--artifacts", artifact_dir, "--output-dir", str(tmp_path),
        "--mode", "cpu", "--n-per-class", "12",
    ])
    w = np.load(tmp_path / "bbox_weight.npy")
    assert w.shape == (1025, 4) and w.dtype == np.float32
    for f in ("weights.bin", "fc_weight.npy", "fc_bias.npy", "classes.json"):
        shutil.copy(os.path.join(artifact_dir, f), tmp_path / f)
    bundle = art.load_bundle(str(tmp_path))
    assert bundle.bbox_weight is not None and bundle.bbox_weight.shape == (1025, 4)


def test_doctor_cli(capsys):
    """apps.doctor: all checks pass on the healthy CPU harness (exit 0);
    a corrupted bundle flips it to exit 1 with the failure named."""
    from tpu_cnn.apps import doctor

    rc = doctor.main([])
    out = capsys.readouterr().out
    assert rc == 0
    assert "all checks passed" in out
    assert "host oracles" in out and "device dispatch" in out

    rc = doctor.main(["--host-only", "--artifacts", "/nonexistent-bundle"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "FAIL" in out and "device dispatch" not in out


# ── multi-object surface (beyond-reference) ──────────────────────────


def test_infer_cli_multi(artifact_dir, capsys, tmp_path):
    """--multi prints a detections list and writes a multi-box overlay."""
    import glob as _glob
    import shutil

    from tpu_cnn.apps import infer

    src = sorted(_glob.glob(os.path.join(artifact_dir, "test_image_*.bin")))[0]
    img = os.path.join(tmp_path, os.path.basename(src))
    shutil.copy(src, img)
    infer.main(["--artifacts", artifact_dir, "--mode", "cpu",
                "--image", img, "--multi", "--multi-thresh", "0.166"])
    out = capsys.readouterr().out
    assert "Detections (prob >= 17%):" in out
    result = img.replace(".bin", "_result.jpg")
    assert os.path.exists(result)


def test_infer_cli_multi_rejects_gap_head(artifact_dir, tmp_path, capsys):
    import numpy as _np

    from tpu_cnn.apps import infer

    d = str(tmp_path / "gapbundle")
    os.makedirs(d)
    for f in ("weights.bin", "fc_bias.npy", "classes.json"):
        import shutil

        shutil.copy(os.path.join(artifact_dir, f), os.path.join(d, f))
    _np.save(os.path.join(d, "fc_weight.npy"),
             _np.zeros((6, 64), _np.float32))
    with pytest.raises(SystemExit):
        infer.main(["--artifacts", d, "--mode", "cpu", "--multi"])


def test_realtime_multi_smoke(artifact_dir, capsys):
    """--multi runs in both protocols (host twin and fused device head),
    with and without --score-ema (the round-5 temporal smoothing lever —
    both emission branches must run)."""
    from tpu_cnn.apps import realtime

    for extra in ([], ["--score-ema", "0.3"],
                  ["--fused", "--mode", "xla"],
                  ["--fused", "--mode", "xla", "--score-ema", "0.3"]):
        realtime.main([
            "--artifacts", artifact_dir, "--mode", "cpu",
            "--source", "synthetic", "--frames", "3", "--no-serve",
            "--multi",
        ] + extra)
        out = capsys.readouterr().out
        assert "Done. 3 frames." in out


def test_composite_scenes_properties():
    """CompositeScenes: distinct classes per scene, near-disjoint analytic
    boxes, images contain both objects' bright pixels."""
    from tpu_cnn.apps.eval_detection import iou
    from tpu_cnn.train.data import CompositeScenes

    ds = CompositeScenes(n_scenes=12, seed=3)
    imgs, truths = ds.arrays()
    assert imgs.shape == (12, 128, 128) and imgs.dtype == np.float32
    total = 0
    for i, truth in enumerate(truths):
        classes = [c for c, _ in truth]
        assert len(set(classes)) == len(classes)
        total += len(truth)
        for (c1, b1), (c2, b2) in zip(truth, truth[1:]):
            assert iou(b1, b2) < 0.15
        for _, (x1, y1, x2, y2) in truth:
            assert 0 <= x1 <= x2 <= 127 and 0 <= y1 <= y2 <= 127
            # the object region must be brighter than the noise background
            assert imgs[i, y1:y2 + 1, x1:x2 + 1].max() > 0.4
    assert total >= 12 * 2 * 0.9, "rejection sampling dropped too many objects"


def test_eval_detection_multi(artifact_dir):
    """Multi-object eval: metrics well-formed, and at thresh <= 1/6 the
    multi detector's recall provably dominates the single-box ceiling
    (its detection set always contains the argmax class)."""
    from tpu_cnn.apps.eval_detection import evaluate_multi
    from tpu_cnn.models.cnn import FpgaCNN

    bundle = art.load_bundle(artifact_dir)
    model = FpgaCNN(bundle.kernels, bundle.fc_weight, bundle.fc_bias,
                    bundle.class_names)
    out = evaluate_multi(model, mode="xla", n_scenes=10, thresh=1 / 6,
                         verbose=False)
    assert out["objects"] >= 18
    assert 0.0 <= out["recall"] <= 1.0
    assert out["recall"] >= out["single_box_recall_ceiling"]
    assert 0.0 <= out["matched_iou"] <= 1.0
    assert out["overall_iou"] <= out["matched_iou"] + 1e-9


def test_benchmark_latency_mode(artifact_dir, capsys):
    """--latency: per-batch sync median/p99 beside the pipelined rate."""
    from tpu_cnn.apps import benchmark

    out = benchmark.main(["--artifacts", artifact_dir, "--latency",
                          "--latency-batches", "1,4", "--runs", "3",
                          "--modes", "xla"])
    rows = out["latency"]
    assert [r["batch"] for r in rows] == [1, 4]
    for r in rows:
        assert r["median_ms"] > 0 and r["p99_ms"] >= r["median_ms"]
        assert r["amortized_us_per_img"] > 0
    text = capsys.readouterr().out
    assert "LATENCY" in text and "sync med" in text


def test_benchmark_multi_mode(artifact_dir, capsys):
    """--multi times the multi-object pipeline (async dispatch path)."""
    from tpu_cnn.apps import benchmark

    out = benchmark.main(["--artifacts", artifact_dir, "--batch", "4",
                          "--runs", "2", "--modes", "xla", "--multi"])
    assert out and "xla" in out
    assert out["xla"] > 0


def test_calibrate_multi_cli_and_defaults(artifact_dir, capsys):
    """apps.calibrate_multi: sweeps per-class thresholds, --save persists
    multi_thresh.json, and load_model + the --multi surfaces pick it up
    as the default floor."""
    from tpu_cnn.apps import calibrate_multi, infer
    from tpu_cnn.apps.common import load_model

    try:
        thr, rep = calibrate_multi.main([
            "--artifacts", artifact_dir, "--mode", "xla",
            "--n-scenes", "12", "--save",
        ])
        out = capsys.readouterr().out
        assert "saved" in out and len(thr) == 6
        assert os.path.exists(os.path.join(artifact_dir, "multi_thresh.json"))
        # coordinate descent starts from the uniform floor, so calibrated
        # F1 on the CALIBRATION set can never be worse than uniform there
        assert rep["calibrated_cal"][2] >= rep["uniform_cal"][2] - 1e-9

        model = load_model(artifact_dir)
        assert (model.multi_thresh is not None
                and model.multi_thresh.shape == (6,))
        np.testing.assert_allclose(model.multi_thresh, thr, atol=1e-4)

        # infer --multi now defaults to the calibrated floors
        import glob as _glob

        img = sorted(_glob.glob(
            os.path.join(artifact_dir, "test_image_*.bin")))[0]
        infer.main(["--artifacts", artifact_dir, "--mode", "cpu",
                    "--image", img, "--multi", "--no-save"])
        out = capsys.readouterr().out
        assert "per-class calibrated floors" in out
        # an explicit scalar still overrides
        infer.main(["--artifacts", artifact_dir, "--mode", "cpu",
                    "--image", img, "--multi", "--multi-thresh", "0.2",
                    "--no-save"])
        assert "prob >= 20%" in capsys.readouterr().out
    finally:  # keep the module-scoped fixture pristine for later tests
        if os.path.exists(os.path.join(artifact_dir, "multi_thresh.json")):
            os.remove(os.path.join(artifact_dir, "multi_thresh.json"))


def test_eval_multi_uses_bundle_calibration(artifact_dir, capsys):
    import json as _json

    from tpu_cnn.apps import eval_detection

    try:
        with open(os.path.join(artifact_dir, "multi_thresh.json"), "w") as f:
            _json.dump([0.1, 0.2, 0.3, 0.1, 0.2, 0.3], f)
        eval_detection.main(["--artifacts", artifact_dir, "--mode", "xla",
                             "--multi", "--n-scenes", "6"])
        out = capsys.readouterr().out
        assert "per-class calibrated" in out
    finally:
        os.remove(os.path.join(artifact_dir, "multi_thresh.json"))


def test_calibrate_multi_head_prefix_scoped(artifact_dir, tmp_path):
    """--head-prefix writes <prefix>multi_thresh.json and only the
    prefixed head picks it up (same scoping rule as shifts.json)."""
    import shutil

    from tpu_cnn.apps import calibrate_multi
    from tpu_cnn.apps.common import load_model

    d = str(tmp_path / "prefbundle")
    shutil.copytree(artifact_dir, d)
    for f in ("fc_weight.npy", "fc_bias.npy"):
        shutil.copy(os.path.join(d, f), os.path.join(d, "alt_" + f))
    calibrate_multi.main(["--artifacts", d, "--mode", "xla",
                          "--n-scenes", "8", "--head-prefix", "alt_",
                          "--save"])
    assert os.path.exists(os.path.join(d, "alt_multi_thresh.json"))
    assert not os.path.exists(os.path.join(d, "multi_thresh.json"))
    assert load_model(d).multi_thresh is None
    assert load_model(d, "lyr3-std", "alt_").multi_thresh is not None


def test_default_artifacts_variant_aware(monkeypatch):
    """--variant lyr4-wide CLIs resolve artifacts/pretrained-lyr4 without
    an explicit --artifacts; unknown families fall back to the flagship
    bundle; TPU_CNN_ARTIFACTS still wins."""
    from tpu_cnn.utils import paths

    monkeypatch.delenv("TPU_CNN_ARTIFACTS", raising=False)
    flag = paths.default_artifacts()
    assert flag == paths.default_artifacts("lyr3-std")
    lyr4 = paths.default_artifacts("lyr4-wide")
    assert lyr4.endswith("pretrained-lyr4") and os.path.exists(
        os.path.join(lyr4, "weights.bin"))
    assert paths.default_artifacts("lyr2-small").endswith("pretrained-lyr2")
    # a family with no shipped bundle falls back
    assert paths.default_artifacts("nosuch-family") == flag
    monkeypatch.setenv("TPU_CNN_ARTIFACTS", "/tmp/elsewhere")
    assert paths.default_artifacts("lyr4-wide") == "/tmp/elsewhere"
