"""Serving layer + device preprocessing + checkpoint/resume tests."""

import json
import os
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from tpu_cnn.models.cnn import CLASS_NAMES
from tpu_cnn.utils import artifacts as art


@pytest.fixture(scope="module")
def artifact_dir(tmp_path_factory, stock_kernels):
    d = tmp_path_factory.mktemp("srv_bundle")
    rs = np.random.RandomState(3)
    art.save_bundle(d, art.ArtifactBundle(
        kernels=stock_kernels,
        fc_weight=rs.randn(6, 1024).astype(np.float32) * 0.05,
        fc_bias=np.zeros(6, np.float32),
        class_names=list(CLASS_NAMES),
    ))
    return str(d)


def test_device_preprocess_matches_host():
    from tpu_cnn.apps.realtime import preprocess as host_pre
    from tpu_cnn.ops.preprocess import preprocess_frames

    rs = np.random.RandomState(0)
    frames = rs.randint(0, 256, size=(3, 512, 640, 3)).astype(np.uint8)
    dev = np.asarray(preprocess_frames(frames))
    assert dev.shape == (3, 128, 128) and dev.dtype == np.uint8
    # host path uses float means; integer area mean must agree within 1 LSB
    for b in range(3):
        host = host_pre(frames[b])
        assert np.abs(dev[b].astype(int) - host.astype(int)).max() <= 1


def test_device_preprocess_packed_bgrx():
    """The 4-channel BGRX fast path (u8x4 -> u32 bitcast demux) is
    bit-identical to the 3-channel path with the pad byte ignored, for both
    channel orders and both resize paths (divisible 512^2, nearest 480^2)."""
    from tpu_cnn.ops.luma import pack_bgrx
    from tpu_cnn.ops.preprocess import preprocess_frames

    rs = np.random.RandomState(2)
    for h, w in ((512, 640), (480, 640)):
        f3 = rs.randint(0, 256, size=(3, h, w, 3)).astype(np.uint8)
        pad = rs.randint(0, 256, size=(3, h, w, 1)).astype(np.uint8)
        f4 = np.concatenate([f3, pad], axis=-1)
        w32 = pack_bgrx(f4)
        assert w32.shape == (3, h, w) and w32.dtype == np.uint32
        np.testing.assert_array_equal(w32, pack_bgrx(f3) | (f4[..., 3].astype(np.uint32) << 24))
        for order in ("bgr", "rgb"):
            ref = np.asarray(preprocess_frames(f3, 128, channel_order=order))
            np.testing.assert_array_equal(
                np.asarray(preprocess_frames(f4, 128, channel_order=order)), ref
            )
            np.testing.assert_array_equal(
                np.asarray(preprocess_frames(w32, 128, channel_order=order)), ref
            )


def test_device_preprocess_nearest_geometry_sweep():
    """The nearest-resize path is bit-identical to the host twin across
    camera geometries exercising both gate branches (see ops/preprocess):
    phase-sliced (240^2 q=8, 288^2 q=4), dense for lane-aligned pitch
    (480x640), for q>8 (200^2 q=16), and for nearly-coprime sizes
    (131^2, 127^2)."""
    from tpu_cnn.apps.realtime import preprocess as host_pre
    from tpu_cnn.ops.luma import pack_bgrx
    from tpu_cnn.ops.preprocess import preprocess_frames

    rs = np.random.RandomState(7)
    for h, w in ((480, 640), (240, 320), (288, 352), (200, 300),
                 (131, 177), (127, 127)):
        f3 = rs.randint(0, 256, size=(2, h, w, 3)).astype(np.uint8)
        ref = np.stack([host_pre(f3[b], 128) for b in range(2)])
        np.testing.assert_array_equal(
            np.asarray(preprocess_frames(f3, 128)), ref, err_msg=f"{h}x{w}"
        )
        f4 = np.concatenate([f3, np.zeros_like(f3[..., :1])], axis=-1)
        np.testing.assert_array_equal(
            np.asarray(preprocess_frames(pack_bgrx(f4), 128)), ref,
            err_msg=f"{h}x{w} packed",
        )
        g2 = rs.randint(0, 256, size=(2, h, w)).astype(np.uint8)
        refg = np.stack([host_pre(g2[b], 128) for b in range(2)])
        np.testing.assert_array_equal(
            np.asarray(preprocess_frames(g2, 128)), refg,
            err_msg=f"{h}x{w} gray",
        )


def test_device_preprocess_padded_pitch():
    """valid_w: frames staged at a wider row pitch (V4L2 bytesperline, or
    deliberate pad-width staging to dodge the lane-aligned slow path) give
    bit-identical results to the unpadded frame; pad bytes are never read."""
    from tpu_cnn.apps.realtime import preprocess as host_pre
    from tpu_cnn.ops.luma import pack_bgrx
    from tpu_cnn.ops.preprocess import preprocess_frames

    rs = np.random.RandomState(11)
    for h, w, pitch in ((480, 640, 656), (240, 320, 336), (96, 128, 144)):
        f4 = rs.randint(0, 256, size=(2, h, w, 4)).astype(np.uint8)
        ref = np.stack([host_pre(f4[b, :, :, :3], 128) for b in range(2)])
        packed = pack_bgrx(f4)
        staged = np.full((2, h, pitch), 0xDEADBEEF, np.uint32)
        staged[:, :, :w] = packed
        np.testing.assert_array_equal(
            np.asarray(preprocess_frames(staged, 128, valid_w=w)), ref,
            err_msg=f"{h}x{w}@{pitch}",
        )
        # valid_w == full pitch is the default path
        np.testing.assert_array_equal(
            np.asarray(preprocess_frames(packed, 128, valid_w=w)), ref
        )
    with pytest.raises(ValueError):
        preprocess_frames(np.zeros((1, 8, 8), np.uint32), 4, valid_w=9)


def test_device_preprocess_grayscale_passthrough():
    from tpu_cnn.ops.preprocess import preprocess_frames

    x = np.random.RandomState(1).randint(0, 256, (2, 128, 128)).astype(np.uint8)
    out = np.asarray(preprocess_frames(x))
    np.testing.assert_array_equal(out, x)


def test_dynamic_batcher_coalesces(artifact_dir):
    from tpu_cnn.apps.serve import build_service

    batcher, backend = build_service(artifact_dir, mode="cpu",
                                     max_batch=8, max_wait_ms=30.0)
    rs = np.random.RandomState(0)
    imgs = [rs.randint(0, 256, (128, 128)).astype(np.uint8) for _ in range(12)]
    results = [None] * 12

    def call(i):
        results[i] = batcher.submit(imgs[i])

    threads = [threading.Thread(target=call, args=(i,)) for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert all(r is not None and "pred" in r for r in results)
    assert batcher.stats["requests"] == 12
    assert batcher.stats["batches"] < 12, "requests must coalesce into batches"
    batcher.stop()


def test_http_service_end_to_end(artifact_dir):
    from tpu_cnn.apps.serve import build_service, make_handler

    batcher, backend = build_service(artifact_dir, mode="cpu",
                                     max_batch=4, max_wait_ms=5.0)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(batcher, backend))
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        body = np.random.RandomState(0).randint(0, 256, 128 * 128).astype(np.uint8).tobytes()
        req = urllib.request.Request(f"http://127.0.0.1:{port}/detect",
                                     data=body, method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert out["name"] in CLASS_NAMES and len(out["bbox"]) == 4
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
            assert json.loads(r.read())["ok"]
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats", timeout=10) as r:
            assert json.loads(r.read())["requests"] >= 1
    finally:
        srv.shutdown()
        batcher.stop()


def test_http_service_rejects_oversized_body(artifact_dir):
    """Bodies above MAX_BODY_BYTES are refused with 413 before being read
    (memory-exhaustion hardening)."""
    import http.client

    from tpu_cnn.apps.serve import MAX_BODY_BYTES, build_service, make_handler

    batcher, backend = build_service(artifact_dir, mode="cpu",
                                     max_batch=2, max_wait_ms=1.0)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(batcher, backend))
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.putrequest("POST", "/detect")
        conn.putheader("Content-Length", str(MAX_BODY_BYTES + 1))
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 413
        assert "too large" in json.loads(resp.read())["error"]
        conn.close()
    finally:
        srv.shutdown()
        batcher.stop()


def test_http_service_sheds_overload_with_503(artifact_dir):
    """Graceful overload (round-4 verdict item 5): when the batcher's
    bounded admission queue is full, the front answers a clean 503 with a
    Retry-After hint — never a dropped/reset connection. The reference
    signals the same condition at the protocol level (tready = !busy,
    ``rtl/axi_wrapper/lyr3_cnn_axi_slave_lite_v1_0_S00_AXI.v:390``)."""
    import http.client
    import time

    from tpu_cnn.apps.serve import (DynamicBatcher, Overloaded,
                                    ServiceHTTPServer, make_handler)
    from tpu_cnn.engine.tpu import DetectResult

    class _SlowEngine:
        backend = "slow"

        def detect_batch(self, images):
            time.sleep(0.25)  # keep the worker busy so the queue fills
            n = len(images)
            return DetectResult(
                np.zeros(n, np.int32), np.ones(n, np.float32),
                np.full((n, 6), 1 / 6, np.float32),
                np.zeros((n, 4), np.int32))

    batcher = DynamicBatcher(_SlowEngine(), list(CLASS_NAMES), max_batch=1,
                             max_wait_ms=1.0, max_queue=2)
    srv = ServiceHTTPServer(("127.0.0.1", 0),
                            make_handler(batcher, "slow"))
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    body = np.random.RandomState(0).randint(
        0, 256, 128 * 128).astype(np.uint8).tobytes()
    statuses, retry_after, conn_errors = [], [], []

    def call():
        try:
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
            c.request("POST", "/detect", body=body)
            r = c.getresponse()
            payload = json.loads(r.read())
            statuses.append(r.status)
            if r.status == 503:
                retry_after.append(r.getheader("Retry-After"))
                assert payload["error"] == "overloaded"
            c.close()
        except Exception as e:  # pragma: no cover - the failure under test
            conn_errors.append(e)

    try:
        threads = [threading.Thread(target=call) for _ in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not conn_errors, f"connections dropped: {conn_errors}"
        assert len(statuses) == 12
        assert set(statuses) <= {200, 503}
        assert 200 in statuses and 503 in statuses
        assert all(ra and int(ra) >= 1 for ra in retry_after)
        assert batcher.snapshot()["shed"] == statuses.count(503)
        # the direct API raises a typed error carrying the hint: stop the
        # worker, fill the queue, and submit once more
        from tpu_cnn.apps.serve import _Pending

        batcher.stop()
        time.sleep(0.8)  # the worker finishes its in-flight batch and exits
        while True:
            try:
                batcher.q.put_nowait(_Pending(np.zeros((128, 128), np.uint8)))
            except Exception:
                break
        with pytest.raises(Overloaded) as ei:
            batcher.submit(np.zeros((128, 128), np.uint8), timeout_s=0.1)
        assert ei.value.retry_after_s >= 1
    finally:
        srv.shutdown()
        batcher.stop()


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import optax

    from tpu_cnn.train import checkpoint as ckpt
    from tpu_cnn.train.train_cnn import TrainConfig, init_params

    cfg = TrainConfig(layer_configs=((1, 16, 16),))
    params = init_params(cfg, jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    state = opt.init(params)
    path = str(tmp_path / "ck.npz")
    ckpt.save_checkpoint(path, params, state, epoch=7, best_acc=0.5,
                         best_params=params)
    p2, s2, epoch, best, bp = ckpt.load_checkpoint(path, params, state)
    assert epoch == 7 and best == 0.5
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_resume(tmp_path):
    """Interrupted training must resume from the checkpoint epoch."""
    from tpu_cnn.train import data as D
    from tpu_cnn.train.train_cnn import TrainConfig, train

    ds = D.SyntheticShapes(n_per_class=8, img_size=32)
    imgs, labels = ds.arrays()
    cfg = TrainConfig(layer_configs=((1, 16, 16), (16, 32, 8)),
                      epochs=2, batch_size=16, head_epochs=10)
    ck = str(tmp_path / "ck.npz")
    out = str(tmp_path / "out")
    train(cfg, (imgs[12:], labels[12:]), (imgs[:12], labels[:12]), out,
          verbose=False, checkpoint_path=ck)
    assert os.path.exists(ck)
    # resume with more epochs: starts at 3, not 1
    cfg2 = TrainConfig(layer_configs=cfg.layer_configs, epochs=3,
                       batch_size=16, head_epochs=10)
    train(cfg2, (imgs[12:], labels[12:]), (imgs[:12], labels[:12]), out,
          verbose=False, checkpoint_path=ck, resume=True)
    from tpu_cnn.train.checkpoint import load_checkpoint
    import jax
    import optax

    from tpu_cnn.train.train_cnn import init_params

    params = init_params(cfg2, jax.random.PRNGKey(0))
    state = optax.adam(1e-3).init(params)
    # meta epoch advanced to 3
    import numpy as _np

    data = _np.load(ck)
    meta = json.loads(bytes(data["__meta"]).decode())
    assert meta["epoch"] == 3


def test_async_pipelined_batcher(artifact_dir, stock_kernels):
    """With a TPUEngine (async-capable), the batcher pipelines batches
    through dispatch + collector threads; results stay correct and complete
    under concurrent load, and agree with the host head."""
    from tpu_cnn.apps.serve import DynamicBatcher
    from tpu_cnn.engine.tpu import TPUEngine
    from tpu_cnn.head.classify import classify_np
    from tpu_cnn.models.cnn import FpgaCNN

    bundle = art.load_bundle(artifact_dir)
    model = FpgaCNN(bundle.kernels, bundle.fc_weight, bundle.fc_bias,
                    bundle.class_names)
    engine = TPUEngine(model, backend="xla")
    assert hasattr(engine, "detect_batch_async")
    batcher = DynamicBatcher(engine, model.class_names, max_batch=4,
                             max_wait_ms=10.0)
    rs = np.random.RandomState(0)
    imgs = [rs.randint(0, 256, (128, 128)).astype(np.uint8) for _ in range(10)]
    results = [None] * 10

    def call(i):
        results[i] = batcher.submit(imgs[i], timeout_s=120)

    ts = [threading.Thread(target=call, args=(i,)) for i in range(10)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=180)
    assert all(r is not None and "pred" in r for r in results), results
    # spot-check one against the host head
    feats = engine.run_batch(np.stack(imgs[:1]))
    idx, conf, probs = classify_np(feats, model.fc_weight, model.fc_bias)
    assert results[0]["pred"] == int(idx[0])
    batcher.stop()


def test_native_front_end_service(artifact_dir):
    """C++ HTTP front end (native/http_front.cpp) end-to-end over real
    sockets: concurrent raw-frame POSTs are ticketed, batched through ONE
    engine call, and answered per-ticket with the same JSON schema as the
    Python service; healthz reports; wrong-size bodies get 400/413."""
    import http.client
    import json as _json
    import threading

    from tpu_cnn.apps.common import load_model
    from tpu_cnn.apps.infer import make_engine
    from tpu_cnn.apps.serve import _HostDetectAdapter
    from tpu_cnn.apps.serve_native import NativeFrontEnd

    model = load_model(artifact_dir)
    engine = _HostDetectAdapter(make_engine(model, "cpu"), model)
    front = NativeFrontEnd("127.0.0.1", 0, model.config.img_size, max_batch=8)
    assert front.port > 0
    stop = threading.Event()

    def worker():
        while not stop.is_set():
            front.serve_once(engine.detect_batch, model.class_names,
                             timeout_s=0.05)

    wt = threading.Thread(target=worker)
    wt.start()
    try:
        rs = np.random.RandomState(0)
        imgs = rs.randint(0, 256, (4, 128, 128)).astype(np.uint8)
        results = [None] * 4

        def post(i):
            c = http.client.HTTPConnection("127.0.0.1", front.port, timeout=15)
            c.request("POST", "/detect", body=imgs[i].tobytes())
            r = c.getresponse()
            results[i] = (r.status, _json.loads(r.read()))
            c.close()

        threads = [threading.Thread(target=post, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        want = engine.detect_batch(imgs)
        for i, (status, body) in enumerate(results):
            assert status == 200
            assert body["pred"] == int(want.pred[i])
            assert body["name"] == model.class_names[int(want.pred[i])]
            assert body["bbox"] == [int(v) for v in want.bbox[i]]
        assert front.served >= 4

        # healthz + malformed bodies (C++ side, no engine involvement)
        c = http.client.HTTPConnection("127.0.0.1", front.port, timeout=10)
        c.request("GET", "/healthz")
        r = c.getresponse()
        assert r.status == 200 and _json.loads(r.read())["status"] == "ok"
        c.close()
        for body, want_status in ((b"tiny", 400), (b"x" * 50000, 413)):
            c = http.client.HTTPConnection("127.0.0.1", front.port, timeout=10)
            c.request("POST", "/detect", body=body)
            assert c.getresponse().status == want_status
            c.close()
    finally:
        stop.set()
        wt.join()
        front.stop()


def test_native_front_end_queue_pushback(artifact_dir):
    """Bounded-queue push-back: with the engine worker stalled, posts
    beyond queue capacity get an immediate 503; once the worker drains,
    queued requests still complete with 200."""
    import http.client
    import json as _json
    import threading

    from tpu_cnn.apps.common import load_model
    from tpu_cnn.apps.infer import make_engine
    from tpu_cnn.apps.serve import _HostDetectAdapter
    from tpu_cnn.apps.serve_native import NativeFrontEnd

    model = load_model(artifact_dir)
    engine = _HostDetectAdapter(make_engine(model, "cpu"), model)
    front = NativeFrontEnd("127.0.0.1", 0, model.config.img_size, max_batch=2)
    cap = 4 * 2  # queue_cap
    n_posts = cap + 4
    statuses = [None] * n_posts
    rs = np.random.RandomState(1)
    body = rs.randint(0, 256, (128, 128)).astype(np.uint8).tobytes()

    def post(i):
        c = http.client.HTTPConnection("127.0.0.1", front.port, timeout=30)
        c.request("POST", "/detect", body=body)
        statuses[i] = c.getresponse().status
        c.close()

    threads = [threading.Thread(target=post, args=(i,)) for i in range(n_posts)]
    try:
        for t in threads:
            t.start()
        # overflow posts 503 while NO worker runs; give them a beat to land
        import time as _time

        deadline = _time.time() + 10
        while _time.time() < deadline:
            if sum(1 for s in statuses if s == 503) >= n_posts - cap:
                break
            _time.sleep(0.05)
        # now drain: every queued request completes
        for _ in range(cap):
            front.serve_once(engine.detect_batch, model.class_names,
                             timeout_s=0.5)
        for t in threads:
            t.join()
        assert statuses.count(503) == n_posts - cap, statuses
        assert statuses.count(200) == cap, statuses
    finally:
        front.stop()


def test_native_front_end_malformed_inputs(artifact_dir):
    """Parser robustness: garbage bytes, incomplete heads, oversized
    headers, and abrupt disconnects must not wedge or crash the C++
    server — a well-formed request afterwards still succeeds."""
    import http.client
    import socket
    import threading

    from tpu_cnn.apps.common import load_model
    from tpu_cnn.apps.infer import make_engine
    from tpu_cnn.apps.serve import _HostDetectAdapter
    from tpu_cnn.apps.serve_native import NativeFrontEnd

    model = load_model(artifact_dir)
    engine = _HostDetectAdapter(make_engine(model, "cpu"), model)
    front = NativeFrontEnd("127.0.0.1", 0, model.config.img_size, max_batch=4)
    stop = threading.Event()

    def worker():
        while not stop.is_set():
            front.serve_once(engine.detect_batch, model.class_names,
                             timeout_s=0.05)

    wt = threading.Thread(target=worker)
    wt.start()
    try:
        attacks = [
            b"\x00\xff\x17garbage\r\n\r\n",              # binary junk
            b"GET /healthz HTTP/1.1\r\n",                 # incomplete head
            b"POST /detect HTTP/1.1\r\nX-Pad: " + b"A" * 20000,  # huge header
            b"POST /detect HTTP/1.1\r\nContent-Length: 16384\r\n\r\nshort",
        ]
        for payload in attacks:
            s = socket.create_connection(("127.0.0.1", front.port), timeout=5)
            try:
                s.sendall(payload)
                s.settimeout(2.0)
                try:
                    s.recv(4096)  # answer, close, or reset are all fine
                except (socket.timeout, OSError):
                    pass
            finally:
                s.close()
        # abrupt disconnect mid-body
        s = socket.create_connection(("127.0.0.1", front.port), timeout=5)
        s.sendall(b"POST /detect HTTP/1.1\r\nContent-Length: 16384\r\n\r\n")
        s.close()

        # the server must still answer a well-formed request
        rs = np.random.RandomState(2)
        c = http.client.HTTPConnection("127.0.0.1", front.port, timeout=15)
        c.request("POST", "/detect",
                  body=rs.randint(0, 256, (128, 128)).astype(np.uint8).tobytes())
        assert c.getresponse().status == 200
        c.close()
    finally:
        stop.set()
        wt.join()
        front.stop()


def test_sharded_checkpoint_roundtrip(tmp_path):
    """Orbax sharded checkpoints (`checkpoint_sharded.py`): ZeRO-1-sharded
    optimizer state round-trips per-shard with its sharding intact (no host
    gather), retention keeps only the last 2 epochs, and metadata
    (epoch/best_acc) restores."""
    import jax
    import jax.numpy as jnp
    import optax

    from tpu_cnn.parallel.mesh import make_mesh
    from tpu_cnn.train.checkpoint_sharded import ShardedCheckpointer
    from tpu_cnn.train import data as D
    from tpu_cnn.train.train_cnn import TrainConfig, init_params, make_train_step

    cfg = TrainConfig(layer_configs=((1, 16, 16), (16, 32, 8)), batch_size=16)
    params = init_params(cfg, jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    mesh = make_mesh(8, model_axis=1)
    step = make_train_step(cfg, opt, mesh, zero1=True)
    ds = D.SyntheticShapes(n_per_class=8, img_size=16)
    imgs, labels = ds.arrays()
    bi = jnp.asarray(imgs[:16])
    bl = jnp.asarray(labels[:16].astype(np.int32))
    params, state, _, _ = step(params, opt.init(params), bi, bl)
    assert not state[0].mu["conv0"].sharding.is_fully_replicated

    path = str(tmp_path / "ckdir")
    with ShardedCheckpointer(path) as ck:
        for epoch in (1, 2, 3):
            ck.save(epoch, params, state, 0.25 * epoch, params)
        p2, s2, epoch, best, bp = ck.restore(params, state)
        assert epoch == 3 and best == pytest.approx(0.75)
        assert ck.latest() == 3
        # retention: only the last 2 epochs remain on disk
        assert ck._mgr.all_steps() == [2, 3]
    mu2 = s2[0].mu["conv0"]
    assert not mu2.sharding.is_fully_replicated  # restored SHARDED
    np.testing.assert_array_equal(
        np.asarray(mu2), np.asarray(state[0].mu["conv0"])
    )
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_resume_sharded(tmp_path):
    """The trainer auto-selects the orbax dir format for non-.npz
    --checkpoint paths and resumes from it (with --mesh --zero1 state)."""
    from tpu_cnn.parallel.mesh import make_mesh
    from tpu_cnn.train import data as D
    from tpu_cnn.train.train_cnn import TrainConfig, train

    ds = D.SyntheticShapes(n_per_class=8, img_size=32)
    imgs, labels = ds.arrays()
    cfg = TrainConfig(layer_configs=((1, 16, 16), (16, 32, 8)),
                      epochs=2, batch_size=16, head_epochs=10)
    ck = str(tmp_path / "ckdir")
    out = str(tmp_path / "out")
    mesh = make_mesh(8, model_axis=1)
    train(cfg, (imgs[12:], labels[12:]), (imgs[:12], labels[:12]), out,
          verbose=False, checkpoint_path=ck, mesh=mesh, zero1=True)
    assert os.path.isdir(ck)
    cfg2 = TrainConfig(layer_configs=cfg.layer_configs, epochs=3,
                       batch_size=16, head_epochs=10)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        train(cfg2, (imgs[12:], labels[12:]), (imgs[:12], labels[:12]), out,
              verbose=True, checkpoint_path=ck, resume=True, mesh=mesh,
              zero1=True)
    assert "Resumed from" in buf.getvalue()
    assert "(sharded) at epoch 2" in buf.getvalue()


def test_serve_multi_mode_cpu_adapter(artifact_dir):
    """--multi on the CPU-oracle adapter: responses carry a 'detections'
    list (per-class CAM boxes above the threshold) that matches the host
    twin, and the argmax entry leads."""
    from tpu_cnn.apps.serve import build_service
    from tpu_cnn.head import cam as cam_host
    from tpu_cnn.head.classify import classify_np

    batcher, backend = build_service(artifact_dir, mode="cpu", max_batch=4,
                                     max_wait_ms=5.0, multi=True,
                                     multi_thresh=1 / 6)
    bundle = art.load_bundle(artifact_dir)
    img = np.random.RandomState(5).randint(0, 256, (128, 128)).astype(np.uint8)
    res = batcher.submit(img)
    assert "detections" in res and res["detections"]
    assert res["detections"][0]["pred"] == res["pred"]
    # host-twin cross-check of the boxes
    from tpu_cnn.engine.cpu_ref import numpy_cnn_forward

    feats = numpy_cnn_forward(img, bundle.kernels)
    idx, _, probs = classify_np(feats[None], bundle.fc_weight, bundle.fc_bias)
    boxes = cam_host.cam_bbox_multi(feats, bundle.fc_weight)
    for d in res["detections"]:
        assert probs[0, d["pred"]] >= 1 / 6
        np.testing.assert_array_equal(np.asarray(d["bbox"]), boxes[d["pred"]])
    # the compatibility bbox is the argmax class's CAM box
    np.testing.assert_array_equal(np.asarray(res["bbox"]), boxes[int(idx[0])])
    batcher.stop()


def test_serve_multi_http_with_per_request_thresh(artifact_dir):
    """HTTP surface: /detect?thresh= overrides the server default per
    request; higher thresholds yield fewer detections."""
    from tpu_cnn.apps.serve import build_service, make_handler

    batcher, backend = build_service(artifact_dir, mode="cpu", max_batch=4,
                                     max_wait_ms=5.0, multi=True,
                                     multi_thresh=0.0)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(batcher, backend))
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        body = np.random.RandomState(0).randint(
            0, 256, 128 * 128).astype(np.uint8).tobytes()

        def post(path):
            req = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                         data=body, method="POST")
            with urllib.request.urlopen(req, timeout=60) as r:
                return json.loads(r.read())

        all_dets = post("/detect")  # server default 0.0 -> every class
        assert len(all_dets["detections"]) == 6
        some = post("/detect?thresh=0.166")
        assert 1 <= len(some["detections"]) <= 6
        none = post("/detect?thresh=0.999")
        assert none["detections"] == []
        assert none["pred"] == all_dets["pred"]  # argmax fields unaffected
        # out-of-range and NaN thresholds are rejected, not silently empty
        for bad in ("1.1", "nan", "-0.1", "x"):
            try:
                post(f"/detect?thresh={bad}")
                raise AssertionError(f"thresh={bad} should 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        srv.shutdown()
        batcher.stop()


def test_serve_multi_async_engine(artifact_dir):
    """--multi rides the async dispatch pipeline on a TPUEngine."""
    from tpu_cnn.apps.serve import DynamicBatcher
    from tpu_cnn.engine.tpu import TPUEngine
    from tpu_cnn.models.cnn import FpgaCNN

    bundle = art.load_bundle(artifact_dir)
    model = FpgaCNN(bundle.kernels, bundle.fc_weight, bundle.fc_bias,
                    bundle.class_names)
    engine = TPUEngine(model, backend="xla")
    batcher = DynamicBatcher(engine, model.class_names, max_batch=4,
                             max_wait_ms=10.0, multi=True)
    rs = np.random.RandomState(1)
    imgs = [rs.randint(0, 256, (128, 128)).astype(np.uint8) for _ in range(6)]
    results = [None] * 6

    def call(i):
        results[i] = batcher.submit(imgs[i], timeout_s=120)

    ts = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=180)
    assert all(r is not None and "detections" in r for r in results), results
    want = engine.detect_multi_batch(np.stack(imgs))
    for i, r in enumerate(results):
        assert r["pred"] == int(want.pred[i])
        np.testing.assert_array_equal(np.asarray(r["bbox"]),
                                      want.boxes[i, want.pred[i]])
    batcher.stop()


def test_serve_multi_rejects_unsupported_engine(artifact_dir):
    """--multi with an engine lacking detect_multi_batch fails fast."""
    from tpu_cnn.apps.serve import DynamicBatcher

    class NoMulti:
        def detect_batch(self, images):
            raise AssertionError("unused")

    with pytest.raises(ValueError, match="multi"):
        DynamicBatcher(NoMulti(), list(CLASS_NAMES), multi=True)


def test_serve_thresh_rejected_on_non_multi_server(artifact_dir):
    """thresh= on a single-box server is a loud 400, not a silent no-op."""
    import urllib.error

    from tpu_cnn.apps.serve import build_service, make_handler

    batcher, backend = build_service(artifact_dir, mode="cpu", max_batch=2,
                                     max_wait_ms=1.0)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(batcher, backend))
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        body = np.zeros(128 * 128, np.uint8).tobytes()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect?thresh=0.3",
            data=body, method="POST")
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError("should 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400 and "multi" in e.read().decode()
    finally:
        srv.shutdown()
        batcher.stop()


def test_batcher_engine_without_detect_batch_fails_per_request(artifact_dir):
    """An engine lacking detect_batch must fail each request with a JSON
    error — not kill the worker thread silently."""
    from tpu_cnn.apps.serve import DynamicBatcher

    class NoDetect:
        pass

    batcher = DynamicBatcher(NoDetect(), list(CLASS_NAMES), max_batch=2,
                             max_wait_ms=1.0)
    res = batcher.submit(np.zeros((128, 128), np.uint8), timeout_s=30)
    assert "error" in res and "detect_batch" in res["error"]
    # the worker survives: a second request gets the same loud answer
    res2 = batcher.submit(np.zeros((128, 128), np.uint8), timeout_s=30)
    assert "error" in res2
    batcher.stop()


def test_native_front_end_multi(artifact_dir):
    """--multi on the C++ front end: responses carry the detections list
    (server-level threshold) consistent with the host twin."""
    import http.client
    import json as _json

    from tpu_cnn.apps.common import load_model
    from tpu_cnn.apps.infer import make_engine
    from tpu_cnn.apps.serve import _HostDetectAdapter
    from tpu_cnn.apps.serve_native import NativeFrontEnd
    from tpu_cnn.engine.tpu import detections_above

    model = load_model(artifact_dir)
    engine = _HostDetectAdapter(make_engine(model, "cpu"), model)
    front = NativeFrontEnd("127.0.0.1", 0, model.config.img_size, max_batch=4)
    stop = threading.Event()

    def worker():
        while not stop.is_set():
            front.serve_once(engine.detect_multi_batch, model.class_names,
                             timeout_s=0.05, multi_thresh=1 / 6)

    wt = threading.Thread(target=worker)
    wt.start()
    try:
        img = np.random.RandomState(7).randint(
            0, 256, (128, 128)).astype(np.uint8)
        c = http.client.HTTPConnection("127.0.0.1", front.port, timeout=30)
        c.request("POST", "/detect", body=img.tobytes())
        r = c.getresponse()
        assert r.status == 200
        body = _json.loads(r.read())
        c.close()
        assert body["detections"]
        want = engine.detect_multi_batch(img[None])
        dets = detections_above(want.probs[0], want.boxes[0], 1 / 6)
        assert [d["pred"] for d in body["detections"]] == [k for k, _, _ in dets]
        assert body["detections"][0]["bbox"] == list(dets[0][2])
        assert body["bbox"] == [int(v) for v in want.boxes[0, want.pred[0]]]
    finally:
        stop.set()
        wt.join(timeout=10)
        front.stop()


def test_serve_defaults_to_bundle_multi_thresh(artifact_dir):
    """A bundle with multi_thresh.json makes --multi serving default to
    the per-class floors (no flag needed)."""
    import json as _json

    from tpu_cnn.apps.serve import build_service

    # floors that drop exactly the classes below them
    thr = [0.99, 0.0, 0.99, 0.0, 0.99, 0.0]
    with open(os.path.join(artifact_dir, "multi_thresh.json"), "w") as f:
        _json.dump(thr, f)
    try:
        batcher, _ = build_service(artifact_dir, mode="cpu", max_batch=2,
                                   max_wait_ms=2.0, multi=True)
        res = batcher.submit(np.random.RandomState(0).randint(
            0, 256, (128, 128)).astype(np.uint8))
        # classes 1/3/5 have floor 0 -> always in; 0/2/4 need prob>=0.99
        preds = {d["pred"] for d in res["detections"]}
        assert {1, 3, 5} <= preds
        for d in res["detections"]:
            if d["pred"] in (0, 2, 4):
                assert d["conf"] >= 0.99
        batcher.stop()
    finally:
        os.remove(os.path.join(artifact_dir, "multi_thresh.json"))
