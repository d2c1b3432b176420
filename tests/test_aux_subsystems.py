"""Auxiliary subsystem tests: failure detection (timeout guard, watchdog),
metrics sinks, profiling timers (SURVEY.md §5 coverage)."""

import json
import time

import numpy as np
import pytest

from tpu_cnn.utils.failguard import DeviceTimeout, Watchdog, block_with_timeout
from tpu_cnn.utils.metrics import JsonlMetrics, accuracy_report, feature_stats
from tpu_cnn.utils.profiling import EmaFps, StageTimer


def test_block_with_timeout_passthrough():
    import jax.numpy as jnp

    x = jnp.arange(8)
    out = block_with_timeout(x, timeout_s=10.0)
    assert np.asarray(out).tolist() == list(range(8))


def test_block_with_timeout_raises():
    class Stuck:
        def block_until_ready(self):
            time.sleep(5.0)

    # jax.block_until_ready on a non-array passes it through instantly, so
    # simulate with an object exposing the blocking protocol via a thread.
    import jax

    orig = jax.block_until_ready
    try:
        jax.block_until_ready = lambda v: time.sleep(5.0)
        with pytest.raises(DeviceTimeout) as ei:
            block_with_timeout(object(), timeout_s=0.2, diagnostics=lambda: "layer=1")
        assert "layer=1" in str(ei.value)
    finally:
        jax.block_until_ready = orig


def test_watchdog_fires_and_stops():
    fired = []
    wd = Watchdog(stall_s=0.1, on_stall=lambda: fired.append(1))
    wd.kick()
    time.sleep(0.3)
    assert fired, "watchdog should fire after stall"
    wd.stop()
    n = len(fired)
    wd.kick()  # no-op after stop
    time.sleep(0.2)
    assert len(fired) == n


def test_watchdog_kick_defers():
    fired = []
    wd = Watchdog(stall_s=0.25, on_stall=lambda: fired.append(1))
    for _ in range(4):
        wd.kick()
        time.sleep(0.1)  # keep kicking before the stall window closes
    assert not fired
    wd.stop()


def test_jsonl_metrics(tmp_path):
    path = str(tmp_path / "m" / "metrics.jsonl")
    m = JsonlMetrics(path)
    m.log("fps", 123.4, mode="xla")
    m.log("conv_ms", 0.5)
    recs = [json.loads(l) for l in open(path)]
    assert recs[0]["metric"] == "fps" and recs[0]["mode"] == "xla"
    assert len(recs) == 2
    JsonlMetrics(None).log("noop", 1)  # disabled sink must be a no-op


def test_feature_stats():
    feats = np.zeros((4, 64, 256), np.uint8)
    feats[:, 3] = 200
    s = feature_stats(feats)
    assert s["active_channels"] == 1 and s["max"] == 200


def test_accuracy_report():
    labels = np.array([0, 0, 1, 1, 2, 2])
    preds = np.array([0, 1, 1, 1, 2, 0])
    r = accuracy_report(preds, labels, ["a", "b", "c"])
    assert abs(r["accuracy"] - 4 / 6) < 1e-9
    assert r["per_class"]["b"] == 1.0
    assert np.asarray(r["confusion"]).sum() == 6


def test_stage_timer_and_ema():
    st = StageTimer()
    with st.stage("x"):
        time.sleep(0.01)
    assert st.mean_ms("x") >= 5
    assert "x:" in st.report()
    ema = EmaFps()
    ema.tick()
    time.sleep(0.01)
    assert ema.tick() > 0


def test_engine_timeout_plumbed(stock_kernels):
    from tpu_cnn.engine.tpu import TPUEngine
    from tpu_cnn.models.cnn import CLASS_NAMES, FpgaCNN

    rs = np.random.RandomState(0)
    m = FpgaCNN(stock_kernels, rs.randn(6, 1024).astype(np.float32),
                np.zeros(6, np.float32), CLASS_NAMES)
    eng = TPUEngine(m, backend="xla", timeout_s=30.0)
    feat, *_ = eng.run(np.zeros((128, 128), np.uint8))
    assert feat.shape == (64, 256)
