"""C++ native oracle parity: the compiled path must agree bit-for-bit with
the numpy oracle and the XLA paths (the reference's RTL-vs-C-vs-numpy
cross-implementation idiom, SURVEY.md §4.4)."""

import numpy as np
import pytest

from tpu_cnn.engine.cpu_ref import CPURefEngine, numpy_cnn_forward
from tpu_cnn.models.cnn import DEFAULT_SHIFTS
from tests.conftest import random_kernels


@pytest.fixture(scope="module")
def oracle():
    from tpu_cnn.native.oracle import NativeOracle

    return NativeOracle()


def test_native_vs_numpy_random(oracle, rng):
    kernels = random_kernels(rng)
    imgs = rng.randint(0, 256, size=(4, 128, 128)).astype(np.uint8)
    got = oracle.infer_batch(imgs, kernels, DEFAULT_SHIFTS)
    for b in range(4):
        np.testing.assert_array_equal(got[b], numpy_cnn_forward(imgs[b], kernels))


def test_native_vs_numpy_stock(oracle, stock_kernels, ramp_image):
    got = oracle.infer(ramp_image, stock_kernels, DEFAULT_SHIFTS)
    np.testing.assert_array_equal(got, numpy_cnn_forward(ramp_image, stock_kernels))


def test_native_edge_images(oracle, stock_kernels):
    """All-zero and all-255 stimuli exercise padding + saturation corners."""
    for img in [
        np.zeros((128, 128), np.uint8),
        np.full((128, 128), 255, np.uint8),
    ]:
        got = oracle.infer(img, stock_kernels, DEFAULT_SHIFTS)
        np.testing.assert_array_equal(got, numpy_cnn_forward(img, stock_kernels))


def test_cpu_engine_uses_native(stock_kernels, ramp_image):
    eng = CPURefEngine(stock_kernels)
    assert eng.backend == "native-c++"
    feat, conv_ms, read_ms = eng.run(ramp_image)
    assert feat.shape == (64, 256)
    np.testing.assert_array_equal(feat, numpy_cnn_forward(ramp_image, stock_kernels))


def test_native_shift_variation(oracle, stock_kernels, ramp_image):
    a = oracle.infer(ramp_image, stock_kernels, (2, 4, 6))
    b = oracle.infer(ramp_image, stock_kernels, (1, 3, 5))
    assert not np.array_equal(a, b)
    np.testing.assert_array_equal(
        b, numpy_cnn_forward(ramp_image, stock_kernels, shifts=(1, 3, 5))
    )


# ── native batched preprocess parity ─────────────────────────────────


def _jit_preprocess(frames, out_size, order="bgr"):
    import jax.numpy as jnp

    from tpu_cnn.ops.preprocess import preprocess_frames

    return np.asarray(
        preprocess_frames(jnp.asarray(frames), out_size, channel_order=order)
    )


def test_native_preprocess_color_divisible(rng):
    """(B, 480, 640, 3) BGR -> 128²: crop + BT.601 + exact area mean must be
    bit-identical to the on-device jit twin AND the realtime numpy twin."""
    from tpu_cnn.apps.realtime import preprocess as np_preprocess
    from tpu_cnn.native.preprocess import preprocess_frames_native

    frames = rng.randint(0, 256, size=(3, 256, 320, 3)).astype(np.uint8)
    got = preprocess_frames_native(frames, 128)
    np.testing.assert_array_equal(got, _jit_preprocess(frames, 128))
    for b in range(len(frames)):
        np.testing.assert_array_equal(got[b], np_preprocess(frames[b], 128))


def test_native_preprocess_rgb_order(rng):
    from tpu_cnn.native.preprocess import preprocess_frames_native

    frames = rng.randint(0, 256, size=(2, 256, 256, 3)).astype(np.uint8)
    got = preprocess_frames_native(frames, 128, channel_order="rgb")
    np.testing.assert_array_equal(got, _jit_preprocess(frames, 128, "rgb"))
    assert not np.array_equal(got, preprocess_frames_native(frames, 128))


def test_native_preprocess_gray_and_nondivisible(rng):
    from tpu_cnn.native.preprocess import preprocess_frames_native

    gray = rng.randint(0, 256, size=(2, 200, 300)).astype(np.uint8)  # 200 % 128 != 0
    got = preprocess_frames_native(gray, 128)
    np.testing.assert_array_equal(got, _jit_preprocess(gray, 128))


def test_native_preprocess_single_frame(rng):
    """Single color / single gray frames squeeze back to (out, out)."""
    from tpu_cnn.apps.realtime import preprocess as np_preprocess
    from tpu_cnn.native.preprocess import preprocess_frames_native

    color = rng.randint(0, 256, size=(480, 640, 3)).astype(np.uint8)
    got = preprocess_frames_native(color, 128)
    assert got.shape == (128, 128)
    np.testing.assert_array_equal(got, np_preprocess(color, 128))
    gray = rng.randint(0, 256, size=(256, 256)).astype(np.uint8)
    np.testing.assert_array_equal(
        preprocess_frames_native(gray, 128), np_preprocess(gray, 128)
    )


def test_native_preprocess_tall_frame(rng):
    """Portrait frames crop vertically (h > w)."""
    from tpu_cnn.apps.realtime import preprocess as np_preprocess
    from tpu_cnn.native.preprocess import preprocess_frames_native

    tall = rng.randint(0, 256, size=(640, 256, 3)).astype(np.uint8)
    np.testing.assert_array_equal(
        preprocess_frames_native(tall, 128), np_preprocess(tall, 128)
    )


def test_native_preprocess_upsample(rng):
    """Crops SMALLER than out_size upsample via the nearest-index path,
    matching the numpy twin — a camera delivering frames below the model
    input size (e.g. 320x240 into a 256^2 variant) must not error."""
    from tpu_cnn.apps.realtime import preprocess as np_preprocess
    from tpu_cnn.native.preprocess import preprocess_frames_native

    small = rng.randint(0, 256, size=(3, 240, 320, 3)).astype(np.uint8)
    got = preprocess_frames_native(small, 256)
    assert got.shape == (3, 256, 256)
    for b in range(3):
        np.testing.assert_array_equal(got[b], np_preprocess(small[b], 256))


# ── native frame ring (frame_ring.cpp) ───────────────────────────────


def test_frame_ring_push_pop_parity(rng):
    """Frames pushed raw come out preprocessed, oldest-first, bit-identical
    to the batched native preprocess (and so to the numpy/device twins)."""
    from tpu_cnn.native.preprocess import preprocess_frames_native
    from tpu_cnn.native.ring import NativeFrameRing

    frames = rng.randint(0, 256, size=(5, 480, 640, 3)).astype(np.uint8)
    ring = NativeFrameRing(capacity=8, out_size=128)
    try:
        seqs = [ring.push(f) for f in frames]
        assert seqs == [1, 2, 3, 4, 5]
        got = ring.pop_batch(8)
        assert got.shape == (5, 128, 128)
        np.testing.assert_array_equal(got, preprocess_frames_native(frames, 128))
        assert ring.pop_batch(4).shape == (0, 128, 128)
        assert ring.dropped == 0
    finally:
        ring.close()


def test_frame_ring_overflow_drops_oldest(rng):
    """Latest-wins overflow: a full ring drops the OLDEST unconsumed frame
    (the reference's single-slot holder semantics, with depth)."""
    from tpu_cnn.native.preprocess import preprocess_frames_native
    from tpu_cnn.native.ring import NativeFrameRing

    frames = rng.randint(0, 256, size=(6, 64, 64)).astype(np.uint8)
    ring = NativeFrameRing(capacity=4, out_size=32)
    try:
        for f in frames:
            ring.push(f)
        assert ring.dropped == 2
        got = ring.pop_batch(10)
        want = preprocess_frames_native(frames[2:], 32)  # 2 oldest dropped
        np.testing.assert_array_equal(got, want)
    finally:
        ring.close()


def test_frame_ring_threaded_producers_and_wait(rng):
    """Multiple producer threads push concurrently (preprocess runs off the
    GIL); the consumer's blocking wait sees the frames; nothing is lost
    below capacity pressure (accounting: popped + dropped == pushed)."""
    import threading

    from tpu_cnn.native.ring import NativeFrameRing

    ring = NativeFrameRing(capacity=256, out_size=32)
    frames = rng.randint(0, 256, size=(4, 25, 96, 96, 3)).astype(np.uint8)
    try:
        threads = [
            threading.Thread(target=lambda fs=fs: [ring.push(f) for f in fs])
            for fs in frames
        ]
        for t in threads:
            t.start()
        assert ring.wait(min_frames=1, timeout_s=5.0) >= 1
        for t in threads:
            t.join()
        assert ring.wait(min_frames=100, timeout_s=5.0) == 100
        total = 0
        while True:
            got = ring.pop_batch(16)
            if not len(got):
                break
            total += len(got)
        assert total + ring.dropped == 100
        age0 = ring.age_s()
        assert 0.0 <= age0 < 60.0
    finally:
        ring.close()
