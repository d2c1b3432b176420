"""Fixed-point contract tests: XLA paths vs the numpy oracle, plus the
controlled-stimulus checks carried over from the reference testbenches
(identity kernel / ramp image, ``sim/top/tb.v:114-122,478-530``)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_cnn.engine.cpu_ref import numpy_cnn_forward, numpy_conv_layer
from tpu_cnn.models.cnn import DEFAULT_SHIFTS, LAYER_CONFIGS
from tpu_cnn.ops import quant
from tests.conftest import random_kernels

SMALL_CONFIGS = ((1, 16, 16), (16, 32, 8))  # parameterised-shrunk geometry


# ── Controlled stimuli (testbench idiom) ────────────────────────────


def test_identity_kernel_passthrough(ramp_image):
    """Identity kernel + shift 0: conv output equals the input pixel; after
    clip/pool the layer is a pure 2x2 maxpool (CP1 analogue, tb.v:133-177)."""
    k = np.zeros((16, 1, 3, 3), dtype=np.int8)
    k[0, 0, 1, 1] = 1  # identity on channel 0, zero elsewhere
    out = numpy_conv_layer(ramp_image[None], k, shift=0)
    expected = ramp_image.reshape(64, 2, 64, 2).max(axis=(1, 3))
    np.testing.assert_array_equal(out[0], expected)
    assert (out[1:] == 0).all()


def test_negative_saturation_and_clamp():
    """ReLU vector coverage (relu_tb.v analogue): negative -> 0, > 255 -> 255."""
    k = np.zeros((16, 1, 3, 3), dtype=np.int8)
    k[0, 0, 1, 1] = -1  # all outputs negative -> 0
    k[1, 0, 1, 1] = 127  # large positive -> saturates at 255 for x >= 3
    x = np.full((1, 8, 8), 200, dtype=np.uint8)
    out = numpy_conv_layer(x, k, shift=0)
    assert (out[0] == 0).all()
    assert (out[1] == 255).all()


def test_arithmetic_shift_floor_semantics():
    """Negative accumulators must floor-shift (still negative) then clamp to 0,
    and positive ones floor-divide: contract of arm_cnn.c:127-135."""
    conv = np.array([[-7, -1, 7, 1023]], dtype=np.int32)
    shifted = np.clip(conv >> 2, 0, 255)
    assert shifted.tolist() == [[0, 0, 1, 255]]
    # jnp path agrees for both int32 and f32 compute dtypes
    j_int = quant.shift_relu_clamp(jnp.asarray(conv), jnp.int32(2))
    j_f32 = quant.shift_relu_clamp(jnp.asarray(conv, jnp.float32), jnp.int32(2))
    np.testing.assert_array_equal(np.asarray(j_int), shifted)
    np.testing.assert_array_equal(np.asarray(j_f32).astype(np.int32), shifted)


def test_accum_wrap_semantics():
    m = 1 << 23
    vals = jnp.array([m - 1, m, -m, -m - 1, 5], dtype=jnp.int32)
    wrapped = np.asarray(quant.wrap_accum(vals))
    assert wrapped.tolist() == [m - 1, -m, -m, m - 1, 5]


# ── Cross-implementation parity ─────────────────────────────────────


@pytest.mark.parametrize("compute_dtype", ["int32", "float32"])
def test_single_layer_parity_vs_oracle(rng, compute_dtype):
    for ic, oc, size in SMALL_CONFIGS:
        x = rng.randint(0, 256, size=(3, size, size, ic)).astype(np.uint8)
        k = rng.randint(-127, 128, size=(oc, ic, 3, 3)).astype(np.int8)
        got = quant.fixed_point_conv_layer(
            jnp.asarray(x), jnp.asarray(k), jnp.int32(2), compute_dtype=compute_dtype
        )
        for b in range(3):
            want = numpy_conv_layer(x[b].transpose(2, 0, 1), k, shift=2)
            np.testing.assert_array_equal(
                np.asarray(got[b]).transpose(2, 0, 1), want
            )


@pytest.mark.parametrize("compute_dtype", ["int32", "float32"])
def test_full_forward_parity_random(rng, compute_dtype):
    kernels = random_kernels(rng)
    imgs = rng.randint(0, 256, size=(2, 128, 128)).astype(np.uint8)
    shifts = jnp.asarray(DEFAULT_SHIFTS, jnp.int32)
    got = np.asarray(
        quant.cnn_forward(
            jnp.asarray(imgs),
            [jnp.asarray(k) for k in kernels],
            shifts,
            compute_dtype=compute_dtype,
        )
    )
    for b in range(2):
        want = numpy_cnn_forward(imgs[b], kernels)
        np.testing.assert_array_equal(got[b], want)


def test_full_forward_parity_stock_weights(stock_kernels, ramp_image):
    """Production weights + deterministic ramp image: XLA f32 == oracle."""
    got = np.asarray(
        quant.cnn_forward(
            jnp.asarray(ramp_image[None]),
            [jnp.asarray(k) for k in stock_kernels],
            jnp.asarray(DEFAULT_SHIFTS, jnp.int32),
        )
    )[0]
    want = numpy_cnn_forward(ramp_image, stock_kernels)
    np.testing.assert_array_equal(got, want)
    assert got.shape == (64, 256)
    assert got.max() > 0  # non-degenerate


def test_wrap_equivalence_on_reachable_range(rng):
    """For random uint8 inputs the 24-bit wrap is a no-op (SURVEY.md §0.3)."""
    kernels = random_kernels(rng)
    img = rng.randint(0, 256, size=(128, 128)).astype(np.uint8)
    a = numpy_cnn_forward(img, kernels, accum_wrap=False)
    b = numpy_cnn_forward(img, kernels, accum_wrap=True)
    np.testing.assert_array_equal(a, b)


def test_f32_exactness_bound_stock(stock_kernels):
    """Certify the f32-exactness invariant for the shipped weights: the max
    reachable |accumulator| must stay below 2^24 (and in fact below 2^23, so
    the QAT wrap is also a no-op)."""
    bound = quant.theoretical_accum_bound(stock_kernels)
    assert bound < 2**24, bound
    assert bound < 2**23, bound


def test_shift_is_runtime_arg(rng):
    """Changing shifts must not retrigger compilation (register semantics)."""
    kernels = [jnp.asarray(k) for k in random_kernels(rng)]
    img = jnp.asarray(rng.randint(0, 256, size=(1, 128, 128)).astype(np.uint8))
    f = quant.cnn_forward
    out1 = f(img, kernels, jnp.asarray([2, 4, 6], jnp.int32))
    n_compiles = f._cache_size()
    out2 = f(img, kernels, jnp.asarray([1, 3, 5], jnp.int32))
    assert f._cache_size() == n_compiles
    assert not np.array_equal(np.asarray(out1), np.asarray(out2))


def test_chunked_forward_matches(rng):
    """Large-batch lax.map chunking must be output-identical to the plain
    forward (bounded-memory path used by bench/serving)."""
    kernels = [jnp.asarray(k) for k in random_kernels(rng)]
    imgs = rng.randint(0, 256, size=(8, 128, 128)).astype(np.uint8)
    shifts = jnp.asarray(DEFAULT_SHIFTS, jnp.int32)
    plain = np.asarray(quant.cnn_forward(jnp.asarray(imgs), kernels, shifts))
    chunked = np.asarray(
        quant.cnn_forward_chunked(jnp.asarray(imgs), kernels, shifts, chunk=4)
    )
    np.testing.assert_array_equal(plain, chunked)


def test_bf16_compute_parity(rng, stock_kernels, ramp_image):
    """bf16 MXU inputs with f32 accumulation are exact for this contract
    (activations <= 255 and weights <= 127 fit bf16's significand). Verified
    bit-exact on TPU hardware 2026-08-16; asserted here on CPU."""
    got = np.asarray(
        quant.cnn_forward(
            jnp.asarray(ramp_image[None]),
            [jnp.asarray(k) for k in stock_kernels],
            jnp.asarray(DEFAULT_SHIFTS, jnp.int32),
            compute_dtype="bfloat16",
        )
    )[0]
    np.testing.assert_array_equal(got, numpy_cnn_forward(ramp_image, stock_kernels))
