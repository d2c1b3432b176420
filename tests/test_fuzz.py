"""Property fuzzing: random geometries, seeds, and shifts across every
host/device implementation pair — the widest net for contract drift."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_cnn.engine.cpu_ref import numpy_cnn_forward, numpy_conv_layer
from tpu_cnn.ops import quant
from tpu_cnn.utils import weights as wc


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_layer_geometries(seed):
    rs = np.random.RandomState(seed)
    ic = int(rs.choice([1, 3, 8, 16, 32]))
    oc = int(rs.choice([16, 32, 48, 64]))
    size = int(rs.choice([8, 16, 32]))
    shift = int(rs.randint(0, 12))
    x = rs.randint(0, 256, size=(2, size, size, ic)).astype(np.uint8)
    k = rs.randint(-127, 128, size=(oc, ic, 3, 3)).astype(np.int8)
    got = np.asarray(
        quant.fixed_point_conv_layer(jnp.asarray(x), jnp.asarray(k), jnp.int32(shift))
    )
    for b in range(2):
        want = numpy_conv_layer(x[b].transpose(2, 0, 1), k, shift)
        np.testing.assert_array_equal(got[b].transpose(2, 0, 1), want)


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_full_net_vs_native(seed):
    from tpu_cnn.native.oracle import NativeOracle

    rs = np.random.RandomState(100 + seed)
    # random 2-4 layer ladder with 16-multiple output channels
    n_layers = int(rs.randint(2, 5))
    size = 16 * (2 ** (n_layers - 1))
    ic = 1
    cfgs = []
    for _ in range(n_layers):
        oc = 16 * int(rs.randint(1, 5))
        cfgs.append((ic, oc, size))
        ic, size = oc, size // 2
    kernels = [
        rs.randint(-127, 128, size=(oc, icc, 3, 3)).astype(np.int8)
        for icc, oc, _ in cfgs
    ]
    shifts = [int(rs.randint(0, 10)) for _ in cfgs]
    img = rs.randint(0, 256, size=(cfgs[0][2], cfgs[0][2])).astype(np.uint8)

    a = numpy_cnn_forward(img, kernels, shifts=shifts)
    b = NativeOracle().infer(img, kernels, shifts)
    np.testing.assert_array_equal(a, b)
    c = np.asarray(
        quant.cnn_forward(
            jnp.asarray(img[None]),
            [jnp.asarray(k) for k in kernels],
            jnp.asarray(shifts, jnp.int32),
        )
    )[0]
    np.testing.assert_array_equal(a, c)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_weights_codec(seed):
    rs = np.random.RandomState(200 + seed)
    n_layers = int(rs.randint(1, 5))
    cfgs, ic = [], int(rs.choice([1, 4, 16]))
    for _ in range(n_layers):
        oc = 16 * int(rs.randint(1, 9))
        cfgs.append((ic, oc, 0))
        ic = oc
    kernels = [
        rs.randint(-128, 128, size=(oc, icc, 3, 3)).astype(np.int8)
        for icc, oc, _ in cfgs
    ]
    blob = wc.encode_weights(kernels)
    back = wc.decode_weights(np.frombuffer(blob, np.int8), cfgs)
    for a, b in zip(kernels, back):
        np.testing.assert_array_equal(a, b)


def test_fuzz_extreme_shifts(stock_kernels, ramp_image):
    """Shift 0 (max saturation) and shift 20 (all zeros) corner cases."""
    hot = numpy_cnn_forward(ramp_image, stock_kernels, shifts=(0, 0, 0))
    cold = numpy_cnn_forward(ramp_image, stock_kernels, shifts=(20, 20, 20))
    assert (cold == 0).all()
    got_hot = np.asarray(
        quant.cnn_forward(
            jnp.asarray(ramp_image[None]),
            [jnp.asarray(k) for k in stock_kernels],
            jnp.asarray([0, 0, 0], jnp.int32),
        )
    )[0]
    np.testing.assert_array_equal(got_hot, hot)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_preprocess_resolutions(seed):
    """Device preprocess vs the host numpy twin across random camera
    resolutions — divisible (area) path, nearest path, and upsampling —
    for all three ingest layouts (3-ch u8, 4-ch u8, packed u32)."""
    from tpu_cnn.apps.realtime import preprocess as np_pp
    from tpu_cnn.ops.luma import pack_bgrx
    from tpu_cnn.ops.preprocess import preprocess_frames

    rs = np.random.RandomState(400 + seed)
    h = int(rs.randint(60, 700))
    w = int(rs.randint(60, 700))
    f3 = rs.randint(0, 256, size=(2, h, w, 3)).astype(np.uint8)
    got = np.asarray(preprocess_frames(jnp.asarray(f3), 128))

    s = min(h, w)
    tol = 0 if s % 128 else 1  # area path: exact ints; twin uses float mean
    for b in range(2):
        want = np_pp(f3[b], 128)
        assert np.abs(got[b].astype(int) - want.astype(int)).max() <= tol

    # packed/4-channel layouts agree bit-exactly with the 3-channel path
    pad = rs.randint(0, 256, size=(2, h, w, 1)).astype(np.uint8)
    f4 = np.concatenate([f3, pad], axis=-1)
    np.testing.assert_array_equal(
        np.asarray(preprocess_frames(jnp.asarray(f4), 128)), got
    )
    np.testing.assert_array_equal(
        np.asarray(preprocess_frames(jnp.asarray(pack_bgrx(f4)), 128)), got
    )

    # a random padded row pitch (valid_w) never changes the result and
    # never reads the pad words
    pitch = w + int(rs.randint(1, 40))
    staged = np.full((2, h, pitch), 0xA5A5A5A5, np.uint32)
    staged[:, :, :w] = pack_bgrx(f4)
    np.testing.assert_array_equal(
        np.asarray(preprocess_frames(jnp.asarray(staged), 128, valid_w=w)),
        got,
    )


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_mega_plan_random_geometries(seed):
    """cnn_forward_mega across random layer ladders: whatever plan
    polyphase_plan picks (whole-net kernel, smaller batch tile, or a
    head-layers + tail-megakernel chain), the result must stay bit-exact
    vs the numpy oracle in interpret mode."""
    from tpu_cnn.ops import pallas_poly

    rs = np.random.RandomState(400 + seed)
    n_layers = int(rs.randint(2, 5))
    # t = size / 2^L must be >= 2; keep sizes small for interpret speed
    t = int(rs.choice([4, 8, 16]))
    size = t * (2 ** n_layers)
    cfgs, ic = [], 1
    for _ in range(n_layers):
        oc = int(rs.choice([16, 32, 48]))
        cfgs.append((ic, oc, size))
        ic, size = oc, size // 2
    plan = pallas_poly.polyphase_plan(tuple(cfgs), with_bins=False)
    assert plan is not None, f"no plan for {cfgs}"
    kernels = [
        rs.randint(-127, 128, size=(oc, icc, 3, 3)).astype(np.int8)
        for icc, oc, _ in cfgs
    ]
    shifts = [int(rs.randint(0, 9)) for _ in range(n_layers)]
    s0 = cfgs[0][2]
    imgs = rs.randint(0, 256, size=(2, s0, s0)).astype(np.uint8)
    got = np.asarray(pallas_poly.cnn_forward_mega(
        jnp.asarray(imgs), [jnp.asarray(k) for k in kernels],
        jnp.asarray(shifts, jnp.int32), interpret=True,
    ))
    for b in range(2):
        np.testing.assert_array_equal(
            got[b], numpy_cnn_forward(imgs[b], kernels, shifts)
        )


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_pipeline_and_spatial_random_geometries(seed):
    """The pipe and space axes across random layer ladders: any valid stage
    count / mesh width must stay bit-exact vs the oracle forward."""
    from tpu_cnn.ops import quant
    from tpu_cnn.parallel.pipeline import make_pipeline_mesh, pipelined_forward
    from tpu_cnn.parallel.spatial import (
        check_spatial_split,
        make_spatial_mesh,
        spatial_forward,
    )

    rs = np.random.RandomState(700 + seed)
    n_layers = int(rs.randint(2, 5))
    t = int(rs.choice([4, 8]))
    size = t * (2 ** n_layers)
    cfgs, ic = [], 1
    for _ in range(n_layers):
        oc = int(rs.choice([8, 16, 32]))
        cfgs.append((ic, oc, size))
        ic, size = oc, size // 2
    kernels = [
        rs.randint(-127, 128, size=(oc, icc, 3, 3)).astype(np.int8)
        for icc, oc, _ in cfgs
    ]
    shifts = jnp.asarray([int(rs.randint(0, 9)) for _ in range(n_layers)], jnp.int32)
    s0 = cfgs[0][2]
    imgs = rs.randint(0, 256, size=(4, s0, s0)).astype(np.uint8)
    ref = np.asarray(
        quant.cnn_forward(jnp.asarray(imgs), [jnp.asarray(k) for k in kernels], shifts)
    )

    n_stages = int(rs.randint(1, n_layers + 1))
    f_pp = pipelined_forward(make_pipeline_mesh(n_stages), kernels, microbatch=2)
    np.testing.assert_array_equal(np.asarray(f_pp(jnp.asarray(imgs), shifts)), ref)

    widths = [d for d in (2, 4, 8) if (s0 >> (n_layers - 1)) % (2 * d) == 0]
    if widths:
        n_space = int(rs.choice(widths))
        check_spatial_split(s0, n_layers, n_space)
        f_sp = spatial_forward(make_spatial_mesh(n_space), kernels)
        np.testing.assert_array_equal(
            np.asarray(f_sp(jnp.asarray(imgs), shifts)), ref
        )


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_parallel_training_random_geometries(seed):
    """The pp/sp TRAINING twins across random layer ladders: gradients
    through the GPipe schedule (any stage count, with and without remat)
    and through the halo exchange must match the plain float gradient at
    f32 ulp."""
    import jax
    import optax

    from tpu_cnn.parallel.pipeline import make_pipeline_mesh
    from tpu_cnn.parallel.pipeline_train import pipelined_float_logits
    from tpu_cnn.parallel.spatial_train import spatial_float_logits
    from tpu_cnn.parallel.spatial import make_spatial_mesh
    from tpu_cnn.train.train_cnn import TrainConfig, init_params, float_forward

    rs = np.random.RandomState(900 + seed)
    n_layers = int(rs.randint(2, 5))
    t = int(rs.choice([4, 8]))
    size = t * (2 ** n_layers)
    cfgs, ic = [], 1
    for _ in range(n_layers):
        oc = int(rs.choice([8, 16, 32]))
        cfgs.append((ic, oc, size))
        ic, size = oc, size // 2
    cfg = TrainConfig(layer_configs=tuple(cfgs))
    params = init_params(cfg, jax.random.PRNGKey(seed))
    s0 = cfgs[0][2]
    imgs = jnp.asarray(rs.rand(8, s0, s0).astype(np.float32))
    labels = jnp.asarray(rs.randint(0, cfg.num_classes, 8).astype(np.int32))

    def ce(logits):
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()

    g_ref = jax.grad(lambda p: ce(float_forward(p, imgs, n_layers)))(params)
    scale = {k: max(float(np.abs(g_ref[k]).max()), 1e-3) for k in g_ref}

    n_stages = int(rs.randint(1, n_layers + 1))
    remat = bool(rs.randint(0, 2))
    f_pp = pipelined_float_logits(
        make_pipeline_mesh(n_stages), cfgs, microbatch=4, remat=remat
    )
    g_pp = jax.grad(lambda p: ce(f_pp(p, imgs)))(params)
    for k in g_ref:
        np.testing.assert_allclose(
            np.asarray(g_pp[k]), np.asarray(g_ref[k]),
            rtol=0, atol=1e-5 * scale[k],
            err_msg=f"pp grad {k} (stages={n_stages}, remat={remat})",
        )

    widths = [d for d in (2, 4, 8) if (s0 >> (n_layers - 1)) % (2 * d) == 0]
    if widths:
        n_space = int(rs.choice(widths))
        f_sp = spatial_float_logits(make_spatial_mesh(n_space), cfgs)
        g_sp = jax.grad(lambda p: ce(f_sp(p, imgs)))(params)
        for k in g_ref:
            np.testing.assert_allclose(
                np.asarray(g_sp[k]), np.asarray(g_ref[k]),
                rtol=0, atol=1e-5 * scale[k],
                err_msg=f"sp grad {k} (shards={n_space})",
            )


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_multi_head_random_models(seed):
    """Multi-object head across random weights/heads/variants: device
    per-class boxes must equal the host twin per class, and the argmax
    row must equal the single-box path — for every registry geometry the
    backend supports."""
    from tpu_cnn.engine.tpu import TPUEngine
    from tpu_cnn.head import cam as host_cam
    from tpu_cnn.models.cnn import CLASS_NAMES, FpgaCNN
    from tpu_cnn.models.registry import REGISTRY, default_shifts

    rs = np.random.RandomState(900 + seed)
    name = list(REGISTRY)[seed % len(REGISTRY)]
    cfg = REGISTRY[name]
    kernels = [
        rs.randint(-127, 128, size=(oc, ic, 3, 3)).astype(np.int8)
        for ic, oc, _ in cfg.layer_configs
    ]
    feat_dim = cfg.layer_configs[-1][1] * 16
    fc_w = rs.randn(6, feat_dim).astype(np.float32) * 0.1
    fc_b = rs.randn(6).astype(np.float32) * 0.01
    model = FpgaCNN(kernels, fc_w, fc_b, CLASS_NAMES, config=cfg,
                    shifts=default_shifts(cfg))
    s = cfg.img_size
    imgs = rs.randint(0, 256, (3, s, s)).astype(np.uint8)

    box_mode = ["ref", "centroid"][seed % 2]
    eng = TPUEngine(model, backend="xla", box_mode=box_mode)
    res = eng.detect_multi_batch(imgs)
    single = eng.detect_batch(imgs)
    feats = eng.run_batch(imgs)
    tol = 1 if box_mode == "centroid" else 0
    for b in range(len(imgs)):
        want = host_cam.cam_bbox_multi(feats[b], fc_w, img_size=s,
                                       box_mode=box_mode)
        assert np.abs(res.boxes[b].astype(np.int64)
                      - want.astype(np.int64)).max() <= tol
        np.testing.assert_array_equal(res.boxes[b, res.pred[b]],
                                      single.bbox[b])
