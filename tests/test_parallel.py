"""Mesh-sharding tests on the virtual 8-device CPU mesh: sharded results must
equal single-device results bit-for-bit, and the graft entry points must run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_cnn.engine.cpu_ref import numpy_cnn_forward
from tpu_cnn.models.cnn import DEFAULT_SHIFTS
from tpu_cnn.parallel.mesh import make_mesh, shard_batch, sharded_detect, sharded_forward


def test_virtual_device_count():
    assert len(jax.devices()) == 8


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, model_axis=2)


def test_sharded_forward_parity(mesh, stock_kernels, rng):
    kj = [jnp.asarray(k) for k in stock_kernels]
    f = sharded_forward(mesh, kj)
    imgs = rng.randint(0, 256, size=(8, 128, 128)).astype(np.uint8)
    feats = np.asarray(f(shard_batch(mesh, jnp.asarray(imgs)),
                         jnp.asarray(DEFAULT_SHIFTS, jnp.int32)))
    for b in range(8):
        np.testing.assert_array_equal(feats[b], numpy_cnn_forward(imgs[b], stock_kernels))


def test_sharded_detect_runs(mesh, stock_kernels, rng):
    kj = [jnp.asarray(k) for k in stock_kernels]
    fc_w = jnp.asarray(rng.randn(6, 1024).astype(np.float32) * 0.05)
    fc_b = jnp.asarray(np.zeros(6, np.float32))
    detect = sharded_detect(mesh, kj, fc_w, fc_b)
    imgs = shard_batch(
        mesh, jnp.asarray(rng.randint(0, 256, size=(16, 128, 128)).astype(np.uint8))
    )
    pred, conf, probs, bbox = detect(imgs, jnp.asarray(DEFAULT_SHIFTS, jnp.int32))
    assert pred.shape == (16,) and bbox.shape == (16, 4)
    assert np.all(np.asarray(conf) > 0) and np.all(np.asarray(conf) <= 1)


def test_data_only_mesh(stock_kernels, rng):
    mesh = make_mesh(8, model_axis=1)
    kj = [jnp.asarray(k) for k in stock_kernels]
    f = sharded_forward(mesh, kj)
    imgs = rng.randint(0, 256, size=(8, 128, 128)).astype(np.uint8)
    feats = np.asarray(f(shard_batch(mesh, jnp.asarray(imgs)),
                         jnp.asarray(DEFAULT_SHIFTS, jnp.int32)))
    np.testing.assert_array_equal(feats[0], numpy_cnn_forward(imgs[0], stock_kernels))


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    pred, conf, probs, bbox = jax.jit(fn)(*args)
    assert pred.shape == (8,) and bbox.shape == (8, 4)


def test_graft_entry_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_mesh_engine_protocol(stock_kernels, rng):
    """MeshEngine must be a drop-in engine across the whole mesh, bit-exact
    vs the host oracle, with non-multiple batch padding."""
    from tpu_cnn.models.cnn import CLASS_NAMES, FpgaCNN
    from tpu_cnn.parallel.mesh import MeshEngine

    fc_w = rng.randn(6, 1024).astype(np.float32) * 0.05
    model = FpgaCNN(stock_kernels, fc_w, np.zeros(6, np.float32), CLASS_NAMES)
    eng = MeshEngine(model, make_mesh(8, model_axis=2))
    imgs = rng.randint(0, 256, size=(5, 128, 128)).astype(np.uint8)  # not /8
    feats = eng.run_batch(imgs)
    assert feats.shape == (5, 64, 256)
    np.testing.assert_array_equal(feats[3], numpy_cnn_forward(imgs[3], stock_kernels))
    res = eng.detect_batch(imgs)
    assert res.pred.shape == (5,) and res.bbox.shape == (5, 4)
    feat1, ms, _ = eng.run(imgs[0])
    np.testing.assert_array_equal(feat1, feats[0])


def test_make_engine_mesh_mode(stock_kernels, rng):
    """--mode mesh from the app surface returns a MeshEngine over all local
    devices with the standard engine protocol."""
    from tpu_cnn.apps.infer import make_engine
    from tpu_cnn.models.cnn import CLASS_NAMES, FpgaCNN
    from tpu_cnn.parallel.mesh import MeshEngine

    fc_w = rng.randn(6, 1024).astype(np.float32) * 0.05
    model = FpgaCNN(stock_kernels, fc_w, np.zeros(6, np.float32), CLASS_NAMES)
    eng = make_engine(model, "mesh")
    assert isinstance(eng, MeshEngine)
    imgs = rng.randint(0, 256, size=(4, 128, 128)).astype(np.uint8)
    feats = eng.run_batch(imgs)
    np.testing.assert_array_equal(feats[1], numpy_cnn_forward(imgs[1], stock_kernels))


def test_sharded_mega_forward_parity(mesh, stock_kernels, rng):
    """The PRODUCTION megakernel under shard_map over all 8 devices must be
    bit-exact vs the host oracle (round-1 verdict: the datapath that ships
    must be the datapath that scales)."""
    from tpu_cnn.parallel.mesh import sharded_forward_mega

    kj = [jnp.asarray(k) for k in stock_kernels]
    f = sharded_forward_mega(mesh, kj)
    imgs = rng.randint(0, 256, size=(32, 128, 128)).astype(np.uint8)
    feats = np.asarray(
        f(shard_batch(mesh, jnp.asarray(imgs), all_axes=True),
          jnp.asarray(DEFAULT_SHIFTS, jnp.int32))
    )
    for b in range(32):
        np.testing.assert_array_equal(feats[b], numpy_cnn_forward(imgs[b], stock_kernels))


def test_sharded_mega_detect_fused_bins(mesh, stock_kernels, rng):
    """Fused megakernel + head under the mesh: detections must equal the
    single-device production path (pooled bins fused in-kernel)."""
    from tpu_cnn.ops import detect_head, pallas_poly
    from tpu_cnn.parallel.mesh import sharded_detect_mega

    kj = [jnp.asarray(k) for k in stock_kernels]
    fc_w = jnp.asarray(rng.randn(6, 1024).astype(np.float32) * 0.05)
    fc_b = jnp.asarray(np.zeros(6, np.float32))
    shifts = jnp.asarray(DEFAULT_SHIFTS, jnp.int32)
    imgs = rng.randint(0, 256, size=(16, 128, 128)).astype(np.uint8)

    det = sharded_detect_mega(mesh, kj, fc_w, fc_b)
    pred, conf, probs, bbox = det(
        shard_batch(mesh, jnp.asarray(imgs), all_axes=True), shifts
    )

    feats1, pooled1 = pallas_poly.cnn_forward_polyphase_pallas(
        jnp.asarray(imgs), kj, shifts, with_bins=True
    )
    p1, c1, pr1, b1 = detect_head.detect_with_pooled(feats1, pooled1, fc_w, fc_b, 128)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(bbox), np.asarray(b1))
    np.testing.assert_allclose(np.asarray(probs), np.asarray(pr1), atol=1e-6)


def test_mesh_engine_async_pipeline(mesh, stock_kernels, rng):
    """detect_batch_async/detect_resolve: several batches in flight, results
    match the synchronous path."""
    from tpu_cnn.models.cnn import CLASS_NAMES, FpgaCNN
    from tpu_cnn.parallel.mesh import MeshEngine

    fc_w = rng.randn(6, 1024).astype(np.float32) * 0.05
    model = FpgaCNN(stock_kernels, fc_w, np.zeros(6, np.float32), CLASS_NAMES)
    eng = MeshEngine(model, mesh)
    assert eng.backend.endswith(":mega")
    batches = [rng.randint(0, 256, size=(8, 128, 128)).astype(np.uint8)
               for _ in range(3)]
    handles = [eng.detect_batch_async(b) for b in batches]
    results = [eng.detect_resolve(h) for h in handles]
    for b, r in zip(batches, results):
        sync = eng.detect_batch(b)
        np.testing.assert_array_equal(r.pred, sync.pred)
        np.testing.assert_array_equal(r.bbox, sync.bbox)


def test_sharded_chained_mega_lyr4(mesh, rng):
    """The CHAINED mega plan (lyr4-wide: head layer + multi-channel tail
    kernel) under shard_map over all 8 devices — bit-exact vs the
    single-device chained path."""
    from tpu_cnn.models.registry import default_shifts, get_config
    from tpu_cnn.ops import pallas_poly
    from tpu_cnn.parallel.mesh import sharded_forward_mega

    cfg = get_config("lyr4-wide")
    kernels = [
        rng.randint(-127, 128, size=(oc, ic, 3, 3)).astype(np.int8)
        for ic, oc, _ in cfg.layer_configs
    ]
    kj = [jnp.asarray(k) for k in kernels]
    shifts = jnp.asarray(default_shifts(cfg), jnp.int32)
    imgs = rng.randint(0, 256, size=(8, 256, 256)).astype(np.uint8)

    f = sharded_forward_mega(mesh, kj)
    got = np.asarray(
        f(shard_batch(mesh, jnp.asarray(imgs), all_axes=True), shifts)
    )
    want = np.asarray(
        pallas_poly.cnn_forward_mega(jnp.asarray(imgs), kj, shifts)
    )
    np.testing.assert_array_equal(got, want)


def test_mesh_engine_per_device_dispatch_structure(mesh, stock_kernels, rng):
    """Per-device dispatch accounting on the virtual mesh — the stand-in
    for the real ICI scaling curve until >1-chip hardware exists: every
    async in-flight batch shards into exactly ONE addressable shard per
    device, each of size B/n_devices (pure DP over all axes), landing on
    all 8 distinct devices. A sharding-spec regression that serialised or
    replicated work would break the shard accounting here."""
    from tpu_cnn.models.cnn import CLASS_NAMES, FpgaCNN
    from tpu_cnn.parallel.mesh import MeshEngine

    fc_w = rng.randn(6, 1024).astype(np.float32) * 0.05
    model = FpgaCNN(stock_kernels, fc_w, np.zeros(6, np.float32), CLASS_NAMES)
    eng = MeshEngine(model, mesh, backend="mega")
    imgs = rng.randint(0, 256, size=(64, 128, 128)).astype(np.uint8)
    handles = [eng.detect_batch_async(imgs) for _ in range(3)]
    for h in handles:
        pred = h[0]  # (64,) int32, sharded over every mesh axis
        shards = pred.addressable_shards
        assert len(shards) == 8
        assert sorted(s.data.shape[0] for s in shards) == [8] * 8
        assert len({s.device for s in shards}) == 8
        # the staged INPUT must be sharded the same way (device_put split
        # the batch before dispatch — no all-gather hiding in the program)
        staged = eng.stage_batch(imgs)
        in_shards = staged[1].addressable_shards
        assert len(in_shards) == 8
        assert sorted(s.data.shape[0] for s in in_shards) == [8] * 8
    for h in handles:
        r = eng.detect_resolve(h)
        assert r.pred.shape == (64,)


def test_mesh_engine_auto_fallback_big_geometry(rng):
    """Geometries with NO megakernel plan (no tail of >= 2 layers fits VMEM
    at any batch tile) fall back to the sharded XLA path automatically;
    lyr4-wide now plans the chained mega path instead (round 3)."""
    from tpu_cnn.models.cnn import CNNConfig, FpgaCNN
    from tpu_cnn.models.registry import REGISTRY, default_shifts
    from tpu_cnn.parallel.mesh import MeshEngine

    cfg = CNNConfig(layer_configs=((1, 64, 2048), (64, 1024, 1024)))
    kernels = [
        rng.randint(-127, 128, size=(oc, ic, 3, 3)).astype(np.int8)
        for ic, oc, _ in cfg.layer_configs
    ]
    fc_w = rng.randn(6, cfg.layer_configs[-1][1] * 16).astype(np.float32) * 0.01
    model = FpgaCNN(kernels, fc_w, np.zeros(6, np.float32),
                    shifts=default_shifts(cfg), config=cfg)
    eng = MeshEngine(model, make_mesh(8, model_axis=1))
    assert eng.backend.endswith(":xla")

    cfg4 = REGISTRY["lyr4-wide"]
    kernels4 = [
        rng.randint(-127, 128, size=(oc, ic, 3, 3)).astype(np.int8)
        for ic, oc, _ in cfg4.layer_configs
    ]
    fc_w4 = rng.randn(6, cfg4.layer_configs[-1][1] * 16).astype(np.float32) * 0.01
    model4 = FpgaCNN(kernels4, fc_w4, np.zeros(6, np.float32),
                     shifts=default_shifts(cfg4), config=cfg4)
    eng4 = MeshEngine(model4, make_mesh(8, model_axis=1))
    assert eng4.backend.endswith(":mega")


# ── pipeline parallelism (GPipe schedule over the 'pipe' axis) ──


def _tiny_pipe_setup(rs):
    cfgs = [(1, 16, 32), (16, 32, 16), (32, 64, 8)]
    kernels = [
        rs.randint(-127, 128, size=(oc, ic, 3, 3)).astype(np.int8)
        for ic, oc, _ in cfgs
    ]
    imgs = rs.randint(0, 256, size=(12, 32, 32)).astype(np.uint8)
    return kernels, imgs, jnp.asarray([2, 4, 6], jnp.int32)


@pytest.mark.parametrize("n_stages,microbatch", [(3, 4), (2, 2), (1, 4)])
def test_pipelined_forward_bit_exact(rng, n_stages, microbatch):
    """GPipe pipeline over the pipe axis == single-device forward, bit for
    bit, at every stage count (incl. the degenerate 1-stage pipe) and with
    multiple microbatches in flight."""
    from tpu_cnn.ops import quant
    from tpu_cnn.parallel.pipeline import make_pipeline_mesh, pipelined_forward

    kernels, imgs, shifts = _tiny_pipe_setup(np.random.RandomState(7))
    f = pipelined_forward(
        make_pipeline_mesh(n_stages), kernels, microbatch=microbatch
    )
    out = np.asarray(f(jnp.asarray(imgs), shifts))
    ref = np.asarray(
        quant.cnn_forward(jnp.asarray(imgs), [jnp.asarray(k) for k in kernels], shifts)
    )
    np.testing.assert_array_equal(out, ref)


def test_pipelined_forward_uneven_stage_split():
    """4 layers on a 3-stage pipe: split_stages gives (2,1,1) layers per
    stage; parity must hold across the uneven stage interfaces."""
    from tpu_cnn.ops import quant
    from tpu_cnn.parallel.pipeline import (
        make_pipeline_mesh,
        pipelined_forward,
        split_stages,
    )

    assert split_stages(4, 3) == [(0, 2), (2, 3), (3, 4)]
    rs = np.random.RandomState(11)
    cfgs = [(1, 8, 32), (8, 16, 16), (16, 32, 8), (32, 64, 4)]
    kernels = [
        rs.randint(-127, 128, size=(oc, ic, 3, 3)).astype(np.int8)
        for ic, oc, _ in cfgs
    ]
    imgs = rs.randint(0, 256, size=(8, 32, 32)).astype(np.uint8)
    shifts = jnp.asarray([2, 4, 5, 6], jnp.int32)
    f = pipelined_forward(make_pipeline_mesh(3), kernels, microbatch=2)
    out = np.asarray(f(jnp.asarray(imgs), shifts))
    ref = np.asarray(
        quant.cnn_forward(jnp.asarray(imgs), [jnp.asarray(k) for k in kernels], shifts)
    )
    np.testing.assert_array_equal(out, ref)


def test_pipelined_forward_flagship_geometry(stock_kernels, rng):
    """The shipped 128-px weights through a 3-stage pipe (one layer per
    stage) == the numpy oracle."""
    from tpu_cnn.parallel.pipeline import make_pipeline_mesh, pipelined_forward

    f = pipelined_forward(make_pipeline_mesh(3), stock_kernels, microbatch=4)
    imgs = rng.randint(0, 256, size=(8, 128, 128)).astype(np.uint8)
    feats = np.asarray(
        f(jnp.asarray(imgs), jnp.asarray(DEFAULT_SHIFTS, jnp.int32))
    )
    for b in range(0, 8, 3):
        np.testing.assert_array_equal(
            feats[b], numpy_cnn_forward(imgs[b], stock_kernels)
        )


def test_pipelined_forward_rejects_bad_config():
    from tpu_cnn.parallel.pipeline import (
        make_pipeline_mesh,
        pipelined_forward,
        split_stages,
    )

    with pytest.raises(ValueError, match="must be in"):
        split_stages(3, 4)  # more stages than layers
    rs = np.random.RandomState(3)
    kernels, imgs, shifts = _tiny_pipe_setup(rs)
    f = pipelined_forward(make_pipeline_mesh(2), kernels, microbatch=5)
    with pytest.raises(ValueError, match="microbatch"):
        f(jnp.asarray(imgs), shifts)  # 12 % 5 != 0
    from tpu_cnn.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="pipe"):
        pipelined_forward(make_mesh(8, model_axis=2), kernels)


# ── spatial parallelism (row shards + halo exchange over the 'space' axis) ──


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_spatial_forward_bit_exact(rng, n_devices):
    """Row-sharded forward with ppermute halo exchange == single-device
    forward, bit for bit, at every mesh width that divides the row bands."""
    from tpu_cnn.ops import quant
    from tpu_cnn.parallel.spatial import make_spatial_mesh, spatial_forward

    rs = np.random.RandomState(5)
    cfgs = [(1, 16, 32), (16, 32, 16), (32, 64, 8)]
    kernels = [
        rs.randint(-127, 128, size=(oc, ic, 3, 3)).astype(np.int8)
        for ic, oc, _ in cfgs
    ]
    imgs = rs.randint(0, 256, size=(4, 64, 64)).astype(np.uint8)
    shifts = jnp.asarray([2, 4, 6], jnp.int32)
    f = spatial_forward(make_spatial_mesh(n_devices), kernels)
    out = np.asarray(f(jnp.asarray(imgs), shifts))
    ref = np.asarray(
        quant.cnn_forward(jnp.asarray(imgs), [jnp.asarray(k) for k in kernels], shifts)
    )
    np.testing.assert_array_equal(out, ref)


def test_spatial_forward_flagship_geometry(stock_kernels, rng):
    """The shipped 128-px weights row-sharded over 4 devices == the numpy
    oracle (halo context crosses 3 device boundaries per layer)."""
    from tpu_cnn.parallel.spatial import make_spatial_mesh, spatial_forward

    f = spatial_forward(make_spatial_mesh(4), stock_kernels)
    imgs = rng.randint(0, 256, size=(6, 128, 128)).astype(np.uint8)
    feats = np.asarray(
        f(jnp.asarray(imgs), jnp.asarray(DEFAULT_SHIFTS, jnp.int32))
    )
    for b in range(0, 6, 2):
        np.testing.assert_array_equal(
            feats[b], numpy_cnn_forward(imgs[b], stock_kernels)
        )


def test_spatial_forward_wrap_semantics():
    """accum_wrap threads through the halo layer identically to the oracle
    (adversarial huge-weight geometry that actually wraps)."""
    from tpu_cnn.ops import quant
    from tpu_cnn.parallel.spatial import make_spatial_mesh, spatial_forward

    rs = np.random.RandomState(9)
    kernels = [
        rs.randint(-127, 128, size=(16, 1, 3, 3)).astype(np.int8),
        rs.randint(-127, 128, size=(64, 16, 3, 3)).astype(np.int8),
    ]
    imgs = np.full((2, 32, 32), 255, np.uint8)
    shifts = jnp.asarray([0, 0], jnp.int32)
    f = spatial_forward(
        make_spatial_mesh(4), kernels, accum_wrap=True, compute_dtype="int32"
    )
    out = np.asarray(f(jnp.asarray(imgs), shifts))
    ref = np.asarray(
        quant.cnn_forward(
            jnp.asarray(imgs), [jnp.asarray(k) for k in kernels], shifts,
            accum_wrap=True, compute_dtype="int32",
        )
    )
    np.testing.assert_array_equal(out, ref)


def test_spatial_forward_rejects_straddling_split():
    from tpu_cnn.parallel.spatial import check_spatial_split, make_spatial_mesh, spatial_forward

    with pytest.raises(ValueError, match="straddle"):
        check_spatial_split(32, 3, 8)  # layer 2: 8 rows, 2*8=16 — straddles
    rs = np.random.RandomState(1)
    kernels = [rs.randint(-127, 128, size=(8, 1, 3, 3)).astype(np.int8)] * 3
    check_spatial_split(128, 3, 8)  # valid split raises nothing
    from tpu_cnn.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="space"):
        spatial_forward(make_mesh(8, model_axis=2), kernels)


def test_spatial_forward_composite_dp_sp(rng):
    """2-D (data, space) mesh: batch shards x row shards (dp x sp), the
    composite deployment shape — still bit-exact vs the oracle forward."""
    from tpu_cnn.ops import quant
    from tpu_cnn.parallel.spatial import make_spatial_mesh, spatial_forward

    rs = np.random.RandomState(13)
    cfgs = [(1, 16, 32), (16, 32, 16), (32, 64, 8)]
    kernels = [
        rs.randint(-127, 128, size=(oc, ic, 3, 3)).astype(np.int8)
        for ic, oc, _ in cfgs
    ]
    imgs = rs.randint(0, 256, size=(6, 64, 64)).astype(np.uint8)
    shifts = jnp.asarray([2, 4, 6], jnp.int32)
    mesh = make_spatial_mesh(8, data_axis=2)  # 2 batch shards x 4 row shards
    assert mesh.axis_names == ("data", "space")
    f = spatial_forward(mesh, kernels)
    out = np.asarray(f(jnp.asarray(imgs), shifts))
    ref = np.asarray(
        quant.cnn_forward(jnp.asarray(imgs), [jnp.asarray(k) for k in kernels], shifts)
    )
    np.testing.assert_array_equal(out, ref)
    with pytest.raises(ValueError, match="divisible by data"):
        f(jnp.asarray(imgs[:5]), shifts)  # 5 % 2 != 0


def test_spatial_forward_large_input_regime():
    """The regime the space axis exists for: a large input (512 px, 4-layer
    ladder) whose layer-0 f32 conv intermediate (512*512*16*4 = 16 MB/img)
    dominates memory — row-sharded 8 ways, bit-exact vs the oracle."""
    from tpu_cnn.ops import quant
    from tpu_cnn.parallel.spatial import make_spatial_mesh, spatial_forward

    rs = np.random.RandomState(21)
    cfgs = [(1, 16, 256), (16, 32, 128), (32, 48, 64), (48, 64, 32)]
    kernels = [
        rs.randint(-127, 128, size=(oc, ic, 3, 3)).astype(np.int8)
        for ic, oc, _ in cfgs
    ]
    imgs = rs.randint(0, 256, size=(2, 512, 512)).astype(np.uint8)
    shifts = jnp.asarray([3, 5, 6, 7], jnp.int32)
    f = spatial_forward(make_spatial_mesh(8), kernels)
    out = np.asarray(f(jnp.asarray(imgs), shifts))
    ref = np.asarray(
        quant.cnn_forward(jnp.asarray(imgs), [jnp.asarray(k) for k in kernels], shifts)
    )
    assert out.shape == (2, 64, 32 * 32)
    np.testing.assert_array_equal(out, ref)


def test_pipelined_forward_composite_dp_pp(rng):
    """2-D (data, pipe) mesh: 2 independent 4-stage pipelines with the batch
    sharded across them (dp x pp) — still bit-exact vs the oracle."""
    from tpu_cnn.ops import quant
    from tpu_cnn.parallel.pipeline import make_pipeline_mesh, pipelined_forward

    rs = np.random.RandomState(17)
    cfgs = [(1, 8, 32), (8, 16, 16), (16, 32, 8), (32, 64, 4)]
    kernels = [
        rs.randint(-127, 128, size=(oc, ic, 3, 3)).astype(np.int8)
        for ic, oc, _ in cfgs
    ]
    imgs = rs.randint(0, 256, size=(12, 32, 32)).astype(np.uint8)
    shifts = jnp.asarray([2, 4, 5, 6], jnp.int32)
    mesh = make_pipeline_mesh(8, data_axis=2)  # 2 pipelines x 4 stages
    assert mesh.axis_names == ("data", "pipe")
    f = pipelined_forward(mesh, kernels, microbatch=2)
    out = np.asarray(f(jnp.asarray(imgs), shifts))
    ref = np.asarray(
        quant.cnn_forward(jnp.asarray(imgs), [jnp.asarray(k) for k in kernels], shifts)
    )
    np.testing.assert_array_equal(out, ref)
    with pytest.raises(ValueError, match="data shards"):
        f(jnp.asarray(imgs[:10]), shifts)  # 10 % (2*2) != 0


def test_pipelined_forward_nonsquare_wrap_and_4d(rng):
    """Review regressions: non-square (H != W) images, accum_wrap threading,
    and the (B, H, W, 1) input form — all bit-exact vs the oracle on both
    new axes."""
    from tpu_cnn.ops import quant
    from tpu_cnn.parallel.pipeline import make_pipeline_mesh, pipelined_forward
    from tpu_cnn.parallel.spatial import make_spatial_mesh, spatial_forward

    rs = np.random.RandomState(23)
    kernels = [
        rs.randint(-127, 128, size=(16, 1, 3, 3)).astype(np.int8),
        rs.randint(-127, 128, size=(64, 16, 3, 3)).astype(np.int8),
    ]
    kj = [jnp.asarray(k) for k in kernels]
    imgs = np.full((4, 32, 64), 255, np.uint8)  # H != W; wraps at shift 0
    shifts = jnp.asarray([0, 0], jnp.int32)
    ref = np.asarray(
        quant.cnn_forward(jnp.asarray(imgs), kj, shifts,
                          accum_wrap=True, compute_dtype="int32")
    )
    assert ref.shape == (4, 64, 8 * 16)

    f_pp = pipelined_forward(
        make_pipeline_mesh(2), kernels, microbatch=2,
        accum_wrap=True, compute_dtype="int32",
    )
    np.testing.assert_array_equal(np.asarray(f_pp(jnp.asarray(imgs), shifts)), ref)
    # (B, H, W, 1) form accepted like quant.cnn_forward
    np.testing.assert_array_equal(
        np.asarray(f_pp(jnp.asarray(imgs[..., None]), shifts)), ref
    )

    f_sp = spatial_forward(
        make_spatial_mesh(4), kernels, accum_wrap=True, compute_dtype="int32"
    )
    np.testing.assert_array_equal(np.asarray(f_sp(jnp.asarray(imgs), shifts)), ref)
    np.testing.assert_array_equal(
        np.asarray(f_sp(jnp.asarray(imgs[..., None]), shifts)), ref
    )


def test_mesh_engine_detect_multi(mesh, stock_kernels, rng):
    """Multi-object head under the mesh: per-class boxes equal the
    single-device TPUEngine multi path (which equals the host twin) for
    both per-shard datapaths, with non-multiple batch padding."""
    from tpu_cnn.engine.tpu import TPUEngine
    from tpu_cnn.models.cnn import CLASS_NAMES, FpgaCNN
    from tpu_cnn.parallel.mesh import MeshEngine

    fc_w = rng.randn(6, 1024).astype(np.float32) * 0.05
    model = FpgaCNN(stock_kernels, fc_w, np.zeros(6, np.float32), CLASS_NAMES)
    imgs = rng.randint(0, 256, size=(13, 128, 128)).astype(np.uint8)  # not /8
    want = TPUEngine(model, backend="xla").detect_multi_batch(imgs)

    for backend in ("mega", "xla"):
        eng = MeshEngine(model, make_mesh(8, model_axis=2), backend=backend)
        got = eng.detect_multi_batch(imgs)
        assert got.boxes.shape == (13, 6, 4)
        np.testing.assert_array_equal(got.pred, want.pred)
        np.testing.assert_array_equal(got.boxes, want.boxes)
        np.testing.assert_allclose(got.probs, want.probs, atol=1e-6)
        # async handle roundtrip + staged input
        staged = eng.stage_batch(imgs)
        res2 = eng.detect_multi_resolve(eng.detect_multi_batch_async(staged))
        np.testing.assert_array_equal(res2.boxes, got.boxes)


def test_sharded_detect_multi_mega_presence_head(mesh, stock_kernels, rng):
    """sharded_detect_multi_mega with multi_head (the PRODUCTION shape:
    MeshEngine._detect_multi_prog passes the bundle's presence head) must
    emit the presence scores as the LAST output, bit-matching
    detect_head.multi_scores on the single-device pooled features — both
    alone and combined with instances=2 (round-4 verdict: a shipped path
    with zero mesh value-checks is a hole)."""
    from tpu_cnn.ops import detect_head, pallas_poly
    from tpu_cnn.parallel.mesh import sharded_detect_multi_mega

    kj = [jnp.asarray(k) for k in stock_kernels]
    fc_w = jnp.asarray(rng.randn(6, 1024).astype(np.float32) * 0.05)
    fc_b = jnp.asarray(np.zeros(6, np.float32))
    mh = (rng.randn(6, 1024).astype(np.float32) * 0.05,
          rng.randn(6).astype(np.float32))
    shifts = jnp.asarray(DEFAULT_SHIFTS, jnp.int32)
    imgs = rng.randint(0, 256, size=(16, 128, 128)).astype(np.uint8)

    # single-device production twin
    _, pooled1, twin1 = pallas_poly.cnn_forward_polyphase_pallas(
        jnp.asarray(imgs), kj, shifts,
        with_bins=True, with_twin=True, with_feats=True,
    )
    want = detect_head.detect_multi_with_pooled(
        pooled1, twin1, fc_w, fc_b, 128, multi_head=mh
    )
    scores_fn = np.asarray(detect_head.multi_scores(
        pooled1, jnp.asarray(mh[0]), jnp.asarray(mh[1])))

    det = sharded_detect_multi_mega(mesh, kj, fc_w, fc_b, multi_head=mh)
    out = det(shard_batch(mesh, jnp.asarray(imgs), all_axes=True), shifts)
    assert len(out) == 5
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(out[3]), np.asarray(want[3]))
    np.testing.assert_allclose(np.asarray(out[4]), np.asarray(want[-1]),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[4]), scores_fn,
                               rtol=0, atol=1e-6)

    # combined with the watershed instance head: scores stay LAST
    det_i = sharded_detect_multi_mega(mesh, kj, fc_w, fc_b, instances=2,
                                      multi_head=mh)
    out_i = det_i(shard_batch(mesh, jnp.asarray(imgs), all_axes=True), shifts)
    assert len(out_i) == 7
    want_i = detect_head.detect_multi_with_pooled(
        pooled1, twin1, fc_w, fc_b, 128, instances=2, multi_head=mh
    )
    np.testing.assert_array_equal(np.asarray(out_i[4]), np.asarray(want_i[4]))
    np.testing.assert_array_equal(np.asarray(out_i[5]), np.asarray(want_i[5]))
    np.testing.assert_allclose(np.asarray(out_i[6]), scores_fn,
                               rtol=0, atol=1e-6)
