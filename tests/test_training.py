"""Training pipeline tests: shrunk-geometry end-to-end QAT run, export
round-trip, and the mesh-sharded train step."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tpu_cnn.engine.cpu_ref import numpy_cnn_forward
from tpu_cnn.models.cnn import FpgaCNN
from tpu_cnn.parallel.mesh import make_mesh
from tpu_cnn.train import data as D
from tpu_cnn.train.train_cnn import (
    TrainConfig,
    extract_qat_features,
    float_forward,
    init_params,
    make_train_step,
    param_shardings,
    train,
)

SMALL_CFG = TrainConfig(
    layer_configs=((1, 16, 32), (16, 32, 16), (32, 64, 8)),
    epochs=2,
    batch_size=32,
    head_epochs=50,
)


def test_synthetic_dataset_shapes():
    ds = D.SyntheticShapes(n_per_class=4, img_size=32)
    imgs, labels = ds.arrays()
    assert imgs.shape == (24, 32, 32) and imgs.dtype == np.float32
    assert imgs.min() >= 0 and imgs.max() <= 1
    assert set(labels.tolist()) == set(range(6))


def test_float_forward_shapes():
    params = init_params(SMALL_CFG, jax.random.PRNGKey(0))
    x = jnp.zeros((4, 32, 32), jnp.float32)
    logits = float_forward(params, x, 3)
    assert logits.shape == (4, 6)


def test_train_step_descends():
    cfg = SMALL_CFG
    params = init_params(cfg, jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    state = opt.init(params)
    step = make_train_step(cfg, opt)
    ds = D.SyntheticShapes(n_per_class=16, img_size=32)
    imgs, labels = ds.arrays()
    bi, bl = jnp.asarray(imgs[:32]), jnp.asarray(labels[:32].astype(np.int32))
    losses = []
    for _ in range(15):
        params, state, loss, acc = step(params, state, bi, bl)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_train_step_sharded_matches_unsharded():
    cfg = SMALL_CFG
    mesh = make_mesh(8, model_axis=2)
    params = init_params(cfg, jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    ds = D.SyntheticShapes(n_per_class=16, img_size=32)
    imgs, labels = ds.arrays()
    bi, bl = jnp.asarray(imgs[:32]), jnp.asarray(labels[:32].astype(np.int32))

    s1 = make_train_step(cfg, opt)
    p1, _, l1, _ = s1(params, opt.init(params), bi, bl)

    sh = param_shardings(cfg, mesh)
    params_sh = jax.tree.map(lambda p, s: jax.device_put(p, s), params, sh)
    s2 = make_train_step(cfg, opt, mesh)
    p2, _, l2, _ = s2(params_sh, opt.init(params_sh), bi, bl)

    assert abs(float(l1) - float(l2)) < 1e-4
    np.testing.assert_allclose(
        np.asarray(p1["fc_w"]), np.asarray(p2["fc_w"]), rtol=1e-4, atol=1e-5
    )


def test_qat_features_match_oracle():
    """Phase-2 features must come from the same bit-exact contract as the
    inference engines."""
    cfg = SMALL_CFG
    params = init_params(cfg, jax.random.PRNGKey(1))
    from tpu_cnn.train.train_cnn import quantized_kernels

    q_kernels, scale = quantized_kernels(params, cfg)
    assert scale > 0
    imgs = np.random.RandomState(0).rand(3, 32, 32).astype(np.float32)
    feats = extract_qat_features(params, imgs, cfg)
    assert feats.shape == (3, 64)
    for b in range(3):
        u8 = np.round(imgs[b] * 255).astype(np.uint8)
        want = numpy_cnn_forward(
            u8, q_kernels, shifts=cfg.shifts, accum_wrap=True,
            layer_configs=cfg.layer_configs,
        ).astype(np.float32).mean(axis=1)
        np.testing.assert_allclose(feats[b], want, rtol=1e-6)


def test_end_to_end_training_and_reload(tmp_path):
    """Full two-phase run on synthetic data; exported bundle must load into
    FpgaCNN and beat chance accuracy on its own training set."""
    cfg = TrainConfig(epochs=2, batch_size=32, head_epochs=200, lr=3e-3)
    ds = D.SyntheticShapes(n_per_class=24)
    imgs, labels = ds.arrays()
    out = str(tmp_path / "bundle")
    bundle = train(cfg, (imgs[24:], labels[24:]), (imgs[:24], labels[:24]),
                   out, class_names=ds.class_names, verbose=False)

    assert os.path.exists(os.path.join(out, "weights.bin"))
    assert os.path.getsize(os.path.join(out, "weights.bin")) == 23184
    model = FpgaCNN.from_artifacts(out)
    assert model.head_mode == "gap"

    # exported test images exist and carry labels
    bins = [f for f in os.listdir(out) if f.startswith("test_image_")]
    assert len(bins) > 0

    # classify the training set via the CPU engine + GAP head
    from tpu_cnn.engine.cpu_ref import CPURefEngine
    from tpu_cnn.head.classify import classify_np

    eng = CPURefEngine(model.kernels, use_native=False)
    sub = np.round(imgs[:36] * 255).astype(np.uint8)
    feats = eng.run_batch(sub)
    idx, conf, probs = classify_np(feats, model.fc_weight, model.fc_bias)
    acc = (idx == labels[:36]).mean()
    assert acc > 1.0 / 6 + 0.1, f"accuracy {acc} barely above chance"


def test_variant_training_end_to_end(tmp_path):
    """Train->export->reload on a non-stock variant (lyr2-small): the whole
    stack must be geometry-generic, not hardcoded to the flagship."""
    from tpu_cnn.engine.cpu_ref import CPURefEngine
    from tpu_cnn.models.registry import get_config

    vc = get_config("lyr2-small")
    cfg = TrainConfig(layer_configs=vc.layer_configs, epochs=1,
                      batch_size=16, head_epochs=20)
    ds = D.SyntheticShapes(n_per_class=6, img_size=vc.img_size)
    imgs, labels = ds.arrays()
    out = str(tmp_path / "variant")
    train(cfg, (imgs[6:], labels[6:]), (imgs[:6], labels[:6]), out,
          class_names=ds.class_names, verbose=False)

    import os

    assert os.path.getsize(os.path.join(out, "weights.bin")) == vc.weight_bytes()
    from tpu_cnn.utils import artifacts as art
    from tpu_cnn.utils.weights import decode_weights

    blob = np.fromfile(os.path.join(out, "weights.bin"), np.int8)
    kernels = decode_weights(blob, vc.layer_configs)
    eng = CPURefEngine(kernels, shifts=(2, 4), use_native=False)
    feats = eng.run_batch(np.round(imgs[:2] * 255).astype(np.uint8))
    assert feats.shape == (2, 32, 16 * 16)


def test_coco_protocol_on_disk(tmp_path):
    """The reference's COCO protocol (training/train_cnn.py:58-97) exercised
    on real bytes: a fabricated COCO-format annotation file + JPEGs on disk,
    read through CocoClassification (pure-JSON fallback when pycocotools is
    absent)."""
    import json

    from PIL import Image

    from tpu_cnn.train.data import CocoClassification

    rng = np.random.RandomState(7)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, annotations = [], []
    cats = list(CocoClassification.COCO_CATS.items())
    n_per = 3
    iid = aid = 0
    for name, cat_id in cats:
        for k in range(n_per):
            fn = f"{name}_{k}.jpg"
            arr = rng.randint(0, 256, (37, 53, 3)).astype(np.uint8)
            Image.fromarray(arr).save(img_dir / fn, quality=90)
            images.append({"id": iid, "file_name": fn, "width": 53, "height": 37})
            annotations.append({"id": aid, "image_id": iid,
                                "category_id": cat_id, "bbox": [1, 1, 10, 10]})
            iid += 1
            aid += 1
    ann_file = tmp_path / "instances.json"
    ann_file.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": c, "name": n} for n, c in cats],
    }))

    ds = CocoClassification(str(img_dir), str(ann_file), img_size=32)
    assert len(ds) == n_per * len(cats)
    imgs, labels = ds.arrays()
    assert imgs.shape == (len(ds), 32, 32) and imgs.dtype == np.float32
    assert imgs.max() <= 1.0 and imgs.min() >= 0.0
    assert sorted(np.bincount(labels).tolist()) == [n_per] * len(cats)
    assert ds.class_names == list(CocoClassification.COCO_CATS)


def test_train_cli_on_coco_format(tmp_path):
    """End-to-end: the train CLI consuming a COCO-format dataset from disk
    (tiny geometry, 1 epoch) exports a loadable bundle."""
    import json

    from PIL import Image

    from tpu_cnn.train import train_cnn
    from tpu_cnn.train.data import CocoClassification
    from tpu_cnn.utils import artifacts as art

    rng = np.random.RandomState(3)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, annotations = [], []
    iid = 0
    for name, cat_id in CocoClassification.COCO_CATS.items():
        for k in range(4):
            fn = f"{name}_{k}.jpg"
            Image.fromarray(
                rng.randint(0, 256, (40, 40, 3)).astype(np.uint8)
            ).save(img_dir / fn)
            images.append({"id": iid, "file_name": fn, "width": 40, "height": 40})
            annotations.append({"id": iid, "image_id": iid,
                                "category_id": cat_id, "bbox": [0, 0, 5, 5]})
            iid += 1
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps({"images": images, "annotations": annotations}))

    out = str(tmp_path / "out")
    train_cnn.main([
        "--train-images", str(img_dir), "--train-ann", str(ann),
        "--variant", "lyr3-tiny", "--epochs", "1", "--batch-size", "8",
        "--output-dir", out,
    ])
    bundle = art.load_bundle(out, layer_configs=(
        (1, 16, 32), (16, 32, 16), (32, 64, 8)))
    assert bundle.fc_weight.shape[0] == 6


def test_bin_folder_dataset(tmp_path):
    """BinFolderDataset reads the reference's *_class<C>.bin export format
    (the real-photo set's on-disk form) with filename labels + adjacent
    classes.json names."""
    import json

    from tpu_cnn.train.data import BinFolderDataset

    root = str(tmp_path / "bins")
    os.makedirs(root, exist_ok=True)
    rs = np.random.RandomState(0)
    for i in range(4):
        rs.randint(0, 256, 128 * 128).astype(np.uint8).tofile(
            os.path.join(root, f"test_image_{i}_class{i % 2}.bin")
        )
    with open(os.path.join(root, "classes.json"), "w") as f:
        json.dump(["alpha", "beta"], f)
    ds = BinFolderDataset(root)
    imgs, labels = ds.arrays()
    assert imgs.shape == (4, 128, 128) and imgs.dtype == np.float32
    assert imgs.max() <= 1.0
    assert sorted(labels.tolist()) == [0, 0, 1, 1]
    assert ds.class_names == ["alpha", "beta"]
    ds2 = BinFolderDataset(root, max_per_class=1)
    assert len(ds2) == 2


def test_train_cli_mesh(tmp_path):
    """--mesh DxM trains over a (data, model) device mesh from the CLI —
    the user-facing form of the distributed train step dryrun_multichip
    validates (batch over 'data', conv oc + fc feature dim over 'model')."""
    from tpu_cnn.train import train_cnn
    from tpu_cnn.utils import artifacts as art

    out = str(tmp_path / "out")
    train_cnn.main([
        "--synthetic", "--variant", "lyr3-tiny", "--epochs", "1",
        "--batch-size", "16", "--max-per-class", "100",
        "--mesh", "4x2", "--output-dir", out,
    ])
    bundle = art.load_bundle(out, layer_configs=(
        (1, 16, 32), (16, 32, 16), (32, 64, 8)))
    assert bundle.fc_weight.shape[0] == 6
    assert all(np.isfinite(k).all() for k in bundle.kernels)


def test_pipeline_train_step_matches_unsharded():
    """GPipe pipeline training (`parallel/pipeline_train.py`): the forward
    AND backward run as a pipeline — AD through scan/ppermute/switch emits
    the reverse schedule — with logits bit-exact vs float_forward and one
    full optimizer step matching the plain step to f32 ulp. Also checks the
    composite (data, pipe) mesh."""
    from tpu_cnn.parallel.pipeline import make_pipeline_mesh
    from tpu_cnn.parallel.pipeline_train import (
        make_pipeline_train_step,
        pipelined_float_logits,
    )

    cfg = SMALL_CFG
    params = init_params(cfg, jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    ds = D.SyntheticShapes(n_per_class=16, img_size=32)
    imgs, labels = ds.arrays()
    bi, bl = jnp.asarray(imgs[:32]), jnp.asarray(labels[:32].astype(np.int32))

    mesh = make_pipeline_mesh(3)
    f = pipelined_float_logits(mesh, cfg.layer_configs, microbatch=4)
    np.testing.assert_array_equal(  # bit-exact: zero-pad channels add 0.0
        np.asarray(jax.jit(f)(params, bi)),
        np.asarray(float_forward(params, bi, 3)),
    )

    s_ref = make_train_step(cfg, opt)
    p1, _, l1, a1 = s_ref(params, opt.init(params), bi, bl)
    s_pp = make_pipeline_train_step(cfg, opt, mesh, microbatch=4)
    p2, _, l2, a2 = s_pp(params, opt.init(params), bi, bl)
    assert float(l1) == pytest.approx(float(l2), abs=1e-6)
    assert float(a1) == float(a2)
    for k in p1:
        np.testing.assert_allclose(
            np.asarray(p1[k]), np.asarray(p2[k]), rtol=0, atol=1e-6
        )

    # remat (GPipe + jax.checkpoint per stage): identical step results
    s_rm = make_pipeline_train_step(cfg, opt, mesh, microbatch=4, remat=True)
    p3, _, l3, _ = s_rm(params, opt.init(params), bi, bl)
    assert float(l2) == pytest.approx(float(l3), abs=1e-6)
    for k in p2:
        np.testing.assert_allclose(
            np.asarray(p2[k]), np.asarray(p3[k]), rtol=0, atol=1e-6
        )

    # composite dp x pp: 2 independent pipelines, batch sharded across them
    mesh2 = make_pipeline_mesh(6, data_axis=2)
    f2 = pipelined_float_logits(mesh2, cfg.layer_configs, microbatch=4)
    np.testing.assert_allclose(
        np.asarray(jax.jit(f2)(params, bi)),
        np.asarray(float_forward(params, bi, 3)),
        rtol=0, atol=1e-5,
    )

    # pipelined training DESCENDS (several steps through the same jit)
    pp, st = params, opt.init(params)
    losses = []
    for _ in range(10):
        pp, st, loss, _ = s_pp(pp, st, bi, bl)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_train_cli_pipeline(tmp_path):
    """--pipeline DxS trains as a GPipe pipeline from the CLI (here 2
    independent 3-stage pipelines over 6 virtual devices)."""
    from tpu_cnn.train import train_cnn
    from tpu_cnn.utils import artifacts as art

    out = str(tmp_path / "out")
    train_cnn.main([
        "--synthetic", "--variant", "lyr3-tiny", "--epochs", "1",
        "--batch-size", "16", "--max-per-class", "100",
        "--pipeline", "2x3", "--microbatch", "4", "--output-dir", out,
    ])
    bundle = art.load_bundle(out, layer_configs=(
        (1, 16, 32), (16, 32, 16), (32, 64, 8)))
    assert bundle.fc_weight.shape[0] == 6
    assert all(np.isfinite(k).all() for k in bundle.kernels)


def test_spatial_train_step_matches_unsharded():
    """Spatial-parallel training (`parallel/spatial_train.py`): image rows
    sharded with ppermute halo exchange per layer, GAP as partial-sum +
    psum — jax.grad through the halo exchange matches the plain step at
    f32 ulp. Also checks the composite (data, space) mesh."""
    from tpu_cnn.parallel.spatial import make_spatial_mesh
    from tpu_cnn.parallel.spatial_train import (
        make_spatial_train_step,
        spatial_float_logits,
    )

    cfg = SMALL_CFG
    params = init_params(cfg, jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    ds = D.SyntheticShapes(n_per_class=16, img_size=32)
    imgs, labels = ds.arrays()
    bi, bl = jnp.asarray(imgs[:32]), jnp.asarray(labels[:32].astype(np.int32))

    mesh = make_spatial_mesh(4)  # layer2 rows 8 = 2*4: finest legal split
    f = spatial_float_logits(mesh, cfg.layer_configs)
    np.testing.assert_allclose(
        np.asarray(jax.jit(f)(params, bi)),
        np.asarray(float_forward(params, bi, 3)),
        rtol=0, atol=1e-5,
    )

    s_ref = make_train_step(cfg, opt)
    p1, _, l1, a1 = s_ref(params, opt.init(params), bi, bl)
    s_sp = make_spatial_train_step(cfg, opt, mesh)
    p2, _, l2, a2 = s_sp(params, opt.init(params), bi, bl)
    assert float(l1) == pytest.approx(float(l2), abs=1e-6)
    assert float(a1) == float(a2)
    for k in p1:
        np.testing.assert_allclose(
            np.asarray(p1[k]), np.asarray(p2[k]), rtol=0, atol=1e-6
        )

    # composite dp x sp
    mesh2 = make_spatial_mesh(8, data_axis=2)
    f2 = spatial_float_logits(mesh2, cfg.layer_configs)
    np.testing.assert_allclose(
        np.asarray(jax.jit(f2)(params, bi)),
        np.asarray(float_forward(params, bi, 3)),
        rtol=0, atol=1e-5,
    )

    # illegal split refused (layer2 rows 8 % (2*8) != 0)
    with pytest.raises(ValueError, match="straddle"):
        spatial_float_logits(make_spatial_mesh(8), cfg.layer_configs)(
            params, bi
        )


def test_train_cli_spatial(tmp_path):
    """--spatial DxN trains with row sharding from the CLI (2 data shards x
    4 row shards over 8 virtual devices)."""
    from tpu_cnn.train import train_cnn
    from tpu_cnn.utils import artifacts as art

    out = str(tmp_path / "out")
    train_cnn.main([
        "--synthetic", "--variant", "lyr3-tiny", "--epochs", "1",
        "--batch-size", "16", "--max-per-class", "100",
        "--spatial", "2x4", "--output-dir", out,
    ])
    bundle = art.load_bundle(out, layer_configs=(
        (1, 16, 32), (16, 32, 16), (32, 64, 8)))
    assert bundle.fc_weight.shape[0] == 6
    assert all(np.isfinite(k).all() for k in bundle.kernels)


def test_zero1_optimizer_sharding():
    """ZeRO-1 (`--zero1`): with a pure-dp mesh the Adam moments are sharded
    over 'data' (each device stores 1/D), updated params match the plain
    step at f32 ulp, later steps consume the sharded state, and a dp x tp
    mesh is refused (moments would fight the model-sharded params)."""
    cfg = SMALL_CFG
    params = init_params(cfg, jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    ds = D.SyntheticShapes(n_per_class=16, img_size=32)
    imgs, labels = ds.arrays()
    bi, bl = jnp.asarray(imgs[:32]), jnp.asarray(labels[:32].astype(np.int32))
    mesh = make_mesh(8, model_axis=1)

    s_ref = make_train_step(cfg, opt)
    p1, _, l1, _ = s_ref(params, opt.init(params), bi, bl)
    s_z = make_train_step(cfg, opt, mesh, zero1=True)
    p2, o2, l2, _ = s_z(params, opt.init(params), bi, bl)

    assert abs(float(l1) - float(l2)) < 1e-5
    for k in p1:
        np.testing.assert_allclose(
            np.asarray(p1[k]), np.asarray(p2[k]), rtol=0, atol=1e-6
        )
    mu = o2[0].mu
    assert not mu["conv0"].sharding.is_fully_replicated
    assert mu["conv0"].addressable_shards[0].data.shape[0] \
        == mu["conv0"].shape[0] // 8
    # scalars / indivisible leaves (fc_b is (6,)) stay replicated
    assert mu["fc_b"].sharding.is_fully_replicated

    p3, _, l3, _ = s_z(p2, o2, bi, bl)  # sharded state round-trips
    assert np.isfinite(float(l3))

    with pytest.raises(ValueError, match="pure data-parallel"):
        make_train_step(cfg, opt, make_mesh(8, model_axis=2), zero1=True)


def test_train_cli_zero1(tmp_path):
    """--mesh 8 --zero1 trains with the optimizer state sharded from the
    CLI."""
    from tpu_cnn.train import train_cnn
    from tpu_cnn.utils import artifacts as art

    out = str(tmp_path / "out")
    train_cnn.main([
        "--synthetic", "--variant", "lyr3-tiny", "--epochs", "1",
        "--batch-size", "16", "--max-per-class", "100",
        "--mesh", "8", "--zero1", "--output-dir", out,
    ])
    bundle = art.load_bundle(out, layer_configs=(
        (1, 16, 32), (16, 32, 16), (32, 64, 8)))
    assert all(np.isfinite(k).all() for k in bundle.kernels)


def test_bf16_mixed_precision_step():
    """--bf16: conv math in bf16 (f32 master weights + f32 accumulation) —
    params stay f32, the loss tracks the f32 run closely, and training
    descends."""
    cfg = SMALL_CFG
    params = init_params(cfg, jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    ds = D.SyntheticShapes(n_per_class=16, img_size=32)
    imgs, labels = ds.arrays()
    bi, bl = jnp.asarray(imgs[:32]), jnp.asarray(labels[:32].astype(np.int32))

    s16 = make_train_step(cfg, opt, compute_dtype="bfloat16")
    s32 = make_train_step(cfg, opt)
    p16, st16, l16, _ = s16(params, opt.init(params), bi, bl)
    _, _, l32, _ = s32(params, opt.init(params), bi, bl)
    assert abs(float(l16) - float(l32)) < 0.05  # bf16 rounding, same model
    assert all(v.dtype == jnp.float32 for v in jax.tree.leaves(p16))

    losses = [float(l16)]
    for _ in range(14):
        p16, st16, loss, _ = s16(p16, st16, bi, bl)
        losses.append(float(loss))
    assert losses[-1] < losses[0]

    # pipe/space twins are f32-only — requesting bf16 there is refused
    from tpu_cnn.parallel.pipeline import make_pipeline_mesh
    with pytest.raises(ValueError, match="bf16"):
        make_train_step(cfg, opt, make_pipeline_mesh(3),
                        compute_dtype="bfloat16")


def test_grad_accum_matches_big_batch():
    """--grad-accum K (optax.MultiSteps): K half-batch microsteps produce
    exactly one update equal to the full-batch step (CE means over
    equal-size halves average to the concatenated mean); params are frozen
    until the K-th microstep."""
    cfg = SMALL_CFG
    params = init_params(cfg, jax.random.PRNGKey(0))
    inner = optax.adam(1e-3)
    opt = optax.MultiSteps(inner, every_k_schedule=2)
    ds = D.SyntheticShapes(n_per_class=16, img_size=32)
    imgs, labels = ds.arrays()
    bi, bl = jnp.asarray(imgs[:32]), jnp.asarray(labels[:32].astype(np.int32))

    step = make_train_step(cfg, opt)
    p1, st, _, _ = step(params, opt.init(params), bi[:16], bl[:16])
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # frozen
    p2, st, _, _ = step(p1, st, bi[16:], bl[16:])

    step_big = make_train_step(cfg, inner)
    p_big, _, _, _ = step_big(params, inner.init(params), bi, bl)
    for k in p2:
        np.testing.assert_allclose(
            np.asarray(p2[k]), np.asarray(p_big[k]), rtol=0, atol=1e-6
        )


def test_train_cli_bf16_grad_accum(tmp_path):
    """--bf16 --grad-accum 2 end-to-end from the CLI."""
    from tpu_cnn.train import train_cnn
    from tpu_cnn.utils import artifacts as art

    out = str(tmp_path / "out")
    train_cnn.main([
        "--synthetic", "--variant", "lyr3-tiny", "--epochs", "1",
        "--batch-size", "16", "--max-per-class", "100",
        "--bf16", "--grad-accum", "2", "--output-dir", out,
    ])
    bundle = art.load_bundle(out, layer_configs=(
        (1, 16, 32), (16, 32, 16), (32, 64, 8)))
    assert all(np.isfinite(k).all() for k in bundle.kernels)


def test_augment_batch_semantics():
    """augment_batch: deterministic under a seeded rng, shape/dtype/range
    preserved, content is a flip+shift of the original (edge padding), and
    two rngs at the same seed agree — the multihost lockstep property."""
    from tpu_cnn.train.data import augment_batch

    rs = np.random.RandomState(3)
    imgs = rs.rand(8, 32, 32).astype(np.float32)
    a1 = augment_batch(imgs, np.random.RandomState(42))
    a2 = augment_batch(imgs, np.random.RandomState(42))
    np.testing.assert_array_equal(a1, a2)
    assert a1.shape == imgs.shape and a1.dtype == imgs.dtype
    assert a1.min() >= 0.0 and a1.max() <= 1.0
    assert not np.array_equal(a1, imgs)  # something actually moved
    # every augmented image's interior must appear in the original (or its
    # flip) — translation only moves content, edge padding only replicates
    for i in range(len(imgs)):
        inner = a1[i, 8:24, 8:24]
        found = any(
            np.array_equal(inner, src[y:y + 16, x:x + 16])
            for src in (imgs[i], imgs[i, :, ::-1])
            for y in range(4, 13) for x in range(4, 13)
        )
        assert found, f"image {i} is not a flip+shift of the original"


def test_train_cli_augment(tmp_path):
    """--augment end-to-end from the CLI."""
    from tpu_cnn.train.train_cnn import main as train_main

    out = str(tmp_path / "aug")
    train_main([
        "--synthetic", "--epochs", "1", "--batch-size", "8",
        "--max-per-class", "50", "--augment", "--output-dir", out,
    ])
    assert os.path.exists(os.path.join(out, "weights.bin"))


def test_sigterm_graceful_checkpoint(tmp_path):
    """Preemption safety: SIGTERM mid-training finishes the current epoch,
    leaves a valid checkpoint, and exits cleanly (train() returns None);
    a --resume run picks up after the stopped epoch."""
    import signal
    import subprocess
    import sys
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = str(tmp_path / "pre.npz")
    script = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, {repo!r})
from tpu_cnn.train import data as D
from tpu_cnn.train.train_cnn import TrainConfig, train
cfg = TrainConfig(layer_configs=((1, 16, 32), (16, 32, 16), (32, 64, 8)),
                  epochs=500, batch_size=16, head_epochs=5)
ds = D.SyntheticShapes(n_per_class=16, img_size=32)
imgs, labels = ds.arrays()
out = train(cfg, (imgs[24:], labels[24:]), (imgs[:24], labels[:24]),
            {str(tmp_path / "out")!r}, checkpoint_path={ckpt!r})
print("RETURNED_NONE", out is None, flush=True)
"""
    proc = subprocess.Popen([sys.executable, "-c", script],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    try:
        deadline = time.time() + 300
        while not os.path.exists(ckpt) and time.time() < deadline:
            assert proc.poll() is None, proc.communicate()[0]
            time.sleep(0.5)
        assert os.path.exists(ckpt), "no checkpoint appeared within 300 s"
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out
    assert "RETURNED_NONE True" in out
    assert "re-run with --resume" in out

    # the snapshot is a valid resumable checkpoint with >= 1 epoch done
    import json

    meta = json.loads(bytes(np.load(ckpt)["__meta"]).decode())
    assert meta["epoch"] >= 1


def test_fake_quant_convs_grid_and_ste():
    """fake_quant_convs puts every conv weight EXACTLY on the export int8
    grid (quantize_global round-trips losslessly) and passes gradients
    straight through the rounding."""
    from tpu_cnn.train.train_cnn import fake_quant_convs
    from tpu_cnn.utils.weights import quantize_global

    cfg = SMALL_CFG
    n = len(cfg.layer_configs)
    params = init_params(cfg, jax.random.PRNGKey(1))
    fq = fake_quant_convs(params, n)
    q, scale = quantize_global([np.asarray(fq[f"conv{i}"]) for i in range(n)])
    for i in range(n):
        np.testing.assert_allclose(
            np.asarray(fq[f"conv{i}"]), q[i].astype(np.float32) / scale,
            rtol=0, atol=1e-6,
        )  # dequantizing the export int8 reproduces the training forward

    def s(p):
        fqp = fake_quant_convs(p, n)
        return sum(jnp.sum(fqp[f"conv{i}"] ** 2) for i in range(n))

    g = jax.grad(s)(params)
    for i in range(n):
        assert float(jnp.abs(g[f"conv{i}"]).max()) > 0  # STE: grads flow


def test_train_cli_qat(tmp_path):
    """--qat end-to-end from the CLI; exported int8 weights equal the
    fake-quant grid the training forward used."""
    from tpu_cnn.train.train_cnn import main as train_main

    out = str(tmp_path / "qat")
    train_main([
        "--synthetic", "--epochs", "1", "--batch-size", "8",
        "--max-per-class", "50", "--qat", "--output-dir", out,
    ])
    assert os.path.exists(os.path.join(out, "weights.bin"))


def test_prefetch_preserves_stream():
    """_prefetch_to_device must yield exactly the host stream's batches, in
    order, with labels cast to int32 — staging ahead must never reorder or
    drop (the training loop's correctness depends on it)."""
    from tpu_cnn.train.train_cnn import _prefetch_to_device

    rs = np.random.RandomState(0)
    host = [(rs.rand(4, 8, 8).astype(np.float32),
             rs.randint(0, 6, 4).astype(np.int64)) for _ in range(5)]
    out = list(_prefetch_to_device(iter(host)))
    assert len(out) == len(host)
    for (hi, hl), (di, dl) in zip(host, out):
        np.testing.assert_array_equal(np.asarray(di), hi)
        np.testing.assert_array_equal(np.asarray(dl), hl.astype(np.int32))
        assert np.asarray(dl).dtype == np.int32


def test_train_per_layer_scale_export(tmp_path):
    """--per-layer-scale: end-to-end tiny training exports a loadable
    bundle whose every conv layer uses the full int8 grid."""
    from tpu_cnn.apps.common import load_model
    from tpu_cnn.train import train_cnn as T

    out = str(tmp_path / "pls")
    T.main(["--synthetic", "--epochs", "2", "--max-per-class", "50",
            "--variant", "lyr2-small", "--output-dir", out,
            "--per-layer-scale"])
    model = load_model(out, "lyr2-small")
    for k in model.kernels:
        assert np.abs(k).max() == 127, "per-layer scale must fill the grid"


def test_soft_composites_and_aux_training(tmp_path):
    """soft_composites: 2-object frames with 0.5/0.5 targets; train() with
    aux_data mixes them into phase 1 only (the round-5 co-presence lever)
    and still exports a working single-label bundle."""
    ds = D.SyntheticShapes(n_per_class=24)
    imgs, labels = ds.arrays()
    aux_i, aux_s = D.soft_composites(imgs, labels, 20, seed=3)
    assert aux_i.shape == (20, 128, 128) and aux_s.shape == (20, 6)
    np.testing.assert_allclose(aux_s.sum(axis=1), 1.0)
    assert ((aux_s > 0).sum(axis=1) == 2).all()
    assert 0.0 <= aux_i.min() and aux_i.max() <= 1.0

    cfg = TrainConfig(epochs=2, batch_size=32, head_epochs=200, lr=3e-3)
    out = str(tmp_path / "bundle")
    train(cfg, (imgs[24:], labels[24:]), (imgs[:24], labels[:24]), out,
          class_names=ds.class_names, verbose=False,
          aux_data=(aux_i, aux_s))
    model = FpgaCNN.from_artifacts(out)
    assert model.head_mode == "gap"  # phase 2 stayed single-label


def test_aux_bce_multilabel_phase1(tmp_path):
    """aux_bce=True: composites train under per-class sigmoid BCE with
    multi-hot 1/1 targets (--composite-loss bce) — the loss must differ
    from the softmax path on the same dense targets, and the pipeline
    still exports a single-label bundle."""
    from tpu_cnn.train.train_cnn import init_params, loss_fn

    ds = D.SyntheticShapes(n_per_class=24)
    imgs, labels = ds.arrays()
    aux_i, aux_s = D.soft_composites(imgs, labels, 20, seed=3)

    params = init_params(TrainConfig(), jax.random.PRNGKey(0))
    dense = jnp.asarray((aux_s > 0).astype(np.float32))
    bi = jnp.asarray(aux_i)
    l_ce, _ = loss_fn(params, bi, dense, 3)
    l_bce, _ = loss_fn(params, bi, dense, 3, soft_bce=True)
    assert float(l_ce) != pytest.approx(float(l_bce), rel=1e-3)

    cfg = TrainConfig(epochs=2, batch_size=32, head_epochs=200, lr=3e-3)
    out = str(tmp_path / "bundle")
    train(cfg, (imgs[24:], labels[24:]), (imgs[:24], labels[:24]), out,
          class_names=ds.class_names, verbose=False,
          aux_data=(aux_i, aux_s), aux_bce=True)
    model = FpgaCNN.from_artifacts(out)
    assert model.head_mode == "gap"
