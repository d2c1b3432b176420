"""Two-phase QAT training — the ``training/train_cnn.py`` role, in JAX/optax.

Phase 1 (float): train the 3-conv backbone + GAP linear head with Adam +
cosine LR, keeping the best-validation state (reference
``train_cnn.py:259-301``). The train step is a single pjit-able function:
batch sharded over the mesh's ``data`` axis, conv output channels and the fc
feature dim sharded over ``model`` (the RTL's 16-core axis lifted to chips).

Phase 2 (QAT head): freeze the backbone, quantise weights with the global
symmetric scale, extract bit-accurate fixed-point features through the SAME
contract implementation the inference engine uses (``ops.quant`` with the
24-bit wrap, reference ``train_cnn.py:101-116,303-334``), then fit the linear
head on those features.

Export: weights.bin + fc_weight/bias.npy + classes.json + test_image_*.bin —
byte-compatible with the reference bundle (``train_cnn.py:336-354``).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from functools import partial
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_cnn.models.cnn import (
    CLASS_NAMES,
    DEFAULT_SHIFTS,
    LAYER_CONFIGS,
    NUM_CLASSES,
    QUANT_MAX,
)
from tpu_cnn.ops import quant
from tpu_cnn.utils import artifacts as art
from tpu_cnn.utils import weights as weights_codec

Params = dict[str, Any]


@dataclasses.dataclass
class TrainConfig:
    layer_configs: tuple = LAYER_CONFIGS
    num_classes: int = NUM_CLASSES
    shifts: tuple = DEFAULT_SHIFTS
    epochs: int = 30
    batch_size: int = 64
    lr: float = 1e-3
    # 600 full-batch Adam steps is convergence-MARGINAL on hard feature
    # matrices (measured on the augmented realphoto backbone: 65% train at
    # 600 steps, 100%/97.9% val at 3000, overfit onset by 6000 — platform
    # fp noise flipped a 600-step fit between 97.8% and 65%). 3000 costs
    # microseconds at these head sizes and converges robustly.
    head_epochs: int = 3000
    head_lr: float = 0.01
    seed: int = 0
    # Beyond-reference export option: quantize each conv layer with its
    # OWN symmetric scale instead of the reference's single global one
    # (utils.weights.quantize_per_layer). Runtime contract unchanged.
    per_layer_scale: bool = False


def init_params(cfg: TrainConfig, key: jax.Array) -> Params:
    params: Params = {}
    keys = jax.random.split(key, len(cfg.layer_configs) + 1)
    for i, (ic, oc, _) in enumerate(cfg.layer_configs):
        fan_in = ic * 9
        params[f"conv{i}"] = (
            jax.random.normal(keys[i], (oc, ic, 3, 3), jnp.float32)
            * jnp.sqrt(2.0 / fan_in)
        )
    c_last = cfg.layer_configs[-1][1]
    params["fc_w"] = (
        jax.random.normal(keys[-1], (cfg.num_classes, c_last), jnp.float32)
        * jnp.sqrt(1.0 / c_last)
    )
    params["fc_b"] = jnp.zeros((cfg.num_classes,), jnp.float32)
    return params


def param_shardings(cfg: TrainConfig, mesh: Mesh) -> Params:
    """Model-axis shardings: conv oc and fc feature dim over 'model' — the
    tensor-parallel layout for the train step."""
    sh: Params = {}
    for i in range(len(cfg.layer_configs)):
        sh[f"conv{i}"] = NamedSharding(mesh, P("model", None, None, None))
    sh["fc_w"] = NamedSharding(mesh, P(None, "model"))
    sh["fc_b"] = NamedSharding(mesh, P())
    return sh


def float_forward(params: Params, images: jax.Array, n_layers: int,
                  compute_dtype=jnp.float32) -> jax.Array:
    """Float phase-1 network: conv3x3(SAME) -> relu -> maxpool, x N -> GAP ->
    linear. images: (B, S, S) float32 in [0, 1].

    ``compute_dtype=jnp.bfloat16`` is the TPU mixed-precision mode: params
    stay f32 (master weights — the optimizer state and updates keep full
    precision), conv inputs/kernels are cast to bf16 so the MXU runs at its
    native rate (the MXU accumulates bf16 products in f32 internally), and
    activations travel bf16 between layers (half the HBM traffic). The GAP
    + linear head runs f32. Forward and backward convs stay uniformly bf16
    — mixing a wider accumulator dtype into the HLO would break the conv
    transpose rule's dtype match.

    f32 requests ``Precision.HIGHEST`` explicitly: the TPU default would
    silently run the conv inputs at bf16, and a backbone trained under
    that noise quantizes BADLY in phase 2 (measured on the realphoto set:
    94.8% held-out from the true-f32 backbone vs 64.8% from a
    default-precision TPU run of the same protocol). bf16 remains the
    explicit opt-in (``--bf16``) with the QAT caveat documented there."""
    cdt = jnp.dtype(compute_dtype)
    prec = (jax.lax.Precision.HIGHEST if cdt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    x = images[..., None].astype(cdt)
    for i in range(n_layers):
        k = jnp.transpose(params[f"conv{i}"], (2, 3, 1, 0)).astype(cdt)  # HWIO
        x = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=prec,
        )
        x = jax.nn.relu(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))
    feats = x.astype(jnp.float32).mean(axis=(1, 2))  # GAP (B, C)
    return jnp.matmul(feats, params["fc_w"].T,
                      precision=jax.lax.Precision.HIGHEST) + params["fc_b"]


def fake_quant_convs(params: Params, n_layers: int,
                     per_layer: bool = False) -> Params:
    """Straight-through fake quantization of the conv kernels to the EXACT
    export grid (one global symmetric scale, quant_max clip — mirrors
    ``utils.weights.quantize_global`` / reference ``train_cnn.py:133-137``).

    The forward sees the dequantized int8 weights the inference engines
    will actually run; the backward passes gradients straight through the
    rounding (STE), so phase 1 optimizes the network AT its deployed
    weight precision and the float->int8 gap phase 2 must absorb shrinks
    to zero. Opt-in (``train_cnn --qat``); beyond-reference — the
    reference quantizes post-hoc."""
    convs = [params[f"conv{i}"] for i in range(n_layers)]
    absmax_all = jnp.maximum(
        jnp.stack([jnp.abs(c).max() for c in convs]).max(), 1e-8
    )
    out = dict(params)
    for i, w in enumerate(convs):
        absmax = (jnp.maximum(jnp.abs(w).max(), 1e-8) if per_layer
                  else absmax_all)
        scale = QUANT_MAX / absmax
        wq = jnp.clip(jnp.round(w * scale), -QUANT_MAX, QUANT_MAX) / scale
        out[f"conv{i}"] = w + jax.lax.stop_gradient(wq - w)
    return out


def loss_fn(params: Params, images, labels, n_layers: int,
            compute_dtype=jnp.float32, qat: bool = False,
            qat_per_layer: bool = False, soft_bce: bool = False):
    if qat:
        params = fake_quant_convs(params, n_layers, qat_per_layer)
    logits = float_forward(params, images, n_layers, compute_dtype)
    if labels.ndim == 2:
        # dense targets (one-hot singles + composites — the
        # --composite-frac co-presence lever); acc vs the dominant class.
        # soft_bce treats every class as an independent sigmoid presence
        # (multi-hot 1/1 composites) instead of splitting softmax mass
        # 0.5/0.5 — the canonical multi-label formulation.
        if soft_bce:
            loss = optax.sigmoid_binary_cross_entropy(logits, labels).mean()
        else:
            loss = optax.softmax_cross_entropy(logits, labels).mean()
        acc = (logits.argmax(-1) == labels.argmax(-1)).mean()
    else:
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()
        acc = (logits.argmax(-1) == labels).mean()
    return loss, acc


def _zero1_constrain(opt_state, mesh: Mesh):
    """ZeRO-1: pin every shardable optimizer-state leaf (Adam moments) to
    ``P("data")`` on its leading axis. That single annotation is the whole
    implementation — GSPMD partitions the elementwise moment update across
    the data shards and inserts the update all-gather before
    ``apply_updates``, so each device stores and updates only 1/D of the
    optimizer state (the scaling-book recipe: annotate, let XLA insert the
    collectives). Scalars and indivisible leaves stay replicated."""
    n_data = int(mesh.shape["data"])

    def c(x):
        if (hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] > 1
                and x.shape[0] % n_data == 0):
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P("data"))
            )
        return x

    return jax.tree.map(c, opt_state)


def make_train_step(cfg: TrainConfig, optimizer, mesh: Mesh | None = None,
                    *, microbatch: int = 4, remat: bool = False,
                    zero1: bool = False, compute_dtype: str = "float32",
                    qat: bool = False, qat_per_layer: bool | None = None,
                    soft_bce: bool = False):
    """Returns a jitted ``step(params, opt_state, images, labels) ->
    (params, opt_state, loss, acc)``. With a ``data``/``model`` mesh,
    inputs/params carry data/model shardings and XLA inserts the gradient
    psums over ICI; with a ``pipe`` mesh (``make_pipeline_mesh``), forward
    AND backward run as a GPipe pipeline with stage-sharded weights
    (``parallel/pipeline_train.py`` — gradients exactly equal); with a
    ``space`` mesh (``make_spatial_mesh``), image rows are sharded with
    halo exchange (``parallel/spatial_train.py``). ``zero1=True`` (pure-dp
    mesh only) additionally shards the optimizer state over ``data``
    (``_zero1_constrain``) — each device stores/updates 1/D of the Adam
    moments. ``compute_dtype="bfloat16"`` runs the conv math in bf16 with
    f32 master weights and f32 accumulation (``float_forward``)."""
    if compute_dtype != "float32" and mesh is not None and (
            "pipe" in mesh.axis_names or "space" in mesh.axis_names):
        raise ValueError(
            "bf16 compute is supported on the plain / data / model train "
            "steps; the pipe/space twins run f32"
        )
    if qat and mesh is not None and (
            "pipe" in mesh.axis_names or "space" in mesh.axis_names):
        raise ValueError(
            "qat=True (STE fake-quant) is supported on the plain / data / "
            "model train steps; the pipe/space twins run plain float"
        )
    if mesh is not None and "pipe" in mesh.axis_names:
        from tpu_cnn.parallel.pipeline_train import make_pipeline_train_step

        return make_pipeline_train_step(cfg, optimizer, mesh,
                                        microbatch=microbatch, remat=remat)
    if mesh is not None and "space" in mesh.axis_names:
        from tpu_cnn.parallel.spatial_train import make_spatial_train_step

        return make_spatial_train_step(cfg, optimizer, mesh)
    if zero1 and (mesh is None or "data" not in mesh.axis_names
                  or int(mesh.shape.get("model", 1)) != 1):
        raise ValueError(
            "zero1=True needs a pure data-parallel mesh (model axis 1) — "
            "moments follow the data axis, which conflicts with "
            "model-sharded params"
        )
    n_layers = len(cfg.layer_configs)
    cdt = jnp.dtype(compute_dtype)

    def step(params, opt_state, images, labels):
        if mesh is not None:
            images = jax.lax.with_sharding_constraint(
                images, NamedSharding(mesh, P("data"))
            )
            labels = jax.lax.with_sharding_constraint(
                labels, NamedSharding(mesh, P("data"))
            )
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, images, labels, n_layers, cdt, qat,
            cfg.per_layer_scale if qat_per_layer is None else qat_per_layer,
            soft_bce,
        )
        if zero1:
            opt_state = _zero1_constrain(opt_state, mesh)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        if zero1:
            opt_state = _zero1_constrain(opt_state, mesh)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    if mesh is None:
        return jax.jit(step)
    shardings = param_shardings(cfg, mesh)
    return jax.jit(
        step,
        in_shardings=(shardings, None, None, None),
        out_shardings=(shardings, None, None, None),
    )


def quantized_kernels(params: Params, cfg: TrainConfig):
    """int8 conv kernels + scale(s): the reference's single global
    symmetric scale, or per-layer scales when cfg.per_layer_scale."""
    floats = [np.asarray(params[f"conv{i}"]) for i in range(len(cfg.layer_configs))]
    if cfg.per_layer_scale:
        return weights_codec.quantize_per_layer(floats, QUANT_MAX)
    return weights_codec.quantize_global(floats, QUANT_MAX)


def extract_qat_features(params: Params, images: np.ndarray, cfg: TrainConfig,
                         batch_size: int = 256) -> np.ndarray:
    """Bit-accurate fixed-point GAP features (B, C_last) float32 in [0, 255]
    — the reference's phase-2 feature extractor (``train_cnn.py:154-170``),
    running through the production contract with the 24-bit wrap."""
    q_kernels, _ = quantized_kernels(params, cfg)
    kj = [jnp.asarray(k) for k in q_kernels]
    shifts = jnp.asarray(cfg.shifts, jnp.int32)

    @jax.jit
    def f(x_u8):
        feats = quant.cnn_forward(x_u8, kj, shifts, accum_wrap=True)
        return feats.astype(jnp.float32).mean(axis=2)  # GAP over spatial

    out = []
    for s in range(0, len(images), batch_size):
        chunk = images[s : s + batch_size]
        x_u8 = jnp.asarray(np.round(chunk * 255.0).astype(np.uint8))
        out.append(np.asarray(f(x_u8)))
    return np.concatenate(out) if out else np.zeros((0, cfg.layer_configs[-1][1]))


def fit_head(features: np.ndarray, labels: np.ndarray, cfg: TrainConfig,
             val_frac: float = 0.15, verbose: bool = True,
             max_chunks: int = 10):
    """Adam-fit the linear head on frozen features (``train_cnn.py:320-334``).

    Runs ``cfg.head_epochs`` full-batch steps per chunk and keeps going
    (up to ``max_chunks``) while the train CE still improves: feature
    matrices from different backbones differ wildly in conditioning, and
    a fixed step count measured fragile — the same 600 steps landed at
    65% train on one backbone's features and 100% on another's (ROADMAP
    round-3 second half, finding b). Returns the chunk-boundary weights
    with the BEST internal-val accuracy, so running long cannot overfit
    past the best point (overfit onset measured around 6k steps on the
    augmented realphoto features)."""
    n = len(features)
    rng = np.random.RandomState(cfg.seed)
    idx = rng.permutation(n)
    n_val = max(1, int(n * val_frac))
    vi, ti = idx[:n_val], idx[n_val:]
    X, y = jnp.asarray(features[ti]), jnp.asarray(labels[ti].astype(np.int32))
    Xv, yv = jnp.asarray(features[vi]), jnp.asarray(labels[vi].astype(np.int32))

    d = features.shape[1]
    w = jnp.zeros((cfg.num_classes, d), jnp.float32)
    b = jnp.zeros((cfg.num_classes,), jnp.float32)
    opt = optax.adam(cfg.head_lr)
    state = opt.init((w, b))

    @jax.jit
    def train_scan(w, b, state):
        def step(carry, _):
            w, b, state = carry

            def loss(p):
                # HIGHEST: features span [0, 255]; the TPU default bf16
                # matmul underfits this head (same failure class as
                # float_forward's precision note)
                logits = jnp.matmul(
                    X, p[0].T, precision=jax.lax.Precision.HIGHEST
                ) + p[1]
                return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

            g = jax.grad(loss)((w, b))
            updates, state = opt.update(g, state, (w, b))
            (w, b) = optax.apply_updates((w, b), updates)
            return (w, b, state), None

        (w, b, state), _ = jax.lax.scan(step, (w, b, state), None,
                                        length=cfg.head_epochs)
        return w, b, state

    hp = jax.lax.Precision.HIGHEST

    @jax.jit
    def train_loss(w, b):
        logits = jnp.matmul(X, w.T, precision=hp) + b
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    @jax.jit
    def val_acc(w, b):
        return ((jnp.matmul(Xv, w.T, precision=hp) + b)
                .argmax(-1) == yv).mean()

    # stop on the LOSS with patience 2, not accuracy: argmax accuracy can
    # sit on long plateaus while CE still descends, and the CE trajectory
    # itself can stall a full chunk before escaping (both measured on the
    # QAT-backbone features: accuracy flat near 50% for thousands of
    # steps, one ~flat 3000-step CE chunk, then 95%+). The returned head
    # is the chunk-boundary best-val one — the reference trainer's
    # best-val selection, applied at our granularity.
    prev, flat = float("inf"), 0
    best = (-1.0, w, b)
    for _ in range(max(1, max_chunks)):
        w, b, state = train_scan(w, b, state)
        va = float(val_acc(w, b))
        if va > best[0]:
            best = (va, w, b)
        cur = float(train_loss(w, b))
        flat = flat + 1 if prev - cur < 1e-4 else 0
        if flat >= 2:  # converged (or fully fit)
            break
        prev = cur
    _, w, b = best
    if verbose:
        va = float(val_acc(w, b))
        ta = float(((jnp.matmul(X, w.T, precision=hp) + b)
                    .argmax(-1) == y).mean())
        print(f"  head: train {ta * 100:.1f}%  val {va * 100:.1f}%")
    return np.asarray(w), np.asarray(b)


def export_test_images(images: np.ndarray, labels: np.ndarray, out_dir: str,
                       num_per_class: int = 10, num_classes: int = NUM_CLASSES):
    """Raw 128x128 .bin exports named test_image_N_classC.bin
    (``train_cnn.py:199-216``)."""
    os.makedirs(out_dir, exist_ok=True)
    counts: dict[int, int] = {}
    exported = 0
    for img, label in zip(images, labels):
        c = int(label)
        if counts.get(c, 0) >= num_per_class:
            continue
        counts[c] = counts.get(c, 0) + 1
        raw = np.round(img * 255.0).astype(np.uint8)
        raw.tofile(os.path.join(out_dir, f"test_image_{exported}_class{c}.bin"))
        exported += 1
        if all(counts.get(j, 0) >= num_per_class for j in range(num_classes)):
            break
    return exported


def _lookahead(it, depth: int = 2):
    """Pull ``depth`` items ahead of the consumer so the (asynchronous)
    device placement of item k+1 starts while step k computes."""
    from collections import deque

    q: deque = deque()
    for item in it:
        q.append(item)
        if len(q) >= depth:
            yield q.popleft()
    while q:
        yield q.popleft()


def _prefetch_to_device(host_batches, depth: int = 2):
    """Stage host batches on the device ``depth`` ahead of consumption.

    ``jax.device_put`` is asynchronous — it returns with the H2D transfer in
    flight — so the copy of batch k+1 overlaps step k's compute instead of
    serializing behind it. Through this harness's relay a synchronous
    dispatch costs ~30 ms (CLAUDE.md), which a per-step ``jnp.asarray``
    would pay in full; on real hardware the same pattern hides PCIe/DMA
    latency. Labels are cast to int32 on the host (free) before staging."""
    return _lookahead(
        (jax.device_put((bi, bl.astype(np.int32))) for bi, bl in host_batches),
        depth,
    )


def train(cfg: TrainConfig, train_data, val_data, out_dir: str,
          class_names=None, mesh: Mesh | None = None, verbose: bool = True,
          checkpoint_path: str | None = None, resume: bool = False,
          microbatch: int = 4, remat: bool = False, zero1: bool = False,
          compute_dtype: str = "float32", grad_accum: int = 1,
          augment: bool = False, qat: bool = False, aux_data=None,
          aux_bce: bool = False):
    """Full two-phase pipeline. ``train_data``/``val_data`` are
    (images (N, S, S) f32 [0,1], labels (N,)) tuples. Returns the exported
    ArtifactBundle.

    ``aux_data`` = (images (M, S, S) f32, soft_targets (M, K) f32): extra
    PHASE-1-ONLY frames with dense soft targets (``data.soft_composites``
    — the co-presence lever). Phase-1 batches mix them with the one-hot
    singles under ``optax.softmax_cross_entropy``; phase 2, best-val
    selection, and export see only the clean single-label data.
    ``aux_bce=True`` switches the dense-target phase-1 loss to per-class
    sigmoid BCE and binarizes the composite targets to multi-hot 1/1 —
    presence of one class no longer competes for softmax mass with the
    other (the multi-label formulation the deployed presence head uses)."""
    from tpu_cnn.train.data import batches

    class_names = list(class_names or CLASS_NAMES[: cfg.num_classes])
    imgs_t, labels_t = train_data
    imgs_v, labels_v = val_data
    imgs_p1, labels_p1 = imgs_t, labels_t
    if aux_data is not None:
        aux_imgs, aux_soft = aux_data
        aux_soft = np.asarray(aux_soft, np.float32)
        if aux_bce:
            aux_soft = (aux_soft > 0).astype(np.float32)
        onehot = np.eye(cfg.num_classes, dtype=np.float32)[
            np.asarray(labels_t, int)]
        imgs_p1 = np.concatenate([imgs_t, np.asarray(aux_imgs, np.float32)])
        labels_p1 = np.concatenate([onehot, aux_soft])

    # multi-host: >1 OS process joined via parallel.multihost.init_multihost.
    # The step function and mesh are unchanged — only the feeding differs
    # (per-process local shards lifted to global arrays) and host-side
    # singletons (prints, .npz snapshots, bundle export) run on the primary.
    multihost = jax.process_count() > 1
    if multihost:
        from tpu_cnn.parallel import multihost as mh

        if mesh is None or "data" not in mesh.axis_names or int(
                mesh.shape.get("model", 1)) != 1 or any(
                a in mesh.axis_names for a in ("pipe", "space")):
            raise ValueError(
                "multi-host training currently rides pure data parallelism "
                "— pass a data-only mesh (model/pipe/space axes are "
                "single-process features for now)"
            )
        if cfg.batch_size % jax.device_count():
            raise ValueError(
                f"batch_size {cfg.batch_size} must divide by the GLOBAL "
                f"device count {jax.device_count()} (the data axis spans "
                "every chip of every host)"
            )
        from jax.experimental import multihost_utils

        # global_batches slices EQUAL per-process shares — refuse an
        # uneven topology up front instead of mis-sharding at step 1
        counts = np.asarray(multihost_utils.process_allgather(
            jnp.asarray([jax.local_device_count()], jnp.int32)
        )).ravel()
        if int(counts.min()) != int(counts.max()):
            raise ValueError(
                "multi-host training needs a homogeneous topology (equal "
                f"local device counts per host; saw {counts.tolist()})"
            )
        if zero1 and checkpoint_path and checkpoint_path.endswith(".npz"):
            raise ValueError(
                "multi-host + --zero1 shards the optimizer state across "
                "hosts; a single-file .npz snapshot cannot hold it — use "
                "an orbax checkpoint DIR (each host writes its shards)"
            )
        verbose = verbose and mh.is_primary()

    key = jax.random.PRNGKey(cfg.seed)
    params = init_params(cfg, key)
    # The schedule is stepped once per optimizer update (per BATCH), so the
    # cosine must span epochs * steps_per_epoch — not epochs — or LR hits 0
    # after ~2 epochs and the rest of the run makes zero-magnitude updates.
    steps_per_epoch = max(1, len(imgs_p1) // cfg.batch_size)
    # with gradient accumulation the inner optimizer (and so the schedule)
    # steps once per EFFECTIVE batch, not per microstep
    updates_per_epoch = max(1, steps_per_epoch // max(1, grad_accum))
    optimizer = optax.chain(
        optax.scale_by_adam(),
        optax.scale_by_schedule(
            optax.cosine_decay_schedule(1.0, max(cfg.epochs, 1) * updates_per_epoch)
        ),
        optax.scale(-cfg.lr),
    )
    if grad_accum > 1:
        # optax.MultiSteps: accumulate k gradients, apply one update —
        # k x the effective batch without k x the activation memory
        optimizer = optax.MultiSteps(optimizer, every_k_schedule=grad_accum)
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, optimizer, mesh, microbatch=microbatch,
                           remat=remat, zero1=zero1,
                           compute_dtype=compute_dtype, qat=qat,
                           soft_bce=aux_bce)
    n_layers = len(cfg.layer_configs)

    @jax.jit
    def eval_acc(params, images, labels):
        # best-val selection must measure the net that DEPLOYS: under
        # --qat that is the fake-quantized one
        p = (fake_quant_convs(params, n_layers, cfg.per_layer_scale)
             if qat else params)
        logits = float_forward(p, images, n_layers)
        return (logits.argmax(-1) == labels).mean()

    rng = np.random.RandomState(cfg.seed)
    best_acc, best_params = -1.0, params
    start_epoch = 1
    # preemption safety: SIGTERM (the cluster-manager eviction signal)
    # finishes the CURRENT epoch, writes the per-epoch checkpoint as usual,
    # and returns cleanly for a later --resume — instead of dying mid-step
    # with a torn run. Signal handlers only install from the main thread
    # (serving/test harnesses may train from workers); phase 2 is skipped
    # on preemption (the bundle export belongs to the resumed run).
    import signal
    import threading

    preempted = threading.Event()
    _old_sigterm = None
    if threading.current_thread() is threading.main_thread():
        _old_sigterm = signal.signal(
            signal.SIGTERM, lambda signum, frame: preempted.set()
        )
    try:

        # .npz -> single-file host snapshot; any other path -> orbax sharded
        # checkpoint dir (async, per-shard, retention — checkpoint_sharded.py)
        sharded_ckpt = None
        if checkpoint_path and not checkpoint_path.endswith(".npz"):
            from tpu_cnn.train.checkpoint_sharded import ShardedCheckpointer

            sharded_ckpt = ShardedCheckpointer(checkpoint_path)
        if resume and checkpoint_path:
            if sharded_ckpt is not None and sharded_ckpt.latest() is not None:
                params, opt_state, done_epoch, best_acc, best_params = (
                    sharded_ckpt.restore(params, opt_state)
                )
                # decommit to host so the jitted step's explicit shardings can
                # re-place the leaves (restore commits to the template devices;
                # one-time cost at resume — per-epoch SAVES stay per-shard)
                params, opt_state, best_params = jax.tree.map(
                    np.asarray, (params, opt_state, best_params)
                )
                start_epoch = done_epoch + 1
                if verbose:
                    print(f"Resumed from {checkpoint_path} (sharded) at epoch "
                          f"{done_epoch} (best val {best_acc * 100:.1f}%)")
            elif sharded_ckpt is None and os.path.exists(checkpoint_path):
                from tpu_cnn.train import checkpoint as ckpt

                params, opt_state, done_epoch, best_acc, best_params = (
                    ckpt.load_checkpoint(checkpoint_path, params, opt_state)
                )
                start_epoch = done_epoch + 1
                if verbose:
                    print(f"Resumed from {checkpoint_path} at epoch {done_epoch} "
                          f"(best val {best_acc * 100:.1f}%)")
        if multihost:
            # resume consensus: only the primary WRITES .npz snapshots, so a
            # per-host local disk can make the file visible to some ranks
            # only — divergent start epochs would hang the per-epoch
            # collectives (each rank would run a different iteration count)
            from jax.experimental import multihost_utils

            seen = np.asarray(multihost_utils.process_allgather(
                jnp.asarray([start_epoch], jnp.int32)
            )).ravel()
            if int(seen.min()) != int(seen.max()):
                raise RuntimeError(
                    "resume desync: ranks disagree on the checkpoint state "
                    f"(start epochs {sorted(set(seen.tolist()))}) — put the "
                    "checkpoint on storage visible to every host (or copy it "
                    "to each) before --resume"
                )
        if verbose:
            aux_n = len(imgs_p1) - len(imgs_t)
            print(f"Phase 1: float training ({cfg.epochs} epochs, "
                  f"{len(imgs_t)} train"
                  + (f" + {aux_n} soft composites" if aux_n else "")
                  + f" / {len(imgs_v)} val)")
        # the val set is fixed — upload it once, not once per epoch
        imgs_v_d = jnp.asarray(imgs_v)
        labels_v_d = jnp.asarray(labels_v.astype(np.int32))
        epoch = start_epoch - 1  # stays if SIGTERM lands before the first epoch
        for epoch in range(start_epoch, cfg.epochs + 1):
            losses, accs = [], []
            host_stream = batches(imgs_p1, labels_p1, cfg.batch_size, rng)
            if augment:
                from tpu_cnn.train.data import augment_batch

                # same shared-seed rng as the permutation: multihost processes
                # stay in lockstep, and phase 2 / eval see clean images only.
                # (Under multihost every rank augments the full global batch
                # before slicing — O(global batch) host work per rank, kept
                # deliberately: the rng stream must stay identical across
                # ranks, and the per-image pad/crop is microseconds at these
                # sizes.)
                host_stream = (
                    (augment_batch(bi, rng), bl) for bi, bl in host_stream
                )
            if multihost:
                # every process walks the SAME permutation (shared seed) and
                # contributes its slice of each global batch; XLA inserts the
                # cross-host gradient psum over DCN. Staged one ahead so the
                # global-array assembly overlaps the previous step.
                feed = _lookahead(mh.global_batches(mesh, host_stream))
            else:
                feed = _prefetch_to_device(host_stream)
            for bi, bl in feed:
                params, opt_state, loss, acc = step(params, opt_state, bi, bl)
                # keep the metrics as device scalars — a per-step float() would
                # block the dispatch pipeline on every step (one round-trip per
                # batch); ONE coalesced fetch happens at epoch end
                losses.append(loss)
                accs.append(acc)
            losses, accs = jax.device_get((losses, accs))
            # under multihost the dp params are fully replicated: decommit to
            # host so eval (and phase 2) run as plain LOCAL jits on every
            # process instead of global programs
            eval_params = jax.tree.map(np.asarray, params) if multihost else params
            vacc = float(eval_acc(eval_params, imgs_v_d, labels_v_d))
            if vacc > best_acc:
                best_acc = vacc
                best_params = (eval_params if multihost
                               else jax.tree.map(lambda x: x, params))
            if sharded_ckpt is not None:
                sharded_ckpt.save(epoch, params, opt_state, best_acc, best_params)
            elif checkpoint_path and (not multihost or mh.is_primary()):
                from tpu_cnn.train import checkpoint as ckpt

                ckpt.save_checkpoint(checkpoint_path, params, opt_state, epoch,
                                     best_acc, best_params)
            if verbose:
                print(f"  epoch {epoch:3d}: loss {np.mean(losses):.3f}  "
                      f"train {np.mean(accs) * 100:.1f}%  val {vacc * 100:.1f}%")
            if multihost:
                # consensus: cluster managers usually signal every host, but a
                # rank that stops ALONE would hang the others' next collective
                # — take the OR of the flag across processes, so everyone
                # breaks (and checkpoints) together
                from jax.experimental import multihost_utils

                flag = multihost_utils.process_allgather(
                    jnp.asarray([1 if preempted.is_set() else 0], jnp.int32)
                )
                if int(np.asarray(flag).max()):
                    preempted.set()
            if preempted.is_set():
                break
    finally:
        # ALWAYS restore the previous SIGTERM disposition — an
        # epoch-loop exception must not leave the process
        # permanently swallowing the cluster manager's signal
        if _old_sigterm is not None:
            signal.signal(signal.SIGTERM, _old_sigterm)
    if sharded_ckpt is not None:
        sharded_ckpt.close()
    if preempted.is_set():
        if verbose:
            where = checkpoint_path or "(no --checkpoint given!)"
            print(f"SIGTERM: stopped after epoch {epoch}, state in {where} "
                  f"— re-run with --resume to continue")
        return None
    params = best_params
    if verbose:
        print(f"  best val acc: {best_acc * 100:.1f}%")
        print("Phase 2: head on bit-accurate quantized features")

    feats_t = extract_qat_features(params, imgs_t, cfg)
    fc_w, fc_b = fit_head(
        np.concatenate([feats_t]), np.concatenate([labels_t]), cfg, verbose=verbose
    )

    q_kernels, scale = quantized_kernels(params, cfg)
    # persist the training shifts: the QAT features (and so the exported
    # head) are only valid at the register setting they were trained at
    bundle = art.ArtifactBundle(q_kernels, fc_w, fc_b, class_names,
                                shifts=[int(s) for s in cfg.shifts])
    if multihost and not mh.is_primary():
        return bundle  # every process computes it; one process writes it
    art.save_bundle(out_dir, bundle)
    n_exp = export_test_images(imgs_v, labels_v, out_dir,
                               num_per_class=10, num_classes=cfg.num_classes)
    if verbose:
        nbytes = sum(k.size for k in q_kernels)
        scale_s = (", ".join(f"{s:.2f}" for s in scale)
                   if isinstance(scale, list) else f"{scale:.2f}")
        print(f"Exported: weights.bin ({nbytes} B, scale={scale_s}), "
              f"fc {fc_w.shape}, {n_exp} test images -> {out_dir}/")
    return bundle


def main(argv=None):
    p = argparse.ArgumentParser(description="Train the FPGA-contract CNN (JAX)")
    p.add_argument("--synthetic", action="store_true",
                   help="train on the procedural shapes dataset")
    p.add_argument("--image-folder", default=None,
                   help="<root>/<class>/* image-folder dataset")
    p.add_argument("--bin-folder", default=None,
                   help="flat dir of raw *_class<C>.bin images "
                        "(the reference's test-image format)")
    p.add_argument("--val-bin-folder", default=None,
                   help="held-out bin dir (with --bin-folder); otherwise a "
                        "1/6 split of the training set is held out")
    p.add_argument("--train-images", default=None, help="COCO train image dir")
    p.add_argument("--train-ann", default=None, help="COCO train annotations")
    p.add_argument("--val-images", default=None)
    p.add_argument("--val-ann", default=None)
    p.add_argument("--max-per-class", type=int, default=5000)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0,
                   help="init/permutation/augment/composite RNG seed — "
                        "vary it for run-to-run variance studies (the "
                        "reference trainer is single-seed, "
                        "training/train_cnn.py:259)")
    p.add_argument("--output-dir", default="artifacts/generated")
    p.add_argument("--checkpoint", default=None,
                   help="per-epoch checkpoints: a *.npz path for a "
                        "single-file host snapshot, any other path for an "
                        "orbax sharded checkpoint DIR (async per-shard "
                        "saves, keeps last 2 epochs — pairs with "
                        "--zero1/--mesh sharded state)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--variant", default="lyr3-std",
                   help="model variant from models.registry (geometry)")
    p.add_argument("--shifts", default=None,
                   help="comma list of per-layer ReLU shifts to train the "
                        "QAT phase at (default: the variant ladder). "
                        "Exported to the bundle's shifts.json.")
    p.add_argument("--mesh", default=None, metavar="DxM",
                   help="train over a device mesh: 'DATAxMODEL' device "
                        "counts (e.g. '4x2': batch sharded over 4, conv "
                        "oc + fc feature dim over 2) or a plain count for "
                        "pure data parallelism. Uses the first DATA*MODEL "
                        "of jax.devices().")
    p.add_argument("--pipeline", default=None, metavar="[DxS|S]",
                   help="train as a GPipe pipeline over S stage devices "
                        "(forward AND backward pipelined, stage-sharded "
                        "weights; gradients exactly equal the plain step's). "
                        "'DxS' composes with data parallelism: D independent "
                        "pipelines, batch sharded across them.")
    p.add_argument("--microbatch", type=int, default=4,
                   help="pipeline microbatch size (with --pipeline); "
                        "batch-size must be a multiple of D x this")
    p.add_argument("--bf16", action="store_true",
                   help="mixed precision: bf16 conv math on the MXU with "
                        "f32 master weights and f32 accumulation")
    p.add_argument("--grad-accum", type=int, default=1, metavar="K",
                   help="accumulate K gradients per optimizer update "
                        "(optax.MultiSteps): K x the effective batch "
                        "without K x the memory")
    p.add_argument("--zero1", action="store_true",
                   help="with --mesh D (pure dp): shard the optimizer "
                        "state over the data axis (ZeRO-1) — each device "
                        "stores/updates 1/D of the Adam moments; GSPMD "
                        "inserts the update all-gather")
    p.add_argument("--remat", action="store_true",
                   help="with --pipeline: rematerialise stage activations "
                        "in the backward (jax.checkpoint per stage) — "
                        "GPipe + remat, trading one extra stage forward "
                        "for O(depth) less live activation memory")
    p.add_argument("--spatial", default=None, metavar="[DxN|N]",
                   help="train with image ROWS sharded over N devices "
                        "(ppermute halo exchange per conv layer, forward "
                        "and backward). 'DxN' composes with data "
                        "parallelism. Every layer's row count must divide "
                        "by 2xN.")
    p.add_argument("--per-layer-scale", action="store_true",
                   help="quantize each conv layer with its OWN symmetric "
                        "scale at export (beyond-reference; the reference "
                        "uses one global scale, which lets the largest-|w| "
                        "layer squeeze every other layer's int8 precision "
                        "— the shift register absorbs the gain, so the "
                        "runtime contract is unchanged)")
    p.add_argument("--qat", action="store_true",
                   help="quantization-aware phase 1: conv kernels are STE "
                        "fake-quantized to the exact export int8 grid "
                        "every step, so training optimizes the deployed "
                        "precision (the reference quantizes post-hoc)")
    p.add_argument("--augment", action="store_true",
                   help="train-time augmentation (host-side random h-flip "
                        "+ ±4 px edge-padded translation per image; "
                        "phase-2 QAT features stay clean). The reference "
                        "trainer has no augmentation — opt-in.")
    p.add_argument("--composite-frac", type=float, default=0.0,
                   help="phase-1 co-presence lever: add this fraction of "
                        "the training set as 2-object soft-label "
                        "composites (data.soft_composites — 0.5/0.5 "
                        "targets; phase 2 and eval stay single-label). "
                        "Teaches the backbone to keep two classes' "
                        "evidence alive in one frame — the measured "
                        "ceiling of every presence head on single-label "
                        "features (docs/ROADMAP.md Round 5).")
    p.add_argument("--composite-loss", default="ce", choices=("ce", "bce"),
                   help="phase-1 loss for the dense targets when "
                        "--composite-frac > 0: 'ce' splits softmax mass "
                        "0.5/0.5 across the two classes; 'bce' scores "
                        "every class as an independent sigmoid presence "
                        "(multi-hot 1/1 composites — the deployed "
                        "presence head's formulation).")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="multi-host training: process 0's coordination "
                        "address (jax.distributed). Run the SAME command "
                        "on every host with its own --process-id.")
    p.add_argument("--num-processes", type=int, default=1,
                   help="total number of host processes in the job")
    p.add_argument("--process-id", type=int,
                   default=int(os.environ.get("TPU_CNN_PROCESS_ID", "0")),
                   help="this host's rank (env TPU_CNN_PROCESS_ID)")
    args = p.parse_args(argv)

    from tpu_cnn.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # resumed runs skip the train-step recompile

    if args.num_processes > 1:
        if not args.coordinator:
            p.error("--num-processes > 1 needs --coordinator HOST:PORT")
        if args.pipeline or args.spatial:
            p.error("multi-host rides pure data parallelism — "
                    "--pipeline/--spatial are single-process features")
        from tpu_cnn.parallel.multihost import init_multihost

        # must precede the first device query: the distributed runtime
        # swaps in the global device list
        init_multihost(args.coordinator, args.num_processes, args.process_id)
        print(f"process {args.process_id}/{args.num_processes}: "
              f"{jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")

    from tpu_cnn.models.registry import default_shifts, get_config

    vcfg = get_config(args.variant)
    train_shifts = (tuple(int(s) for s in args.shifts.split(","))
                    if args.shifts else tuple(default_shifts(vcfg)))
    if len(train_shifts) != len(vcfg.layer_configs):
        p.error(f"--shifts needs {len(vcfg.layer_configs)} values")
    cfg = TrainConfig(
        layer_configs=vcfg.layer_configs,
        shifts=train_shifts,
        epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        seed=args.seed, per_layer_scale=args.per_layer_scale,
    )
    from tpu_cnn.train import data as D

    img_size = cfg.layer_configs[0][2]
    explicit_val = None
    if args.bin_folder:
        ds = D.BinFolderDataset(args.bin_folder, img_size=img_size,
                                max_per_class=args.max_per_class)
        imgs, labels = ds.arrays()
        names = ds.class_names
        if args.val_bin_folder:
            vds = D.BinFolderDataset(args.val_bin_folder, class_names=names,
                                     img_size=img_size)
            explicit_val = vds.arrays()
    elif args.image_folder:
        ds = D.ImageFolderDataset(args.image_folder, img_size=img_size,
                                  max_per_class=args.max_per_class)
        imgs, labels = ds.arrays()
        names = ds.class_names
    elif args.train_images and args.train_ann:
        ds = D.CocoClassification(args.train_images, args.train_ann,
                                  img_size=img_size,
                                  max_per_class=args.max_per_class)
        imgs, labels = ds.arrays()
        names = ds.class_names
    else:
        if not args.synthetic:
            print("No dataset given — using --synthetic shapes.")
        ds = D.SyntheticShapes(n_per_class=max(50, args.max_per_class // 25),
                               img_size=img_size)
        imgs, labels = ds.arrays()
        names = ds.class_names

    if explicit_val is not None:
        train_split, val_split = (imgs, labels), explicit_val
    else:
        n_val = max(len(imgs) // 6, cfg.num_classes)
        train_split = (imgs[n_val:], labels[n_val:])
        val_split = (imgs[:n_val], labels[:n_val])
    mesh = None
    if sum(bool(v) for v in (args.mesh, args.pipeline, args.spatial)) > 1:
        p.error("--mesh, --pipeline, and --spatial are mutually exclusive")
    if args.num_processes > 1 and not args.mesh:
        # default: pure dp over every chip of every host
        args.mesh = str(jax.device_count())
    if args.mesh:
        from tpu_cnn.parallel.mesh import make_mesh

        if "x" in args.mesh:
            d, m = (int(v) for v in args.mesh.lower().split("x"))
        else:
            d, m = int(args.mesh), 1
        mesh = make_mesh(d * m, model_axis=m)
        if cfg.batch_size % d:
            p.error(f"--batch-size {cfg.batch_size} must be a multiple of "
                    f"the data axis ({d})")
        print(f"Mesh: {d} data x {m} model over {d * m} devices")
    elif args.pipeline:
        from tpu_cnn.parallel.pipeline import make_pipeline_mesh

        if "x" in args.pipeline:
            d, s = (int(v) for v in args.pipeline.lower().split("x"))
        else:
            d, s = 1, int(args.pipeline)
        mesh = make_pipeline_mesh(d * s, data_axis=d)
        if cfg.batch_size % (d * args.microbatch):
            p.error(f"--batch-size {cfg.batch_size} must be a multiple of "
                    f"data axis x microbatch ({d} x {args.microbatch})")
        print(f"Pipeline: {d} data x {s} stages over {d * s} devices "
              f"(microbatch {args.microbatch})")
    elif args.spatial:
        from tpu_cnn.parallel.spatial import (
            check_spatial_split, make_spatial_mesh,
        )

        if "x" in args.spatial:
            d, s = (int(v) for v in args.spatial.lower().split("x"))
        else:
            d, s = 1, int(args.spatial)
        check_spatial_split(img_size, len(cfg.layer_configs), s)
        mesh = make_spatial_mesh(d * s, data_axis=d)
        if cfg.batch_size % d:
            p.error(f"--batch-size {cfg.batch_size} must be a multiple of "
                    f"the data axis ({d})")
        print(f"Spatial: {d} data x {s} row shards over {d * s} devices")

    aux = None
    if args.composite_frac > 0:
        n_aux = int(round(args.composite_frac * len(train_split[0])))
        aux = D.soft_composites(train_split[0], train_split[1], n_aux,
                                seed=cfg.seed, img_size=img_size)
        print(f"Composites: {n_aux} 2-object soft-label frames "
              f"(--composite-frac {args.composite_frac:g})")
    train(cfg, train_split, val_split,
          args.output_dir, class_names=names,
          checkpoint_path=args.checkpoint, resume=args.resume, mesh=mesh,
          microbatch=args.microbatch, remat=args.remat, zero1=args.zero1,
          compute_dtype="bfloat16" if args.bf16 else "float32",
          grad_accum=args.grad_accum, augment=args.augment, qat=args.qat,
          aux_data=aux, aux_bce=args.composite_loss == "bce")


if __name__ == "__main__":
    main()
