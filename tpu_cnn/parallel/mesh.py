"""Multi-chip scaling over a jax.sharding Mesh.

The reference is a single-chip system whose only "interconnect" is the Zynq
AXI fabric (SURVEY.md §2.5); its parallelism axes are intra-datapath. On TPU
the new scaling axis is the device mesh:

  * ``data``  — frames sharded across chips (the production axis: inference
    is embarrassingly batch-parallel; XLA keeps every collective off the
    critical path).
  * ``model`` — output-channel / feature-dim sharding (the 16-core
    output-channel parallelism of the RTL, SURVEY.md §2.1 #1, lifted to the
    chip level). Conv kernels shard over oc; the fc head shards over its
    feature dim; XLA inserts the psum/all-gathers over ICI.

Everything is expressed with NamedSharding constraints under ``jax.jit`` —
no manual collectives; XLA chooses ICI-optimal ones.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_cnn.ops import detect_head, quant


def make_mesh(
    n_devices: int | None = None,
    model_axis: int = 1,
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh over available devices.

    ``model_axis`` > 1 carves that many devices into the model axis (must
    divide n_devices); the rest go to data parallelism.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if n_devices % model_axis:
        raise ValueError(f"model_axis {model_axis} must divide {n_devices}")
    grid = devices.reshape(n_devices // model_axis, model_axis)
    return Mesh(grid, axis_names=("data", "model"))


def shard_batch(mesh: Mesh, images: jax.Array, all_axes: bool = False) -> jax.Array:
    """Place a host batch onto the mesh, sharded over the data axis (or over
    every axis flattened, for the pure-DP megakernel path)."""
    spec = P(tuple(mesh.axis_names)) if all_axes else P("data")
    return jax.device_put(images, NamedSharding(mesh, spec))


def _constrain(mesh: Mesh, x: jax.Array, spec: P) -> jax.Array:
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def sharded_forward(
    mesh: Mesh,
    kernels: Sequence[jax.Array],
    *,
    compute_dtype: str = "float32",
):
    """Returns a jitted ``f(images, shifts) -> (B, C, S*S) u8`` running
    data-parallel over the mesh with oc-sharded conv weights."""

    kernels_sharded = [
        jax.device_put(k, NamedSharding(mesh, P("model", None, None, None)))
        for k in kernels
    ]

    @partial(jax.jit, static_argnames=())
    def forward(images, shifts):
        x = _constrain(mesh, images, P("data"))
        x = x if x.ndim == 4 else x[..., None]
        for i, k in enumerate(kernels_sharded):
            x = quant.fixed_point_conv_layer(
                x, k, shifts[i], compute_dtype=compute_dtype
            )
            # activations: batch over data, channels over model
            x = _constrain(mesh, x, P("data", None, None, "model"))
        b, h, w, c = x.shape
        feats = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, c, h * w)
        return _constrain(mesh, feats, P("data", "model", None))

    return forward


def _all_axes(mesh: Mesh) -> tuple[str, ...]:
    return tuple(mesh.axis_names)


def sharded_forward_mega(mesh: Mesh, kernels: Sequence[jax.Array]):
    """The PRODUCTION megakernel under the mesh via ``jax.shard_map``:
    pure batch sharding over EVERY device (data and model axes flattened —
    the megakernel is one fused Pallas program, so the RTL-style oc model
    split doesn't apply inside it). Returns a jitted
    ``f(images, shifts) -> (B, C, S'*S') u8``.

    This is SURVEY.md §2.5's "batch-sharding across chips" applied to the
    datapath that actually ships — the reference analogue being that its
    only datapath (``rtl/core/cnn_acc_top.v``) is the one that scales."""
    from tpu_cnn.ops import pallas_poly

    axes = _all_axes(mesh)
    kernels = [jnp.asarray(k) for k in kernels]

    def per_shard(images, shifts):
        return pallas_poly.cnn_forward_mega(images, kernels, shifts)

    # check_vma=False: pallas_call outputs carry no varying-mesh-axis info
    fn = jax.shard_map(
        per_shard, mesh=mesh, in_specs=(P(axes), P()), out_specs=P(axes),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_detect_mega(
    mesh: Mesh,
    kernels: Sequence[jax.Array],
    fc_weight: jax.Array,
    fc_bias: jax.Array,
    head_mode: str = "bins",
    img_size: int = 128,
    box_mode: str = "ref",
    bbox_weight=None,
):
    """Fused megakernel CNN + head under the mesh (shard_map over all
    devices). With the bins head, the head's pooling stays fused in the
    kernel epilogue exactly as on one chip."""
    from tpu_cnn.ops import pallas_poly

    axes = _all_axes(mesh)
    kernels = [jnp.asarray(k) for k in kernels]
    fc_w = jnp.asarray(fc_weight)
    fc_b = jnp.asarray(fc_bias)
    bbox_w = jnp.asarray(bbox_weight) if bbox_weight is not None else None

    # the f32 feature twin only feeds the CAM box modes; the regression
    # head reads the pooled bins, so skip the extra kernel store (same
    # rule as TPUEngine._make_detect)
    with_twin = box_mode != "reg"

    def per_shard(images, shifts):
        if head_mode == "bins":
            # with_feats follows with_twin — the same A/B-measured rule as
            # TPUEngine._make_detect
            out = pallas_poly.cnn_forward_mega(
                images, kernels, shifts, with_bins=True, with_twin=with_twin,
                with_feats=with_twin,
            )
            pooled, feats_twin = (out[1], out[2]) if with_twin else (out, None)
            return detect_head.detect_with_pooled(
                None, pooled, fc_w, fc_b, img_size, features_twin=feats_twin,
                box_mode=box_mode, bbox_weight=bbox_w,
            )
        feats = pallas_poly.cnn_forward_mega(images, kernels, shifts)
        return detect_head.detect(feats, fc_w, fc_b, head_mode, img_size,
                                  box_mode=box_mode, bbox_weight=bbox_w)

    fn = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(axes), P()),
        out_specs=(P(axes), P(axes), P(axes), P(axes)),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_detect_multi_mega(
    mesh: Mesh,
    kernels: Sequence[jax.Array],
    fc_weight: jax.Array,
    fc_bias: jax.Array,
    head_mode: str = "bins",
    img_size: int = 128,
    box_mode: str = "ref",
    instances: int = 1,
    multi_head=None,
):
    """Multi-object head under the mesh: fused megakernel + one CAM box
    per class (``detect_head.detect_multi_with_pooled``), data-parallel
    over every mesh axis — the multi-chip twin of
    ``TPUEngine._detect_multi``. ``instances > 1`` adds the watershed
    per-component boxes (two extra batch-sharded outputs); ``multi_head``
    adds the multi-label presence scores as the LAST output."""
    from tpu_cnn.ops import pallas_poly

    axes = _all_axes(mesh)
    kernels = [jnp.asarray(k) for k in kernels]
    fc_w = jnp.asarray(fc_weight)
    fc_b = jnp.asarray(fc_bias)
    mh = (tuple(jnp.asarray(a) for a in multi_head)
          if multi_head is not None else None)

    def per_shard(images, shifts):
        if head_mode == "bins":
            _, pooled, twin = pallas_poly.cnn_forward_mega(
                images, kernels, shifts,
                with_bins=True, with_twin=True, with_feats=True,
            )
            return detect_head.detect_multi_with_pooled(
                pooled, twin, fc_w, fc_b, img_size, box_mode=box_mode,
                instances=instances, multi_head=mh,
            )
        feats = pallas_poly.cnn_forward_mega(images, kernels, shifts)
        return detect_head.detect_multi(feats, fc_w, fc_b, head_mode,
                                        img_size, box_mode=box_mode,
                                        instances=instances, multi_head=mh)

    n_out = (6 if instances > 1 else 4) + (1 if mh is not None else 0)
    fn = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(axes), P()),
        out_specs=tuple(P(axes) for _ in range(n_out)),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_detect_multi(
    mesh: Mesh,
    kernels: Sequence[jax.Array],
    fc_weight: jax.Array,
    fc_bias: jax.Array,
    head_mode: str = "bins",
    img_size: int = 128,
    box_mode: str = "ref",
    instances: int = 1,
    multi_head=None,
    *,
    compute_dtype: str = "float32",
):
    """Multi-object head on the sharding-constraint XLA path (fc feature
    dim over the model axis, like :func:`sharded_detect`)."""
    forward = sharded_forward(mesh, kernels, compute_dtype=compute_dtype)
    fc_w = jax.device_put(fc_weight, NamedSharding(mesh, P(None, "model")))
    fc_b = jax.device_put(fc_bias, NamedSharding(mesh, P()))
    mh = (tuple(jnp.asarray(a) for a in multi_head)
          if multi_head is not None else None)

    @jax.jit
    def detect_multi(images, shifts):
        feats = forward(images, shifts)
        out = detect_head.detect_multi(
            feats, fc_w, fc_b, head_mode, img_size, box_mode=box_mode,
            instances=instances, multi_head=mh,
        )
        pred, conf, probs, boxes = out[:4]
        res = (
            _constrain(mesh, pred, P("data")),
            _constrain(mesh, conf, P("data")),
            _constrain(mesh, probs, P("data", None)),
            _constrain(mesh, boxes, P("data", None, None)),
        )
        if instances > 1:
            res += (
                _constrain(mesh, out[4], P("data", None, None, None)),
                _constrain(mesh, out[5], P("data", None, None)),
            )
        if mh is not None:
            res += (_constrain(mesh, out[-1], P("data", None)),)
        return res

    return detect_multi


class MeshEngine:
    """Engine-protocol wrapper over a device mesh: ``run_batch`` /
    ``detect_batch`` / ``detect_batch_async`` like TPUEngine, but
    data-parallel across every chip in the mesh. ``backend`` picks the
    per-shard datapath: 'mega' (the production megakernel, via shard_map),
    'xla' (sharding-constraint path with oc/feature-dim model sharding), or
    'auto' (mega when its VMEM model fits the geometry). Drop-in for the
    apps' ``--mode`` swap at multi-chip scale."""

    def __init__(self, model, mesh: Mesh | None = None, model_axis: int = 1,
                 backend: str = "auto", box_mode: str = "ref"):
        import jax.numpy as jnp

        from tpu_cnn.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()  # bitstream analogue: skip recompiles
        self.model = model
        self.box_mode = box_mode
        if box_mode == "reg" and model.bbox_weight is None:
            raise ValueError(
                "box_mode='reg' needs a bbox_weight.npy in the artifact "
                "bundle — train one with: python -m tpu_cnn.apps.train_bbox"
            )
        self.mesh = mesh or make_mesh(model_axis=model_axis)
        kernels = [jnp.asarray(k) for k in model.kernels]
        self._shifts = jnp.asarray(model.shifts, jnp.int32)

        if backend == "auto":
            from tpu_cnn.ops import pallas_poly

            # budget both per-shard paths (features: u8 out only; detect:
            # the exact sharded_detect_mega configuration) — same rule as
            # TPUEngine._mega_fits
            cfgs = model.config.layer_configs
            with_bins = model.head_mode == "bins"
            with_twin = with_bins and box_mode != "reg"
            backend = (
                "mega"
                if (pallas_poly.polyphase_plan(cfgs, with_bins=False)
                    is not None
                    and pallas_poly.polyphase_plan(
                        cfgs, with_bins=with_bins, with_twin=with_twin,
                        with_feats=with_twin) is not None)
                else "xla"
            )
        fc_w = jnp.asarray(model.fc_weight)
        fc_b = jnp.asarray(model.fc_bias)
        if backend == "mega":
            self._forward = sharded_forward_mega(self.mesh, kernels)
            self._detect = sharded_detect_mega(
                self.mesh, kernels, fc_w, fc_b,
                model.head_mode, model.config.img_size, box_mode=box_mode,
                bbox_weight=model.bbox_weight,
            )
        else:
            self._forward = sharded_forward(self.mesh, kernels)
            self._detect = sharded_detect(
                self.mesh, kernels, fc_w, fc_b,
                model.head_mode, model.config.img_size, box_mode=box_mode,
                bbox_weight=model.bbox_weight,
            )
        self._backend_kind = backend
        self.backend = f"mesh[{self.mesh.devices.shape}]:{backend}"
        # per-shard megakernel batch tile is 4; pad global batches so every
        # shard gets an identical, tile-aligned shape
        shard_tile = 4 if backend == "mega" else 1
        self._batch_mult = int(np.prod(self.mesh.devices.shape)) * shard_tile
        self._all_axes = backend == "mega"  # pure DP: shard over every axis

    def _pad(self, images):
        b = images.shape[0]
        m = self._batch_mult
        pb = ((b + m - 1) // m) * m
        if pb != b:
            images = np.concatenate(
                [images, np.zeros((pb - b, *images.shape[1:]), np.uint8)]
            )
        return images, b

    def warmup(self, batch: int = 1, multi: bool = False,
               instances: int = 1) -> None:
        s = self.model.config.img_size
        img = np.zeros((max(batch, self._batch_mult), s, s), np.uint8)
        jax.block_until_ready(
            self._detect(shard_batch(self.mesh, img, self._all_axes), self._shifts)
        )
        if multi:  # compile the multi program too (serving warmup contract)
            fn = self._detect_multi_prog(instances)
            jax.block_until_ready(fn(
                shard_batch(self.mesh, img, self._detect_multi_all_axes),
                self._shifts,
            ))

    def set_shifts(self, *shifts: int) -> None:
        self.model.shifts = np.asarray(shifts, np.int32)
        self._shifts = jnp.asarray(self.model.shifts)

    def run_batch(self, images: np.ndarray) -> np.ndarray:
        import jax

        images, b = self._pad(np.asarray(images, np.uint8))
        feats = self._forward(
            shard_batch(self.mesh, images, self._all_axes), self._shifts
        )
        return np.asarray(jax.device_get(feats))[:b]

    def detect_batch(self, images: np.ndarray):
        return self.detect_resolve(self.detect_batch_async(images))

    def stage_batch(self, images: np.ndarray) -> tuple:
        """Pad + shard a batch onto the mesh ahead of dispatch (same
        contract as TPUEngine.stage_batch)."""
        images, b = self._pad(np.asarray(images, np.uint8))
        dev = shard_batch(self.mesh, images, self._all_axes)
        jax.block_until_ready(dev)
        return ("staged", dev, b)

    def detect_batch_async(self, images):
        """Dispatch without blocking (several batches may be in flight on
        the mesh); resolve with :meth:`detect_resolve` — the same async
        pipeline contract as TPUEngine. Accepts a raw uint8 array or a
        :meth:`stage_batch` handle."""
        if isinstance(images, tuple) and len(images) == 3 and images[0] == "staged":
            dev, b = images[1], images[2]
        else:
            images, b = self._pad(np.asarray(images, np.uint8))
            dev = shard_batch(self.mesh, images, self._all_axes)
        pred, conf, probs, bbox = self._detect(dev, self._shifts)
        for a in (pred, conf, probs, bbox):
            a.copy_to_host_async()
        return (pred, conf, probs, bbox, b)

    def detect_resolve(self, handle):
        import jax

        from tpu_cnn.engine.tpu import DetectResult

        pred, conf, probs, bbox, b = handle
        pred, conf, probs, bbox = jax.device_get((pred, conf, probs, bbox))
        return DetectResult(pred[:b], conf[:b], probs[:b], bbox[:b])

    def run(self, gray128: np.ndarray):
        import time

        t0 = time.perf_counter()
        feats = self.run_batch(gray128[None])[0]
        dt = (time.perf_counter() - t0) * 1e3
        return feats, dt, 0.0

    # ── multi-object head (one CAM box per class) ────────────────────

    @property
    def _detect_multi(self):
        """The instances=1 multi program (kept for parity tests)."""
        return self._detect_multi_prog(1)

    def _detect_multi_prog(self, instances: int = 1):
        cache = self.__dict__.setdefault("_detect_multi_fns", {})
        if instances not in cache:
            import jax.numpy as jnp

            from tpu_cnn.ops import pallas_poly

            m = self.model
            kernels = [jnp.asarray(k) for k in m.kernels]
            box_mode = "centroid" if self.box_mode == "centroid" else "ref"
            use_mega = (
                self._backend_kind == "mega"
                and pallas_poly.polyphase_plan(
                    m.config.layer_configs,
                    with_bins=m.head_mode == "bins",
                    with_twin=m.head_mode == "bins",
                    with_feats=m.head_mode == "bins",
                ) is not None
            )
            build = (sharded_detect_multi_mega if use_mega
                     else sharded_detect_multi)
            self._detect_multi_all_axes = use_mega
            cache[instances] = build(
                self.mesh, kernels, m.fc_weight, m.fc_bias,
                m.head_mode, m.config.img_size, box_mode=box_mode,
                instances=instances, multi_head=m.multi_head,
            )
        return cache[instances]

    def detect_multi_batch(self, images: np.ndarray, instances: int = 1):
        return self.detect_multi_resolve(
            self.detect_multi_batch_async(images, instances=instances))

    def detect_multi_batch_async(self, images, instances: int = 1):
        # build first: sets _detect_multi_all_axes
        fn = self._detect_multi_prog(instances)
        if isinstance(images, tuple) and len(images) == 3 and images[0] == "staged":
            dev, b = images[1], images[2]
            if self._detect_multi_all_axes != self._all_axes:
                # stage_batch sharded for the single-detect layout; re-lay
                # the staged array out ONCE here so the timed dispatches
                # don't pay a per-call GSPMD reshard
                dev = shard_batch(self.mesh, dev,
                                  self._detect_multi_all_axes)
                jax.block_until_ready(dev)
        else:
            images, b = self._pad(np.asarray(images, np.uint8))
            dev = shard_batch(self.mesh, images, self._detect_multi_all_axes)
        out = fn(dev, self._shifts)
        for a in out:
            a.copy_to_host_async()
        return (*out, b)

    def detect_multi_resolve(self, handle):
        import jax

        from tpu_cnn.engine.tpu import MultiDetectResult

        *out, b = handle
        out = jax.device_get(tuple(out))
        scores = None
        if self.model.multi_head is not None:  # scores ride as LAST output
            scores, out = out[-1][:b], out[:-1]
        pred, conf, probs, boxes = out[:4]
        inst = tuple(a[:b] for a in out[4:]) if len(out) > 4 else (None, None)
        return MultiDetectResult(pred[:b], conf[:b], probs[:b], boxes[:b],
                                 *inst, scores=scores)


def sharded_detect(
    mesh: Mesh,
    kernels: Sequence[jax.Array],
    fc_weight: jax.Array,
    fc_bias: jax.Array,
    head_mode: str = "bins",
    img_size: int = 128,
    box_mode: str = "ref",
    bbox_weight=None,
    *,
    compute_dtype: str = "float32",
):
    """Returns a jitted fused detect ``f(images, shifts) -> (pred, conf,
    probs, bbox)`` — data-parallel CNN + head with the fc feature dim sharded
    over the model axis (tensor parallelism; XLA inserts the psum)."""
    forward = sharded_forward(mesh, kernels, compute_dtype=compute_dtype)
    fc_w = jax.device_put(fc_weight, NamedSharding(mesh, P(None, "model")))
    fc_b = jax.device_put(fc_bias, NamedSharding(mesh, P()))
    bbox_w = (
        jax.device_put(jnp.asarray(bbox_weight), NamedSharding(mesh, P()))
        if bbox_weight is not None else None
    )

    @jax.jit
    def detect(images, shifts):
        feats = forward(images, shifts)
        pred, conf, probs, bbox = detect_head.detect(
            feats, fc_w, fc_b, head_mode, img_size, box_mode=box_mode,
            bbox_weight=bbox_w,
        )
        return (
            _constrain(mesh, pred, P("data")),
            _constrain(mesh, conf, P("data")),
            _constrain(mesh, probs, P("data", None)),
            _constrain(mesh, bbox, P("data", None)),
        )

    return detect
