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


def shard_batch(mesh: Mesh, images: jax.Array) -> jax.Array:
    """Place a host batch onto the mesh, sharded over the data axis."""
    return jax.device_put(images, NamedSharding(mesh, P("data")))


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


class MeshEngine:
    """Engine-protocol wrapper over a device mesh: ``run_batch`` /
    ``detect_batch`` like TPUEngine, but data-parallel across every chip in
    the mesh (with oc/feature-dim model sharding). Drop-in for the apps'
    ``--mode`` swap at multi-chip scale."""

    def __init__(self, model, mesh: Mesh | None = None, model_axis: int = 1):
        import jax.numpy as jnp

        self.model = model
        self.mesh = mesh or make_mesh(model_axis=model_axis)
        self.backend = f"mesh[{self.mesh.devices.shape}]"
        kernels = [jnp.asarray(k) for k in model.kernels]
        self._shifts = jnp.asarray(model.shifts, jnp.int32)
        self._forward = sharded_forward(self.mesh, kernels)
        self._detect = sharded_detect(
            self.mesh,
            kernels,
            jnp.asarray(model.fc_weight),
            jnp.asarray(model.fc_bias),
            model.head_mode,
            model.config.img_size,
        )
        self._batch_mult = int(np.prod(self.mesh.devices.shape))

    def _pad(self, images):
        b = images.shape[0]
        m = self._batch_mult
        pb = ((b + m - 1) // m) * m
        if pb != b:
            images = np.concatenate(
                [images, np.zeros((pb - b, *images.shape[1:]), np.uint8)]
            )
        return images, b

    def run_batch(self, images: np.ndarray) -> np.ndarray:
        import jax

        images, b = self._pad(np.asarray(images, np.uint8))
        feats = self._forward(shard_batch(self.mesh, images), self._shifts)
        return np.asarray(jax.device_get(feats))[:b]

    def detect_batch(self, images: np.ndarray):
        import jax

        from tpu_cnn.engine.tpu import DetectResult

        images, b = self._pad(np.asarray(images, np.uint8))
        pred, conf, probs, bbox = self._detect(
            shard_batch(self.mesh, images), self._shifts
        )
        pred, conf, probs, bbox = jax.device_get((pred, conf, probs, bbox))
        return DetectResult(pred[:b], conf[:b], probs[:b], bbox[:b])

    def run(self, gray128: np.ndarray):
        import time

        t0 = time.perf_counter()
        feats = self.run_batch(gray128[None])[0]
        dt = (time.perf_counter() - t0) * 1e3
        return feats, dt, 0.0


def sharded_detect(
    mesh: Mesh,
    kernels: Sequence[jax.Array],
    fc_weight: jax.Array,
    fc_bias: jax.Array,
    head_mode: str = "bins",
    img_size: int = 128,
    *,
    compute_dtype: str = "float32",
):
    """Returns a jitted fused detect ``f(images, shifts) -> (pred, conf,
    probs, bbox)`` — data-parallel CNN + head with the fc feature dim sharded
    over the model axis (tensor parallelism; XLA inserts the psum)."""
    forward = sharded_forward(mesh, kernels, compute_dtype=compute_dtype)
    fc_w = jax.device_put(fc_weight, NamedSharding(mesh, P(None, "model")))
    fc_b = jax.device_put(fc_bias, NamedSharding(mesh, P()))

    @jax.jit
    def detect(images, shifts):
        feats = forward(images, shifts)
        pred, conf, probs, bbox = detect_head.detect(
            feats, fc_w, fc_b, head_mode, img_size
        )
        return (
            _constrain(mesh, pred, P("data")),
            _constrain(mesh, conf, P("data")),
            _constrain(mesh, probs, P("data", None)),
            _constrain(mesh, bbox, P("data", None)),
        )

    return detect
