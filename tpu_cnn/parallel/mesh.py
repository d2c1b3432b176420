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
