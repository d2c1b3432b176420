"""Spatial-parallel TRAINING — jax.grad through the halo exchange.

The training-side twin of ``parallel/spatial.py``, completing the training
story for all four mesh axes (``data``: gradient psum; ``model``: pjit
shardings; ``pipe``: ``parallel/pipeline_train.py``; ``space``: here). The
float phase-1 network (``train/train_cnn.py::float_forward``) runs with
image ROWS sharded over the ``space`` axis: per conv layer each device
trades one boundary row with each neighbour (two ``lax.ppermute`` shifts,
edge devices receive the zero fill = SAME padding), and the GAP head
becomes a device-local partial sum + one ``lax.psum`` over ``space``.

As with the pipeline twin, there is NO hand-written backward: ``jax.grad``
differentiates through the shard_map — ``ppermute``'s transpose carries the
halo-row cotangents back to the neighbour that produced them, and
``psum``'s transpose broadcasts the GAP cotangent to every row shard.
Weights stay replicated (spatial parallelism shards ACTIVATIONS — the
megapixel-input regime — not weights), so gradient all-reduction over
``space`` is handled by the shard_map transpose's psum on the replicated
in_specs.

Gradients match the single-device step to f32 ulp (the GAP partial-sum
order differs from the fused mean's, so unlike the pipeline twin the match
is ulp-level, not bit-exact) — asserted in ``tests/test_training.py`` and
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from tpu_cnn.parallel.spatial import check_spatial_split


def spatial_float_logits(
    mesh: Mesh,
    layer_configs: Sequence[tuple[int, int, int]],
):
    """Returns ``f(params, images) -> (B, num_classes) float32 logits`` —
    the float phase-1 network with image rows sharded over the mesh's
    ``space`` axis. Not jitted and fully differentiable
    (``make_spatial_train_step`` wraps it). ``params`` is the standard
    trainer dict; ``images`` is (B, H, W) float32 with every layer's row
    count divisible by ``2 * n_space`` (``check_spatial_split``)."""
    if mesh.axis_names not in (("space",), ("data", "space")):
        raise ValueError(
            f"mesh must be ('space',) or ('data', 'space'), got {mesh.axis_names}"
        )
    data_spec = "data" if "data" in mesh.axis_names else None
    n_dev = int(mesh.shape["space"])
    n_layers = len(layer_configs)

    def fn(params, images):
        b, h, w = images.shape
        check_spatial_split(h, n_layers, n_dev)
        if data_spec and b % mesh.shape["data"]:
            raise ValueError(
                f"batch {b} not divisible by data axis {mesh.shape['data']}"
            )
        hf, wf = h >> n_layers, w >> n_layers
        convs = [params[f"conv{i}"] for i in range(n_layers)]

        def per_device(convs, fc_w, fc_b, x):
            x = x[..., None]
            for li in range(n_layers):
                if n_dev > 1:
                    # my last row -> the device below's top halo; edges get
                    # ppermute's zero fill = the contract's SAME padding
                    top = lax.ppermute(
                        x[:, -1:], "space",
                        [(i, i + 1) for i in range(n_dev - 1)],
                    )
                    bottom = lax.ppermute(
                        x[:, :1], "space",
                        [(i + 1, i) for i in range(n_dev - 1)],
                    )
                    ext = jnp.concatenate([top, x, bottom], axis=1)
                else:
                    ext = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
                k = jnp.transpose(convs[li], (2, 3, 1, 0))  # -> HWIO
                c = lax.conv_general_dilated(
                    ext, k, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    precision=lax.Precision.HIGHEST,  # match float_forward
                )[:, 1:-1]  # drop the two halo-context output rows
                c = jax.nn.relu(c)
                bb, hh, ww, cc = c.shape
                x = c.reshape(bb, hh // 2, 2, ww // 2, 2, cc).max(axis=(2, 4))
            # GAP over the FULL image: local partial sum + psum over 'space'
            feats = lax.psum(x.sum(axis=(1, 2)), "space") / (hf * wf)
            # identical on every row shard
            return jnp.matmul(feats, fc_w.T,
                              precision=lax.Precision.HIGHEST) + fc_b

        return jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(data_spec, "space", None)),
            out_specs=P(data_spec),
            check_vma=False,
        )(convs, params["fc_w"], params["fc_b"], images)

    return fn


def make_spatial_train_step(cfg, optimizer, mesh: Mesh):
    """Drop-in replacement for ``train_cnn.make_train_step`` that shards
    image ROWS over the mesh's ``space`` axis for forward and backward
    (optionally composed with ``data``). Signature matches:
    ``step(params, opt_state, images, labels) -> (params, opt_state, loss,
    acc)``, gradients matching the single-device step at f32 ulp."""
    import optax

    fwd = spatial_float_logits(mesh, cfg.layer_configs)

    def step(params, opt_state, images, labels):
        def loss_fn(p):
            logits = fwd(p, images)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            acc = (logits.argmax(-1) == labels).mean()
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    return jax.jit(step)
