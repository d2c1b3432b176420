"""Pipeline parallelism over a 1-D device mesh (GPipe schedule, ppermute).

The third mesh axis the framework speaks, next to ``data`` and ``model``
(``parallel/mesh.py``). The reference's datapath is a layer *sequencer* on
one chip (``rtl/core/layer_fsm.v`` walks layers 0..2 through one shared conv
core, SURVEY.md §3.2); pipeline parallelism is that same idea lifted to the
chip level: each device owns a contiguous *stage* of layers and activations
flow stage-to-stage over ICI while every stage works on a different
microbatch.

For the shipped CNN families this axis is a capability demonstration, not
the production choice — their weights fit in one chip's VMEM many times
over, so pure data parallelism (``sharded_forward_mega``) is strictly
better. The axis exists for the regime where it is the right tool: a model
whose per-stage weights or activations exceed one chip. The schedule is the
classic GPipe fill/drain: with S stages and M microbatches, step t has
device d working on microbatch ``t - d`` (bubble fraction (S-1)/(M+S-1)).

TPU-idiomatic mechanics, per the scaling-book recipe:

  * one ``jax.shard_map`` over a ``pipe`` axis — every device runs the SAME
    traced program (SPMD) and picks its stage with ``lax.switch`` on
    ``lax.axis_index``;
  * the inter-stage hop is a single ``lax.ppermute`` (a neighbour shift on
    the ICI ring; device 0 receives zeros, which the input feed replaces);
  * the time loop is ``lax.scan`` — compiled once, no Python-level steps;
  * stage activations have *different* shapes (each conv layer halves the
    spatial dims), but SPMD + ppermute need one uniform wire format, so
    activations travel in a fixed (microbatch, H0, W0, Cmax) uint8 buffer
    that each stage slices its real region out of (zero padding; u8 wire =
    4x cheaper on ICI than f32).

Bit-exactness: each stage applies the exact contract layers
(``quant.fixed_point_conv_layer``), so the pipelined output equals
``quant.cnn_forward`` bit-for-bit — asserted on the virtual mesh in
``tests/test_parallel.py`` and in ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from tpu_cnn.ops import quant


def make_pipeline_mesh(n_devices: int, *, data_axis: int = 1, devices=None) -> Mesh:
    """A ``pipe`` mesh over the first ``n_devices`` devices (the same
    total-device convention as ``make_mesh`` / ``make_spatial_mesh``). With
    ``data_axis > 1`` the mesh is 2-D ``(data, pipe)`` — ``data_axis``
    independent pipelines of ``n_devices // data_axis`` stages each, batch
    sharded across them (dp x pp)."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < n_devices:
        raise ValueError(f"need {n_devices} devices, have {len(devices)}")
    if n_devices % data_axis:
        raise ValueError(f"{n_devices} devices not divisible by data={data_axis}")
    if data_axis == 1:
        return Mesh(np.asarray(devices[:n_devices]), axis_names=("pipe",))
    return Mesh(
        np.asarray(devices[:n_devices]).reshape(data_axis, -1),
        axis_names=("data", "pipe"),
    )


def split_stages(n_layers: int, n_stages: int) -> list[tuple[int, int]]:
    """Balanced contiguous [start, end) layer ranges, one per stage. Early
    stages take the remainder (they also hold the larger spatial dims, but
    stage balance for these geometries is dominated by layer count)."""
    if not 1 <= n_stages <= n_layers:
        raise ValueError(f"n_stages {n_stages} must be in [1, {n_layers}]")
    base, rem = divmod(n_layers, n_stages)
    bounds, start = [], 0
    for s in range(n_stages):
        end = start + base + (1 if s < rem else 0)
        bounds.append((start, end))
        start = end
    return bounds


def pipelined_forward(
    mesh: Mesh,
    kernels: Sequence[jax.Array],
    *,
    microbatch: int = 4,
    stages: Sequence[tuple[int, int]] | None = None,
    accum_wrap: bool = False,
    compute_dtype: str = "float32",
):
    """Returns a jitted ``f(images, shifts) -> (B, C, Hf*Wf) u8`` running the
    layer stack as a GPipe pipeline over the mesh's ``pipe`` axis.

    ``images`` is (B, H, W) or (B, H, W, 1) uint8 with B a multiple of
    ``microbatch`` (times the data-shard count on a 2-D ``(data, pipe)``
    mesh — independent pipelines with the batch sharded across them);
    output layout matches ``quant.cnn_forward`` (bit-exact). ``stages``
    overrides the balanced contiguous layer split."""
    if mesh.axis_names not in (("pipe",), ("data", "pipe")):
        raise ValueError(
            f"mesh must be ('pipe',) or ('data', 'pipe'), got {mesh.axis_names}"
        )
    data_spec = "data" if "data" in mesh.axis_names else None
    n_data = int(mesh.shape["data"]) if data_spec else 1
    n_stages = int(mesh.shape["pipe"])
    kernels = [jnp.asarray(k) for k in kernels]
    bounds = list(stages) if stages is not None else split_stages(
        len(kernels), n_stages
    )
    if len(bounds) != n_stages:
        raise ValueError(f"{len(bounds)} stages for a {n_stages}-device pipe")
    mb = int(microbatch)

    def fn(images, shifts):
        if images.ndim == 4:  # (B, H, W, 1) form, as quant.cnn_forward takes
            images = images[..., 0]
        b, h0, w0 = images.shape
        if b % (n_data * mb):
            raise ValueError(
                f"batch {b} not a multiple of microbatch {mb}"
                + (f" x data shards {n_data}" if n_data > 1 else "")
            )
        n_micro = b // n_data // mb
        # interface geometry: stage s consumes the activation entering layer
        # bounds[s][0] and produces the one leaving layer bounds[s][1]-1
        # (each layer halves spatial; channels come from the kernel shapes)
        in_c = [1] + [int(k.shape[0]) for k in kernels]  # entering layer i
        c_max = max(in_c)
        buf_shape = (mb, h0, w0, c_max)
        n_layers = len(kernels)
        hf, wf = h0 >> n_layers, w0 >> n_layers
        cf = int(kernels[-1].shape[0])

        def pad_buf(x):
            _, h, w, c = x.shape
            return jnp.pad(
                x, ((0, 0), (0, h0 - h), (0, w0 - w), (0, c_max - c))
            ).astype(jnp.uint8)

        def stage_fn(s, buf, shifts):
            start, end = bounds[s]
            x = buf[:, : h0 >> start, : w0 >> start, : in_c[start]]
            for li in range(start, end):
                x = quant.fixed_point_conv_layer(
                    x, kernels[li], shifts[li],
                    accum_wrap=accum_wrap, compute_dtype=compute_dtype,
                )
            return pad_buf(x)

        def per_device(images, shifts):
            d = lax.axis_index("pipe")
            branches = [
                (lambda buf, sh, s=s: stage_fn(s, buf, sh))
                for s in range(n_stages)
            ]

            def step(carry, t):
                # neighbour shift on the ICI ring: stage s-1's last output
                # becomes stage s's input; device 0 gets zeros from ppermute
                # and takes microbatch t from the feed instead
                wire, done = carry
                recv = lax.ppermute(
                    wire, "pipe", [(i, i + 1) for i in range(n_stages - 1)]
                ) if n_stages > 1 else wire
                mbi = jnp.clip(t, 0, n_micro - 1)
                feed = lax.dynamic_slice_in_dim(images, mbi * mb, mb, axis=0)
                buf_in = jnp.where(d == 0, pad_buf(feed[..., None]), recv)
                out = lax.switch(d, branches, buf_in, shifts)
                # microbatch m leaves the LAST stage at step m + S - 1: store
                # only its real (hf, wf, cf) region. Fill steps (t < S-1)
                # write garbage to slot 0, overwritten when m=0 lands there —
                # scan steps run in order, so the final contents are correct.
                # This keeps the carry O(B_local) in FINAL-feature bytes
                # instead of stacking every step's full wire buffer.
                slot = jnp.maximum(t - (n_stages - 1), 0)
                done = lax.dynamic_update_slice_in_dim(
                    done, out[None, :, :hf, :wf, :cf], slot, axis=0
                )
                return (out, done), None

            n_steps = n_micro + n_stages - 1
            done0 = jnp.zeros((n_micro, mb, hf, wf, cf), jnp.uint8)
            (_, done), _ = lax.scan(
                step,
                (jnp.zeros(buf_shape, jnp.uint8), done0),
                jnp.arange(n_steps),
            )
            # one leading singleton per mesh axis -> stacked over the mesh
            return done.reshape((1,) * len(mesh.axis_names) + done.shape)

        stacked = jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(data_spec), P()),
            out_specs=P(*mesh.axis_names),
            check_vma=False,
        )(images, shifts)

        # only the last stage's slots hold real outputs
        st = stacked if data_spec else stacked[None]
        feats = st[:, n_stages - 1].reshape(b, hf, wf, cf)
        return jnp.transpose(feats, (0, 3, 1, 2)).reshape(b, cf, hf * wf)

    return jax.jit(fn)
