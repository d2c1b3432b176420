"""Spatial parallelism over a 1-D device mesh (row shards + halo exchange).

The fourth mesh axis the framework speaks, next to ``data`` / ``model``
(``parallel/mesh.py``) and ``pipe`` (``parallel/pipeline.py``). The
reference tiles layer 0 spatially on ONE chip because a full row of the
input image exceeds its line buffers (``rtl/core/layer_fsm.v:206-213`` —
the 4-tile drain); spatial parallelism is that same idea lifted to the chip
level: each device owns a contiguous horizontal band of IMAGE ROWS and the
3x3 convolution's one-row dependency across band boundaries becomes a halo
exchange between neighbouring devices.

TPU-idiomatic mechanics, per the scaling-book recipe:

  * one ``jax.shard_map`` over a ``space`` axis; images enter sharded
    ``P(None, "space", None)`` (batch replicated, rows split);
  * per layer, each device sends its FIRST row to the neighbour above and
    its LAST row to the neighbour below — two ``lax.ppermute`` neighbour
    shifts on the ICI ring. Edge devices receive ppermute's fill value
    (zeros), which is exactly the contract's SAME zero padding;
  * the halo-extended band runs the standard contract layer; the two
    boundary output rows (computed against the conv's own zero pad rather
    than the true neighbour context) are sliced off before the shift/pool
    epilogue. Row bands stay even-sized, so no 2x2 pool window ever
    straddles a device boundary;
  * halos travel as uint8 activation rows (4x cheaper on ICI than f32);
    per layer per device the wire cost is two rows = ``2*W*C`` bytes,
    vanishing next to the conv FLOPs.

For the shipped families this axis is a capability demonstration — a
128-px image fits one chip trivially, so pure data parallelism wins. It is
the right tool for the megapixel-input regime, where layer-0 activations
(H*W*16*4 bytes in f32) outgrow one chip's HBM working set and the batch
dimension alone cannot be split finely enough.

Bit-exactness: the band-local computation is the exact contract
(``quant.fixed_point_conv_layer`` semantics, re-derived here with halo rows
in place of zero padding), so the gathered output equals
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


def make_spatial_mesh(n_devices: int, *, data_axis: int = 1, devices=None) -> Mesh:
    """A ``space`` mesh over the first ``n_devices`` devices. With
    ``data_axis > 1`` the mesh is 2-D ``(data, space)`` — batch shards times
    row shards, the composite deployment shape (dp x sp)."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < n_devices:
        raise ValueError(f"need {n_devices} devices, have {len(devices)}")
    if n_devices % data_axis:
        raise ValueError(f"{n_devices} devices not divisible by data={data_axis}")
    if data_axis == 1:
        return Mesh(np.asarray(devices[:n_devices]), axis_names=("space",))
    return Mesh(
        np.asarray(devices[:n_devices]).reshape(data_axis, -1),
        axis_names=("data", "space"),
    )


def check_spatial_split(h: int, n_layers: int, n_devices: int) -> None:
    """Every layer's per-device row band must be even (pool windows must not
    straddle devices): (h >> i) % (2 * n_devices) == 0 for all layers."""
    for i in range(n_layers):
        if (h >> i) % (2 * n_devices):
            raise ValueError(
                f"H={h}: layer {i} rows {h >> i} not divisible by "
                f"2*{n_devices} — pool windows would straddle devices"
            )


def _halo_conv_layer(x, kernel, shift, *, accum_wrap, compute_dtype):
    """One contract layer on a row band whose first/last rows are HALO rows
    from the neighbouring bands (or zeros at the image edge). Built from the
    same ``quant.conv3x3_same`` + ``quant.conv_epilogue`` the layer function
    uses — only the slice of the two halo-context output rows (computed
    against the conv's own zero pad rather than the true neighbour context)
    differs, so the contract lives in one place."""
    conv = quant.conv3x3_same(x, kernel, compute_dtype)[:, 1:-1]
    return quant.conv_epilogue(conv, shift, accum_wrap=accum_wrap)


def spatial_forward(
    mesh: Mesh,
    kernels: Sequence[jax.Array],
    *,
    accum_wrap: bool = False,
    compute_dtype: str = "float32",
):
    """Returns a jitted ``f(images, shifts) -> (B, C, S'*S') u8`` running the
    layer stack with image rows sharded over the mesh's ``space`` axis.

    ``images`` is (B, H, W) uint8 with every layer's row count divisible by
    ``2 * n_devices`` (``check_spatial_split``); output layout matches
    ``quant.cnn_forward`` (bit-exact)."""
    if mesh.axis_names not in (("space",), ("data", "space")):
        raise ValueError(
            "mesh must be ('space',) or ('data', 'space'), got "
            f"{mesh.axis_names}"
        )
    data_spec = "data" if "data" in mesh.axis_names else None
    n_dev = int(mesh.shape["space"])
    kernels = [jnp.asarray(k) for k in kernels]
    n_layers = len(kernels)

    def per_device(x, shifts):
        # x: (B, h_loc, W) band of rows; device d holds rows
        # [d*h_loc, (d+1)*h_loc) — row index grows with axis_index
        x = x[..., None]
        for li in range(n_layers):
            if n_dev > 1:
                # my last row -> the device below's top halo; edge devices
                # receive ppermute's zero fill = the contract's SAME pad
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
            x = _halo_conv_layer(
                ext, kernels[li], shifts[li],
                accum_wrap=accum_wrap, compute_dtype=compute_dtype,
            )
        return x  # (B, h_loc >> n_layers, W >> n_layers, C)

    def fn(images, shifts):
        if images.ndim == 4:  # (B, H, W, 1) form, as quant.cnn_forward takes
            images = images[..., 0]
        b, h, w = images.shape
        check_spatial_split(h, n_layers, n_dev)
        if data_spec and b % mesh.shape["data"]:
            raise ValueError(
                f"batch {b} not divisible by data axis {mesh.shape['data']}"
            )
        feats = jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(data_spec, "space", None), P()),
            out_specs=P(data_spec, "space", None, None),
            check_vma=False,
        )(images, shifts)
        b, hf, wf, c = feats.shape
        return jnp.transpose(feats, (0, 3, 1, 2)).reshape(b, c, hf * wf)

    return jax.jit(fn)
