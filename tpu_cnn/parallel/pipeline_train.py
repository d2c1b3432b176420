"""Pipeline-parallel TRAINING — jax.grad through the GPipe schedule.

``parallel/pipeline.py`` runs the quantized inference contract as a GPipe
pipeline; this module is the training-side twin for the float phase-1
network (``train/train_cnn.py::float_forward``, the JAX lift of the
reference's torch trainer, ``training/train_cnn.py:259-301``). The TPU-first
move is that there is NO hand-written backward schedule: the forward is the
same shard_map + ``lax.scan`` + ``lax.ppermute`` GPipe loop, and
``jax.grad`` differentiates straight through it — ``scan``'s transpose is
the reverse-time loop (the drain-ordered backward pass), ``ppermute``'s
transpose is the reversed ring hop (cotangents flow stage s -> s-1), and
``lax.switch`` routes each device's cotangent into its own stage. XLA emits
the 1F-then-1B pipeline a framework would otherwise hand-schedule.

Layout: each device holds ONLY its stage's conv kernels — the per-stage
weight stack enters the shard_map with ``P("pipe")`` (stage-sharded), which
is the point of pipeline parallelism (per-stage weights that don't fit one
chip). The fc head is replicated; only the last stage uses it, so its
cotangent is zero elsewhere and the shard_map transpose's psum makes the
replicated gradient correct. Composes with data parallelism on a 2-D
``(data, pipe)`` mesh: batch sharded over ``data``, gradient psums over the
``data`` axis inserted by the same transpose machinery.

Gradient exactness: the packed stack pads kernels with zeros (channels the
sliced compute never reads), fill/drain steps compute on garbage that is
never stored, and clipped tail feeds never reach the last stage — all of
those paths carry ZERO cotangent, so the pipelined gradient equals the
plain ``float_forward`` gradient exactly (asserted in
``tests/test_parallel.py`` and ``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_cnn.parallel.pipeline import split_stages


def _float_layer(x: jax.Array, k: jax.Array) -> jax.Array:
    """One float phase-1 layer: conv3x3 SAME -> relu -> maxpool2x2. The
    layer body of ``train_cnn.float_forward`` (parity asserted in tests —
    the pipelined logits must equal the plain forward's exactly)."""
    k = jnp.transpose(k, (2, 3, 1, 0))  # (oc, ic, 3, 3) -> HWIO
    x = lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,  # match float_forward on TPU
    )
    x = jax.nn.relu(x)
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


def pipelined_float_logits(
    mesh: Mesh,
    layer_configs: Sequence[tuple[int, int, int]],
    *,
    microbatch: int = 4,
    stages: Sequence[tuple[int, int]] | None = None,
    remat: bool = False,
):
    """Returns ``f(params, images) -> (B, num_classes) float32 logits`` —
    the float phase-1 network as a GPipe pipeline over the mesh's ``pipe``
    axis. Not jitted and fully differentiable: wrap in ``jax.jit`` /
    ``jax.grad`` (``make_pipeline_train_step`` does both).

    ``params`` is the standard trainer dict (``conv{i}``, ``fc_w``,
    ``fc_b``); ``images`` is (B, H, W) float32 with B a multiple of
    ``microbatch`` times the data-shard count. The conv kernels are packed
    into a (S, Lmax, Co, Ci, 3, 3) stage stack sharded ``P("pipe")`` so each
    device materialises only its own stage's weights inside the step.

    ``remat=True`` wraps each stage body in ``jax.checkpoint`` — the
    backward pass recomputes the stage's conv intermediates from its wire
    input instead of storing them for every scan step, the classic
    GPipe + rematerialisation pairing: live activation memory drops from
    O(steps x stage depth) to O(steps) wire buffers, for one extra forward
    of FLOPs on the MXU (gradients unchanged — recomputation is
    deterministic)."""
    if mesh.axis_names not in (("pipe",), ("data", "pipe")):
        raise ValueError(
            f"mesh must be ('pipe',) or ('data', 'pipe'), got {mesh.axis_names}"
        )
    data_spec = "data" if "data" in mesh.axis_names else None
    n_data = int(mesh.shape["data"]) if data_spec else 1
    n_stages = int(mesh.shape["pipe"])
    n_layers = len(layer_configs)
    bounds = list(stages) if stages is not None else split_stages(
        n_layers, n_stages
    )
    if len(bounds) != n_stages:
        raise ValueError(f"{len(bounds)} stages for a {n_stages}-device pipe")
    mb = int(microbatch)
    l_max = max(end - start for start, end in bounds)
    co = max(oc for _, oc, _ in layer_configs)
    ci = max(ic for ic, _, _ in layer_configs)
    in_c = [1] + [oc for _, oc, _ in layer_configs]  # channels entering layer i
    # wire carries every stage interface INCLUDING the last stage's output
    # (it never travels, but lax.switch needs one uniform branch shape)
    c_wire = max(in_c)

    def pack(params):
        """(S, Lmax, Co, Ci, 3, 3) zero-padded stage stack, stage-sharded."""
        stack = jnp.zeros((n_stages, l_max, co, ci, 3, 3), jnp.float32)
        for s, (start, end) in enumerate(bounds):
            for j, li in enumerate(range(start, end)):
                ic_li, oc_li, _ = layer_configs[li]
                stack = stack.at[s, j, :oc_li, :ic_li].set(params[f"conv{li}"])
        return lax.with_sharding_constraint(
            stack, NamedSharding(mesh, P("pipe"))
        )

    def fn(params, images):
        b, h0, w0 = images.shape
        if b % (n_data * mb):
            raise ValueError(
                f"batch {b} not a multiple of microbatch {mb}"
                + (f" x data shards {n_data}" if n_data > 1 else "")
            )
        n_micro = b // n_data // mb
        ncls = int(params["fc_w"].shape[0])
        stack = pack(params)

        def pad_buf(x):
            _, h, w, c = x.shape
            return jnp.pad(x, ((0, 0), (0, h0 - h), (0, w0 - w), (0, c_wire - c)))

        def per_device(stack, fc_w, fc_b, images):
            d = lax.axis_index("pipe")
            stack = stack[0]  # this device's (Lmax, Co, Ci, 3, 3) stage

            def stage_branch(s):
                start, end = bounds[s]

                def f(buf):
                    x = buf[:, : h0 >> start, : w0 >> start, : in_c[start]]
                    for j, li in enumerate(range(start, end)):
                        ic_li, oc_li, _ = layer_configs[li]
                        x = _float_layer(x, stack[j, :oc_li, :ic_li])
                    if end == n_layers:  # last stage: GAP -> linear head
                        logits = jnp.matmul(
                            x.mean(axis=(1, 2)), fc_w.T,
                            precision=lax.Precision.HIGHEST,
                        ) + fc_b
                    else:
                        logits = jnp.zeros((mb, ncls), jnp.float32)
                    return pad_buf(x), logits

                return jax.checkpoint(f) if remat else f

            branches = [stage_branch(s) for s in range(n_stages)]

            def step(carry, t):
                wire, done = carry
                recv = lax.ppermute(
                    wire, "pipe", [(i, i + 1) for i in range(n_stages - 1)]
                ) if n_stages > 1 else wire
                mbi = jnp.clip(t, 0, n_micro - 1)
                feed = lax.dynamic_slice_in_dim(images, mbi * mb, mb, axis=0)
                buf_in = jnp.where(d == 0, pad_buf(feed[..., None]), recv)
                out, logits = lax.switch(d, branches, buf_in)
                # microbatch m's logits leave the last stage at step m + S - 1
                # (fill-step writes land in slot 0 and are overwritten — same
                # drain bookkeeping as pipelined_forward)
                slot = jnp.maximum(t - (n_stages - 1), 0)
                done = lax.dynamic_update_slice_in_dim(
                    done, logits[None], slot, axis=0
                )
                return (out, done), None

            n_steps = n_micro + n_stages - 1
            (_, done), _ = lax.scan(
                step,
                (
                    jnp.zeros((mb, h0, w0, c_wire), jnp.float32),
                    jnp.zeros((n_micro, mb, ncls), jnp.float32),
                ),
                jnp.arange(n_steps),
            )
            return done.reshape((1,) * len(mesh.axis_names) + done.shape)

        stacked = jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P("pipe"), P(), P(), P(data_spec)),
            out_specs=P(*mesh.axis_names),
            check_vma=False,
        )(stack, params["fc_w"], params["fc_b"], images)

        st = stacked if data_spec else stacked[None]
        return st[:, n_stages - 1].reshape(b, ncls)  # only last stage is real

    return fn


def make_pipeline_train_step(cfg, optimizer, mesh: Mesh, *,
                             microbatch: int = 4, remat: bool = False):
    """Drop-in replacement for ``train_cnn.make_train_step`` that runs the
    float forward AND backward as a GPipe pipeline over the mesh's ``pipe``
    axis (optionally composed with ``data``). Signature and semantics match:
    ``step(params, opt_state, images, labels) -> (params, opt_state, loss,
    acc)``, with gradients exactly equal to the single-device step's."""
    import optax

    fwd = pipelined_float_logits(
        mesh, cfg.layer_configs, microbatch=microbatch, remat=remat
    )

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
