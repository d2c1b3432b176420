"""Subprocess worker for tests/test_multihost.py — spawned, not collected.

argv: <process_id> <num_processes> <port> <out_dir> <local_devices>

Each process sees <local_devices> virtual CPU devices (XLA_FLAGS set by
the spawning test); ``jax.distributed`` joins them into ONE global
runtime with Gloo cross-process collectives — the same machinery a real
multi-host TPU pod uses over DCN, minus the chips.
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # axon sitecustomize override trap


def main():
    pid, nproc, port = (int(v) for v in sys.argv[1:4])
    out_dir = sys.argv[4]
    n_local = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc,
                               process_id=pid)
    import numpy as np
    import optax

    from tpu_cnn.parallel.mesh import make_mesh
    from tpu_cnn.parallel.multihost import global_batches, is_primary
    from tpu_cnn.train import data as D
    from tpu_cnn.train.train_cnn import (
        TrainConfig, init_params, make_train_step, train,
    )

    assert jax.device_count() == n_local * nproc, jax.devices()
    assert jax.local_device_count() == n_local
    cfg = TrainConfig(
        layer_configs=((1, 16, 32), (16, 32, 16), (32, 64, 8)),
        epochs=2, batch_size=32, head_epochs=50,
    )
    mesh = make_mesh(jax.device_count())

    # 1) ONE global-mesh train step on a fixed batch — every process feeds
    # its local half, XLA psums the gradients across processes; the
    # updated (replicated) params land on disk per rank for the test to
    # compare against each other and the single-process step.
    params = init_params(cfg, jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    rs = np.random.RandomState(7)
    bi = rs.rand(cfg.batch_size, 32, 32).astype(np.float32)
    bl = rs.randint(0, cfg.num_classes, cfg.batch_size)
    step = make_train_step(cfg, opt, mesh)
    (gbi, gbl), = list(global_batches(mesh, [(bi, bl)]))
    assert not gbi.is_fully_addressable  # truly cross-process sharded
    p1, o1, loss, _ = step(params, opt.init(params), gbi, gbl)
    np.savez(f"{out_dir}/step_rank{pid}.npz",
             loss=np.asarray(loss),
             **{k: np.asarray(v) for k, v in p1.items()})

    # 2) multi-host INFERENCE: the xla datapath sharded over both hosts;
    # each host feeds its own images and fetches ONLY its own rows back.
    import jax.numpy as jnp

    from tpu_cnn.engine.cpu_ref import numpy_cnn_forward
    from tpu_cnn.parallel.mesh import sharded_forward
    from tpu_cnn.parallel.multihost import global_image_batch, local_rows

    k_rs = np.random.RandomState(11)
    kernels = [
        k_rs.randint(-128, 128, (oc, ic, 3, 3)).astype(np.int8)
        for ic, oc, _ in cfg.layer_configs
    ]
    shifts = (2, 4, 6)
    all_imgs = k_rs.randint(0, 256, (16, 32, 32)).astype(np.uint8)
    per = 16 // nproc
    half = all_imgs[pid * per:(pid + 1) * per]
    g = global_image_batch(mesh, half)
    assert not g.is_fully_addressable
    f = sharded_forward(mesh, [jnp.asarray(k) for k in kernels])
    mine = local_rows(f(g, jnp.asarray(shifts, jnp.int32)))
    assert mine.shape[0] == per
    for b in range(per):
        np.testing.assert_array_equal(
            mine[b], numpy_cnn_forward(half[b], kernels, shifts)
        )
    print(f"rank {pid} inference parity ok", flush=True)

    # 2b) the MultiHostEngine facade: per-host feed, per-host results,
    # UNEVEN local batches (padding consensus), oracle parity per rank.
    from tpu_cnn.models.cnn import CNNConfig, FpgaCNN
    from tpu_cnn.parallel.multihost import MultiHostEngine

    model = FpgaCNN(
        kernels,
        np.random.RandomState(5).randn(6, 64).astype(np.float32) * 0.05,
        np.zeros(6, np.float32),
        shifts=shifts,
        config=CNNConfig(layer_configs=cfg.layer_configs),
    )
    eng = MultiHostEngine(model, backend="xla")
    n_local = min(per, [5, 3, 2, 4][pid % 4])  # uneven across hosts
    sub = half[:n_local]
    feats = eng.run_batch(sub)
    assert feats.shape[0] == n_local
    for i in range(n_local):
        np.testing.assert_array_equal(
            feats[i], numpy_cnn_forward(sub[i], kernels, shifts)
        )
    res = eng.detect_batch(sub)
    assert res.pred.shape == (n_local,) and res.bbox.shape == (n_local, 4)
    # a host with NOTHING to feed this tick must still join the collective
    # call and get an empty result back (the uneven extreme)
    n0 = 4 if pid == 0 else 0  # other ranks feed nothing
    feats0 = eng.run_batch(half[:n0])
    assert feats0.shape[0] == n0
    print(f"rank {pid} engine ok", flush=True)

    # 3) orbax sharded checkpointing UNDER multi-host: every rank joins the
    # collective save (each host writes its shards), restore comes back
    # with the template shardings and the exact values.
    from tpu_cnn.train.checkpoint_sharded import ShardedCheckpointer

    ck = ShardedCheckpointer(f"{out_dir}/mh_ckpt")
    ck.save(1, p1, o1, 0.5, p1)
    ck.close()
    ck2 = ShardedCheckpointer(f"{out_dir}/mh_ckpt")
    rp, _, ep, acc, _ = ck2.restore(p1, o1)
    ck2.close()
    assert ep == 1 and abs(acc - 0.5) < 1e-9
    for k in p1:
        np.testing.assert_array_equal(np.asarray(rp[k]), np.asarray(p1[k]))
    print(f"rank {pid} ckpt roundtrip ok", flush=True)

    # 4) the FULL two-phase train() across both hosts; primary exports the
    # bundle, the other rank computes everything but writes nothing.
    ds = D.SyntheticShapes(n_per_class=16, img_size=32)
    imgs, labels = ds.arrays()
    n_val = len(imgs) // 6
    bundle = train(cfg, (imgs[n_val:], labels[n_val:]),
                   (imgs[:n_val], labels[:n_val]),
                   f"{out_dir}/bundle", class_names=ds.class_names,
                   mesh=mesh, verbose=is_primary())
    assert bundle is not None
    print(f"rank {pid} done", flush=True)


if __name__ == "__main__":
    main()
