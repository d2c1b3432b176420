"""Real-TPU A/B: synchronous epoch loop vs pipelined loop (train()).

Old loop: per-step ``jnp.asarray`` upload + per-step ``float(loss)`` fetch —
each step pays a full host round-trip (~30 ms through this relay).
New loop (shipped in train_cnn.train): ``_prefetch_to_device`` stages the
next batch while the current step runs, metrics stay device scalars until
one coalesced fetch at epoch end.

Interleaved best-of-N in ONE process (relay variance rule, CLAUDE.md).

Usage: python scripts/probe_train_loop.py [batch] [steps] [passes]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from tpu_cnn.models.cnn import LAYER_CONFIGS
    from tpu_cnn.train.train_cnn import (
        TrainConfig, _prefetch_to_device, init_params, make_train_step,
    )

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    cfg = TrainConfig(layer_configs=LAYER_CONFIGS, batch_size=batch)
    params = init_params(cfg, jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    state0 = opt.init(params)
    step = make_train_step(cfg, opt)
    rs = np.random.RandomState(0)
    host_batches = [
        (rs.rand(batch, 128, 128).astype(np.float32),
         rs.randint(0, 6, batch).astype(np.int64))
        for _ in range(steps)
    ]

    def epoch_sync():
        p, s = params, state0
        losses = []
        for bi, bl in host_batches:
            p, s, loss, _ = step(p, s, jnp.asarray(bi),
                                 jnp.asarray(bl.astype(np.int32)))
            losses.append(float(loss))  # blocks every step
        return np.mean(losses)

    def epoch_pipelined():
        p, s = params, state0
        losses = []
        for bi, bl in _prefetch_to_device(iter(host_batches)):
            p, s, loss, _ = step(p, s, bi, bl)
            losses.append(loss)
        return np.mean(jax.device_get(losses))  # one coalesced fetch

    loops = {"sync     ": epoch_sync, "pipelined": epoch_pipelined}
    for fn in loops.values():
        fn()  # compile + warm
    best = {k: float("inf") for k in loops}
    for _ in range(passes):
        for name, fn in loops.items():  # interleaved
            t0 = time.perf_counter()
            fn()
            best[name] = min(best[name], (time.perf_counter() - t0) / steps)
    for name, dt in best.items():
        print(f"  {name}: {dt * 1e3:8.2f} ms/step  "
              f"{batch / dt:9,.0f} img/s  (batch {batch})")
    print(f"  pipelined speedup: {best['sync     '] / best['pipelined']:.2f}x")


if __name__ == "__main__":
    main()
