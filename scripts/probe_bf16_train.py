"""Real-TPU A/B: f32 vs bf16 phase-1 train step (train_cnn --bf16).

Interleaved best-of-N in ONE process (relay variance rule, CLAUDE.md).
The shipped single-dtype twin of this measurement is
``tpu_cnn.apps.benchmark --train`` (bench_train); this probe exists for
the INTERLEAVED f32-vs-bf16 A/B, which bench_train's one-dtype-per-call
shape cannot provide — keep the chain/fetch discipline in sync with it.
Each measurement queues a chain of dependent train steps and blocks once at
the end — a single step is ~relay-latency-bound (~30 ms dispatch), so the
chain amortises the tunnel and times the device.

Usage: python scripts/probe_bf16_train.py [batch] [chain] [passes]
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
    from tpu_cnn.train.train_cnn import TrainConfig, init_params, make_train_step

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    chain = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    cfg = TrainConfig(layer_configs=LAYER_CONFIGS, batch_size=batch)
    params = init_params(cfg, jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    rs = np.random.RandomState(0)
    imgs = jnp.asarray(rs.rand(batch, 128, 128).astype(np.float32))
    labels = jnp.asarray(rs.randint(0, 6, batch).astype(np.int32))

    steps = {
        "f32 ": make_train_step(cfg, opt),
        "bf16": make_train_step(cfg, opt, compute_dtype="bfloat16"),
    }
    state0 = opt.init(params)

    def run_chain(step):
        p, s = params, state0
        for _ in range(chain):
            p, s, loss, _ = step(p, s, imgs, labels)
        # device_get a value that depends on the whole chain —
        # block_until_ready does not reliably sync through the relay
        # (CLAUDE.md timing rule)
        return np.asarray(p["fc_b"]).sum() + float(loss)

    for name, step in steps.items():
        run_chain(step)  # compile
    best = {k: float("inf") for k in steps}
    for _ in range(passes):
        for name, step in steps.items():  # interleaved
            t0 = time.perf_counter()
            loss = run_chain(step)
            dt = (time.perf_counter() - t0) / chain
            best[name] = min(best[name], dt)
    f32, bf16 = best["f32 "], best["bf16"]
    for name, dt in best.items():
        print(f"  {name}: {dt * 1e3:8.2f} ms/step  "
              f"{batch / dt:9,.0f} img/s  (batch {batch})")
    print(f"  bf16 speedup: {f32 / bf16:.2f}x")


if __name__ == "__main__":
    main()
