"""Interleaved A/B of the PRODUCTION detect config (bench.py's measured
program: megakernel with_bins + f32 twin + fused head) — the i32 pool
(``full``, production) vs the bf16 pool (``ablate=poolbf16``).

OUTCOME (2026-08-18, healthy relay): i32 wins — detect e2e 3.676 vs 3.803
us/img (and the forward config agrees: 3.575 vs 3.945 via
probe_mega_ablate.py full,poolbf16). An earlier degraded-relay session
(forward baselines inflated to 5.56/6.40 us/img) measured the OPPOSITE
sign (-0.84 us/img for bf16), which briefly promoted bf16 to production;
this probe run on a normal session reversed it. Moral: only trust A/Bs
whose "full" lands in the normal 3.3-4.0 us/img band, and re-run the
winning variant on a second session before shipping it.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

VARIANTS = ("full", "poolbf16")


def main():
    import jax
    import jax.numpy as jnp

    from tpu_cnn.models.cnn import DEFAULT_SHIFTS
    from tpu_cnn.ops import detect_head, pallas_poly
    from tpu_cnn.utils import artifacts as art
    from tpu_cnn.utils.paths import default_artifacts

    bundle = art.load_bundle(default_artifacts())
    kernels = [jnp.asarray(k) for k in bundle.kernels]
    fc_w = jnp.asarray(bundle.fc_weight)
    fc_b = jnp.asarray(bundle.fc_bias)
    shifts = jnp.asarray(DEFAULT_SHIFTS, jnp.int32)

    batch = 1536
    rs = np.random.RandomState(0)
    pools = [
        jnp.asarray(rs.randint(0, 256, (batch, 128, 128), dtype=np.uint8))
        for _ in range(2)
    ]
    jax.block_until_ready(pools)

    fns = {}
    for v in VARIANTS:
        ab = "" if v == "full" else v

        @jax.jit
        def detect(images, ab=ab):
            feats, pooled, feats_twin = pallas_poly.cnn_forward_polyphase_pallas(
                images, kernels, shifts, with_bins=True, with_twin=True,
                ablate=ab,
            )
            pred, conf, _, bbox = detect_head.detect_with_pooled(
                feats, pooled, fc_w, fc_b, 128, features_twin=feats_twin
            )
            return pred, conf, bbox

        fns[v] = detect
        jax.block_until_ready(fns[v](pools[0]))
        print(f"  compiled {v}", flush=True)

    rounds = 30

    def measure(v):
        t0 = time.perf_counter()
        outs = []
        for i in range(rounds):
            pred, conf, bbox = fns[v](pools[i % 2])
            pred.copy_to_host_async()
            outs.append(pred)
        res = [np.asarray(p) for p in outs]
        dt = time.perf_counter() - t0
        assert len(res) == rounds
        return dt / rounds / batch * 1e6  # us/img

    best = {v: 1e9 for v in VARIANTS}
    for r in range(6):
        for v in VARIANTS:
            best[v] = min(best[v], measure(v))
        print(f"  round {r}: " + "  ".join(
            f"{v}={best[v]:.3f}us" for v in VARIANTS), flush=True)
    a, b = VARIANTS
    print(f"\n  detect e2e us/img: {a}(i32)={best[a]:.3f} "
          f"{b}={best[b]:.3f} delta={best[b] - best[a]:+.3f} "
          f"({1e6 / best[a] / 1000:.1f}k vs {1e6 / best[b] / 1000:.1f}k FPS)")


if __name__ == "__main__":
    main()
