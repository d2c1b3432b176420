"""lyr4-wide TAIL megakernel component ablation on hardware.

After the round-4 phase-aligned chain (probe_lyr4_phase.py) the tb=1 tail
(layers 1-3 at 128^2..32^2, 226.5M MACs/img) is the dominant term
(~5.9 us/img of the 12.0 chain). Attribute it before designing the next
kernel: the tb=1 block-diag matmul runs L1 at M=32 of 128 MXU rows (25%
utilisation) and L2 at 50% — if mm1tap shows the MXU share is large, the
lever is PACKING (more batch in the block diagonal via lane-chunked
staging), not faster staging.

Variants (same measurement hooks as probe_mega_ablate.py, interleaved
best-of-N, one process; argv[1] = comma subset):
  full     tail on pre-split rows (the production plan's second stage)
  noroll   rolls replaced by the unrolled source (WRONG values)
  notaps   only tap 0 staged            -> full-notaps ~ 8/9 staging cost
  mm1tap   full staging, 1/9 of matmul  -> full-mm1tap ~ 8/9 MXU cost
Input rows are precomputed ON DEVICE once (conv_pool_layer_phase output),
so every variant times the tail kernel alone behind the async pipeline.
Results: docs/DESIGN.md "Roofline - lyr4-wide chained plan".
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

VARIANTS = ("full", "noroll", "notaps", "mm1tap")


def main():
    global VARIANTS
    if len(sys.argv) > 1:
        VARIANTS = tuple(sys.argv[1].split(","))
    import jax
    import jax.numpy as jnp

    from tpu_cnn.apps.common import load_model
    from tpu_cnn.ops import pallas_poly

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = load_model(os.path.join(repo, "artifacts", "pretrained-lyr4"),
                       "lyr4-wide")
    kernels = [jnp.asarray(k) for k in model.kernels]
    shifts = jnp.asarray(model.shifts, jnp.int32)
    s = model.config.img_size

    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1536
    rs = np.random.RandomState(0)
    l0p = jax.jit(lambda x: pallas_poly.conv_pool_layer_phase(
        x[:, None, :, :], kernels[0], shifts[0], h=8))
    pools = [
        jax.block_until_ready(l0p(jnp.asarray(
            rs.randint(0, 256, (batch, s, s), dtype=np.uint8))))
        for _ in range(2)
    ]

    fwd = {}
    for v in VARIANTS:
        ab = "" if v == "full" else v
        fwd[v] = jax.jit(
            lambda x, ab=ab: pallas_poly.cnn_forward_polyphase_pallas(
                x, kernels[1:], shifts[1:], tb=1, pre_split=True,
                with_bins=True, with_twin=True, with_feats=True, ablate=ab
            )
        )
        jax.block_until_ready(fwd[v](pools[0]))
        print(f"  compiled {v}", flush=True)

    rounds = 30

    def measure(v):
        t0 = time.perf_counter()
        probes = []
        for i in range(rounds):
            o = fwd[v](pools[i % 2])
            p = o[0][0, 0, :8]
            p.copy_to_host_async()
            probes.append(p)
        res = [np.asarray(p) for p in probes]
        dt = time.perf_counter() - t0
        assert len(res) == rounds
        return dt / rounds / batch * 1e6  # us/img

    best = {v: 1e9 for v in VARIANTS}
    for r in range(4):
        for v in VARIANTS:
            best[v] = min(best[v], measure(v))
        print(f"  round {r}: " + "  ".join(
            f"{v}={best[v]:.2f}" for v in VARIANTS), flush=True)

    print("\n  TAIL ABLATION (us/img, batch %d, best-of-4x%d)" %
          (batch, rounds))
    for v in VARIANTS:
        print(f"    {v:10s} {best[v]:7.2f}")
    if "full" in best:
        f = best["full"]
        for v in VARIANTS:
            if v != "full":
                print(f"    full-{v:8s} {f - best[v]:+7.2f}")


if __name__ == "__main__":
    main()
