"""Megakernel component ablation on hardware — attribute the 3.28 us/img
forward to its constituents before believing any roofline story.

Variants (interleaved best-of-N, one process; pass a comma subset as argv[1]
— each variant costs a ~2-3 min remote compile):
  full     the production kernel
  noroll   rolls replaced by the unrolled source (WRONG values, same VMEM
           traffic minus the tpu.dynamic_rotate op itself)
  nocorr   corrective boundary-run stores skipped (WRONG at block edges)
  notaps   only tap 0 staged (matmul reads mostly-uninitialised xs)
  mm1tap   full staging, 1/9th of the matmul (first tap block)
  slicedot the ROLL-FREE redesign shape probe: input staged once into a
           lane-padded int8 buffer, 9 per-tap MXU dots on m-aligned static
           slices (WRONG at phase-carry boundaries — no masks/corrections)
  poolbf16 activation narrowed to bf16 before the 4-slice max — the one
           narrowing that COMPILES (float max legalizes at 16-bit where
           integer max does not) and is bit-exact. REJECTED on timing:
           healthy-relay interleaved A/B measures it SLOWER than the i32
           production pool in both configs (forward 3.945 vs 3.575
           us/img here; detect e2e 3.803 vs 3.676 in
           probe_detect_pool_ab.py). CAUTION: one degraded-relay session
           (baselines inflated to 5.56/6.40 us/img) measured the
           OPPOSITE sign (-0.84) — re-probe only on a session whose
           "full" lands in the normal 3.3-4.0 band.
  pool8/pool16  integer-narrowed pool operand — both REJECTED: Mosaic
           cannot legalize vector maxui/maxsi at i8/i16 on this build

full - noroll   = cost of the rotate ops alone
full - nocorr   = cost of the boundary corrections
full - notaps   ~ cost of 8/9 of tap staging (rolls + selects + stores)
full - mm1tap   ~ cost of 8/9 of the MXU matmuls
slicedot vs full = would the roll-free formulation win (before investing
                   in its boundary-correction machinery)?
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

VARIANTS = ("full", "noroll", "nocorr", "notaps", "mm1tap", "slicedot")


def main():
    global VARIANTS
    if len(sys.argv) > 1:  # subset: each compile is ~2 min via the relay
        VARIANTS = tuple(sys.argv[1].split(","))
    import jax
    import jax.numpy as jnp

    from tpu_cnn.models.cnn import DEFAULT_SHIFTS
    from tpu_cnn.ops import pallas_poly
    from tpu_cnn.utils import artifacts as art
    from tpu_cnn.utils.paths import default_artifacts

    bundle = art.load_bundle(default_artifacts())
    kernels = [jnp.asarray(k) for k in bundle.kernels]
    shifts = jnp.asarray(DEFAULT_SHIFTS, jnp.int32)

    batch = 1536
    rs = np.random.RandomState(0)
    pools = [
        jnp.asarray(rs.randint(0, 256, (batch, 128, 128), dtype=np.uint8))
        for _ in range(2)
    ]
    jax.block_until_ready(pools)

    # value-preserving variants get a parity gate vs the oracle (pool8 is a
    # candidate production change, not just a timing shape)
    from tpu_cnn.engine.cpu_ref import numpy_cnn_forward

    gate = rs.randint(0, 256, (8, 128, 128)).astype(np.uint8)
    want = np.stack([numpy_cnn_forward(im, bundle.kernels) for im in gate])

    fwd = {}
    for v in VARIANTS:
        ab = "" if v == "full" else v
        fwd[v] = jax.jit(
            lambda x, ab=ab: pallas_poly.cnn_forward_polyphase_pallas(
                x, kernels, shifts, ablate=ab
            )
        )
        jax.block_until_ready(fwd[v](pools[0]))
        msg = ""
        if v in ("full", "pool8", "pool16", "poolbf16"):
            got = np.asarray(fwd[v](jnp.asarray(gate)))
            msg = (" — parity BIT-EXACT" if np.array_equal(got, want)
                   else f" — parity MISMATCH ({(got != want).sum()} values)")
        print(f"  compiled {v}{msg}", flush=True)

    rounds = 30

    def measure(v):
        t0 = time.perf_counter()
        probes = []
        for i in range(rounds):
            o = fwd[v](pools[i % 2])
            p = o[0, 0, :8]
            p.copy_to_host_async()
            probes.append(p)
        res = [np.asarray(p) for p in probes]
        dt = time.perf_counter() - t0
        assert len(res) == rounds
        return dt / rounds / batch * 1e6  # us/img

    best = {v: 1e9 for v in VARIANTS}
    for _ in range(4):
        for v in VARIANTS:
            best[v] = min(best[v], measure(v))
    full = best["full"]
    print(f"\n  {'variant':8s} {'us/img':>8s} {'delta vs full':>14s}")
    for v in VARIANTS:
        print(f"  {v:8s} {best[v]:8.3f} {full - best[v]:+14.3f}")


if __name__ == "__main__":
    main()
