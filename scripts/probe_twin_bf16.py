"""Interleaved A/B of the detect config — bf16 feature twin (``full``,
PRODUCTION since this probe) vs the original f32 twin (``ablate=twinf32``).

The feature twin is the megakernel's widest output: (B, 64, 256) at f32 it
was 64 KB/img of VMEM->HBM stores, re-read by the head's CAM matmul.
0..255 is exact in bf16 and the consumer-side bf16->f32 upcast is exact
(detect_head.detect_with_pooled performs it; it fuses into the CAM matmul
read), so the bf16 twin is bit-identical end-to-end at half that traffic.

OUTCOME (2026-08-18, healthy-relay session, baseline in the normal band):
bf16 twin WINS — detect e2e 3.529 vs 3.625 us/img (-0.096), re-confirmed
in a SECOND fresh process at 3.537 vs 3.622 (-0.084). Promoted to
production (the ``with_twin`` output is bf16; ``ablate=twinf32`` keeps
the old width measurable). Contrast with poolbf16 (scripts/
probe_detect_pool_ab.py), where narrowing an in-VMEM compute chain LOST:
here the narrowing is a store/reload width with exact-value semantics and
no extra re-widen on the hot path.

Parity: both variants' (pred, conf, bbox) are asserted equal on the gate
batch before timing.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

VARIANTS = ("full", "twinf32")


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
            feats, pooled, twin = pallas_poly.cnn_forward_polyphase_pallas(
                images, kernels, shifts, with_bins=True, with_twin=True,
                ablate=ab,
            )
            pred, conf, _, bbox = detect_head.detect_with_pooled(
                feats, pooled, fc_w, fc_b, 128, features_twin=twin,
            )
            return pred, conf, bbox

        fns[v] = detect
        jax.block_until_ready(fns[v](pools[0]))
        print(f"  compiled {v}", flush=True)

    # value parity between the variants on a shared batch (full batch so
    # the already-compiled shape is reused — no extra relay compiles)
    gate = pools[0]
    a = [np.asarray(x) for x in fns[VARIANTS[0]](gate)]
    b = [np.asarray(x) for x in fns[VARIANTS[1]](gate)]
    ok = all(np.array_equal(x, y) for x, y in zip(a, b))
    print(f"  cross-variant parity: {'BIT-EXACT' if ok else 'MISMATCH'}",
          flush=True)
    if not ok:
        sys.exit(1)

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
    a_, b_ = VARIANTS
    print(f"\n  detect e2e us/img: {a_}(bf16 twin)={best[a_]:.3f} "
          f"{b_}={best[b_]:.3f} delta={best[b_] - best[a_]:+.3f} "
          f"({1e6 / best[a_] / 1000:.1f}k vs {1e6 / best[b_] / 1000:.1f}k FPS)")


if __name__ == "__main__":
    main()
