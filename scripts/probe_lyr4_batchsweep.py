"""lyr4-wide production-chain batch sweep on hardware.

The chained plan's per-call relay dispatch floor (~3 ms) costs ~2.0
us/img at batch 1536 — 16% of the 12.2 us/img e2e. Larger batches
amortise it; this probe times ONLY the production path (phase-aligned
L0 + pre-split tail + fused detect head) plus the noop floor per batch,
skipping the XLA-oracle chain whose f32 conv output (4.2 MB/img) OOMs
HBM above ~4k images. Parity for the production chain is gated
elsewhere (probe_lyr4_phase.py at 1536; the -m tpu hardware lane).

Results: docs/DESIGN.md "Roofline — lyr4-wide chained plan" (round 5).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

BATCHES = (1536, 3072, 6144)


def main():
    import jax
    import jax.numpy as jnp

    from tpu_cnn.apps.common import load_model
    from tpu_cnn.ops import detect_head, pallas_poly

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = load_model(os.path.join(repo, "artifacts", "pretrained-lyr4"),
                       "lyr4-wide")
    kernels = [jnp.asarray(k) for k in model.kernels]
    shifts = jnp.asarray(model.shifts, jnp.int32)
    fc_w = jnp.asarray(model.fc_weight)
    fc_b = jnp.asarray(model.fc_bias)
    s = model.config.img_size
    batches = ([int(b) for b in sys.argv[1].split(",")] if len(sys.argv) > 1
               else list(BATCHES))

    def e2ep(x):
        rows = pallas_poly.conv_pool_layer_phase(
            x[:, None, :, :], kernels[0], shifts[0], h=8)
        _, pooled, twin = pallas_poly.cnn_forward_polyphase_pallas(
            rows, kernels[1:], shifts[1:], tb=1, pre_split=True,
            with_bins=True, with_twin=True, with_feats=True)
        return detect_head.detect_with_pooled(
            None, pooled, fc_w, fc_b, s, features_twin=twin)

    noop = jax.jit(lambda x: x[:, :1, :1].astype(jnp.int32) + 1)
    je2e = jax.jit(e2ep)
    rounds = 10
    rs = np.random.RandomState(0)

    print(f"  {'batch':>6s} {'floor':>7s} {'e2e':>7s} {'-floor':>7s} "
          f"{'FPS':>9s}")
    for batch in batches:
        pools = [jnp.asarray(rs.randint(0, 256, (batch, s, s),
                                        dtype=np.uint8)) for _ in range(2)]
        jax.block_until_ready(noop(pools[0]))
        jax.block_until_ready(je2e(pools[0]))

        def measure(fn, probe):
            t0 = time.perf_counter()
            ps = []
            for i in range(rounds):
                o = fn(pools[i % 2])
                p = probe(o)
                p.copy_to_host_async()
                ps.append(p)
            _ = [np.asarray(p) for p in ps]
            return (time.perf_counter() - t0) / rounds / batch * 1e6

        best = {"noop": 1e9, "e2e": 1e9}
        for _ in range(4):
            best["noop"] = min(best["noop"],
                               measure(noop, lambda o: o[0, 0, :1]))
            best["e2e"] = min(best["e2e"], measure(je2e, lambda o: o[0][:8]))
        print(f"  {batch:6d} {best['noop']:7.2f} {best['e2e']:7.2f} "
              f"{best['e2e'] - best['noop']:7.2f} {1e6 / best['e2e']:9,.0f}",
              flush=True)
        del pools


if __name__ == "__main__":
    main()
