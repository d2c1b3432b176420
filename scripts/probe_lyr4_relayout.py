"""Where do the ~4 us/img between (chunked L0) + (tail mega) and the
measured chain go? probe_lyr4_chunked measured L0-chunk 10.6 + tail 13.7
= 24.3 serial, but the combined jit runs 28.0. The suspect is the u8
relayout between the stages: the chunked kernel emits the pooled 128^2
image lane-row-major, the tail's entry phase-splits it at g0=8 (a
byte-granular (16,8,16,8) transpose of 262 KB/img). This probe times the
pieces on hardware:

  L0c     chunked L0 alone (expected ~10.6)
  L0cT8   chunked L0 + materialised phase_split_nchw(., 8)
  T8      the pure phase-split transpose on a precomputed L0 output
  reshp   the pure (pb*oc, m) -> (pb, oc, t, t) lane-split reshape cost:
          chunked L0 with its output consumed FLAT (sliced, no reshape)
  tail    tail mega on a precomputed NCHW L0 output (expected ~13.7)
  chain   the production chunked chain (expected ~28.0)

Results: docs/DESIGN.md "Roofline — lyr4-wide chained plan".
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
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

    batch = 256
    rs = np.random.RandomState(0)
    pools = [
        jnp.asarray(rs.randint(0, 256, (batch, s, s), dtype=np.uint8))
        for _ in range(2)
    ]

    def l0(x):
        return pallas_poly.conv_pool_layer_poly(
            x[:, None, :, :], kernels[0], shifts[0], n_sub=1)

    x1 = [jax.jit(l0)(p) for p in pools]
    jax.block_until_ready(x1)

    fns = {
        "L0c": l0,
        "L0cT8": lambda x: pallas_poly.phase_split_nchw(l0(x), 8),
        "T8": None,  # runs on x1
        "tail": None,  # runs on x1
        "chain": lambda x: pallas_poly.cnn_forward_polyphase_pallas(
            l0(x), kernels[1:], shifts[1:], tb=1,
            with_bins=True, with_twin=True, with_feats=True),
    }
    fns["T8"] = lambda x: pallas_poly.phase_split_nchw(x, 8)
    fns["tail"] = lambda x: pallas_poly.cnn_forward_polyphase_pallas(
        x, kernels[1:], shifts[1:], tb=1,
        with_bins=True, with_twin=True, with_feats=True)
    stage_pools = {"T8": x1, "tail": x1}

    jfns = {}
    for v, fn in fns.items():
        jfns[v] = jax.jit(fn)
        jax.block_until_ready(jfns[v](stage_pools.get(v, pools)[0]))
        print(f"  compiled {v}", flush=True)

    rounds = 20

    def measure(v):
        pool = stage_pools.get(v, pools)
        fn = jfns[v]
        t0 = time.perf_counter()
        probes = []
        for i in range(rounds):
            o = fn(pool[i % 2])
            leaf = o[1] if isinstance(o, tuple) else o
            p = leaf.reshape(-1)[:8]
            p.copy_to_host_async()
            probes.append(p)
        res = [np.asarray(p) for p in probes]
        dt = time.perf_counter() - t0
        assert len(res) == rounds
        return dt / rounds / batch * 1e6  # us/img

    best = {v: 1e9 for v in jfns}
    for _ in range(4):
        for v in jfns:
            best[v] = min(best[v], measure(v))
    print(f"\n  {'variant':8s} {'us/img':>8s}")
    for v in jfns:
        print(f"  {v:8s} {best[v]:8.3f}")
    print(f"\n  T8-on-top-of-L0c: {best['L0cT8'] - best['L0c']:+.3f}")
    print(f"  chain - (L0cT8 + tail - T8): "
          f"{best['chain'] - best['L0cT8'] - best['tail'] + best['T8']:+.3f}")


if __name__ == "__main__":
    main()
