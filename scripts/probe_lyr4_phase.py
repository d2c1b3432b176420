"""Phase-aligned lyr4 chain on hardware: parity + interleaved timing of

  noop    per-call floor
  L0p     conv_pool_layer_phase alone (output = tail rows layout)
  chainx  XLA L0 + tail (the r3 production plan)
  chainc  g=2 chunked L0 + tail on NCHW (the first r4 wiring)
  chainp  phase-aligned L0 + pre_split tail (the new production plan)
  e2ep    chainp + fused detect head (the bench path)

All value-preserving chains are parity-gated bit-exact against chainx
(feats AND bins) before timing. Results: docs/DESIGN.md "Roofline —
lyr4-wide chained plan".
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
    from tpu_cnn.ops import detect_head, pallas_int8, pallas_poly

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = load_model(os.path.join(repo, "artifacts", "pretrained-lyr4"),
                       "lyr4-wide")
    kernels = [jnp.asarray(k) for k in model.kernels]
    kmat0 = pallas_int8.pack_kernel_matrix(model.kernels[0])
    shifts = jnp.asarray(model.shifts, jnp.int32)
    fc_w = jnp.asarray(model.fc_weight)
    fc_b = jnp.asarray(model.fc_bias)
    s = model.config.img_size

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1536
    rs = np.random.RandomState(0)
    pools = [
        jnp.asarray(rs.randint(0, 256, (batch, s, s), dtype=np.uint8))
        for _ in range(2)
    ]

    def l0p(x):
        return pallas_poly.conv_pool_layer_phase(
            x[:, None, :, :], kernels[0], shifts[0], h=8)

    def tail(x, pre_split=False):
        return pallas_poly.cnn_forward_polyphase_pallas(
            x, kernels[1:], shifts[1:], tb=1, pre_split=pre_split,
            with_bins=True, with_twin=True, with_feats=True)

    def chainx(x):
        return tail(pallas_int8.fused_conv_layer(
            x[:, None, :, :], kmat0, shifts[0]))

    def chainc(x):
        return tail(pallas_poly.conv_pool_layer_poly(
            x[:, None, :, :], kernels[0], shifts[0]))

    def chainp(x):
        return tail(l0p(x), pre_split=True)

    def e2ep(x):
        _, pooled, twin = chainp(x)
        return detect_head.detect_with_pooled(
            None, pooled, fc_w, fc_b, s, features_twin=twin)

    fns = {
        "noop": lambda x: x[:, :1, :1].astype(jnp.int32) + 1,
        "L0p": l0p,
        "chainx": chainx,
        "chainc": chainc,
        "chainp": chainp,
        "e2ep": e2ep,
    }

    gate = jnp.asarray(rs.randint(0, 256, (9, s, s), dtype=np.uint8))
    want = [np.asarray(a) for a in jax.jit(chainx)(gate)]

    jfns = {}
    for v, fn in fns.items():
        jfns[v] = jax.jit(fn)
        jax.block_until_ready(jfns[v](pools[0]))
        msg = ""
        if v in ("chainc", "chainp"):
            got = [np.asarray(a) for a in jfns[v](gate)]
            ok = all(np.array_equal(g, w) for g, w in zip(got, want))
            msg = " — parity " + ("BIT-EXACT" if ok else "MISMATCH")
        print(f"  compiled {v}{msg}", flush=True)

    rounds = 10

    def measure(v):
        fn = jfns[v]
        t0 = time.perf_counter()
        probes = []
        for i in range(rounds):
            o = fn(pools[i % 2])
            leaf = o[1] if isinstance(o, tuple) else o
            p = leaf.reshape(-1)[:8]
            p.copy_to_host_async()
            probes.append(p)
        res = [np.asarray(p) for p in probes]
        dt = time.perf_counter() - t0
        assert len(res) == rounds
        return dt / rounds / batch * 1e6

    best = {v: 1e9 for v in jfns}
    for _ in range(4):
        for v in jfns:
            best[v] = min(best[v], measure(v))
    floor = best["noop"]
    print(f"\n  batch {batch}; per-call floor {floor:.3f} us/img")
    print(f"  {'variant':8s} {'us/img':>8s} {'-floor':>8s} {'FPS':>9s}")
    for v in jfns:
        print(f"  {v:8s} {best[v]:8.3f} {best[v] - floor:8.3f} "
              f"{1e6 / best[v]:9,.0f}")


if __name__ == "__main__":
    main()
