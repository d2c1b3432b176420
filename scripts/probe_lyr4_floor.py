"""Floor-calibrated lyr4 stage timings. probe_phase_split exposed that
standalone small programs at batch 256 all cost ~8 us/img regardless of
data size — a fixed per-call dispatch/readback floor, not compute. Every
per-stage number in probe_lyr4_{roofline,relayout} carries that floor.
This probe re-measures the key stages at batch 1536 (the bench batch) in
ONE process, interleaved, INCLUDING an explicit floor variant (a trivial
program on the same pool), so stage costs can be reported floor-subtracted:

  noop    x[:, :1, :1, :1] widened + 1  (the per-call floor)
  t8      phase_split_nchw(x1, 8) u8 transpose
  t8i32   same via i32 widen/narrow
  L0c     chunked Pallas L0 (conv_pool_layer_poly)
  L0x     XLA L0 (the old reroute)
  tail    tail megakernel on a precomputed NCHW L0 output
  chain   chunked L0 + tail (the wired production plan)
  chainx  XLA L0 + tail (the pre-round-4 production plan)
  e2e     chain + fused detect head

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
    from tpu_cnn.ops import detect_head, pallas_int8, pallas_poly, quant

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

    def l0c(x):
        return pallas_poly.conv_pool_layer_poly(
            x[:, None, :, :], kernels[0], shifts[0], n_sub=1)

    def l0x(x):
        return pallas_int8.fused_conv_layer(
            x[:, None, :, :], kmat0, shifts[0])

    x1 = [jax.jit(l0x)(p) for p in pools]
    jax.block_until_ready(x1)

    def tail(x):
        return pallas_poly.cnn_forward_polyphase_pallas(
            x, kernels[1:], shifts[1:], tb=1,
            with_bins=True, with_twin=True, with_feats=True)

    def e2e(images):
        _, pooled, twin = tail(l0c(images))
        return detect_head.detect_with_pooled(
            None, pooled, fc_w, fc_b, s, features_twin=twin)

    fns = {
        "noop": lambda x: x[:, :1, :1].astype(jnp.int32) + 1,
        "t8": None,
        "t8i32": None,
        "L0c": l0c,
        "L0x": l0x,
        "tail": None,
        "chain": lambda x: tail(l0c(x)),
        "chainx": lambda x: tail(l0x(x)),
        "e2e": e2e,
    }
    fns["t8"] = lambda x: pallas_poly.phase_split_nchw(x, 8)

    def t8i32(x):
        b, c = x.shape[:2]
        v = x.astype(jnp.int32).reshape(b, c, 16, 8, 16, 8)
        v = v.transpose(0, 1, 3, 5, 2, 4).reshape(b, c, 128 * 128)
        return v.astype(jnp.uint8)

    fns["t8i32"] = t8i32
    fns["tail"] = tail
    stage_pools = {"t8": x1, "t8i32": x1, "tail": x1}

    jfns = {}
    for v, fn in fns.items():
        jfns[v] = jax.jit(fn)
        jax.block_until_ready(jfns[v](stage_pools.get(v, pools)[0]))
        print(f"  compiled {v}", flush=True)

    rounds = 10

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
        return dt / rounds / batch * 1e6

    best = {v: 1e9 for v in jfns}
    for _ in range(4):
        for v in jfns:
            best[v] = min(best[v], measure(v))
    floor = best["noop"]
    print(f"\n  batch {batch}; per-call floor {floor:.3f} us/img")
    print(f"  {'variant':8s} {'us/img':>8s} {'-floor':>8s}")
    for v in jfns:
        print(f"  {v:8s} {best[v]:8.3f} {best[v] - floor:8.3f}")


if __name__ == "__main__":
    main()
