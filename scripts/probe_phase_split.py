"""Faster phase-split formulations, measured on hardware.

probe_lyr4_relayout measured the u8 phase_split_nchw(., 8) transpose of
the (B,16,128,128) L0 output at ~12.9 us/img — HALF the lyr4 chain. An
XLA byte-granular transpose runs on the VPU at ~20 GB/s effective. Two
cheaper formulations exist:

  mxu     the (Y%h, Y//h) row/col swaps ride the MXU as one-hot
          permutation matmuls B = P @ A @ P^T (bf16 is exact for u8
          values): gives (qy, ly, qx, lx) order; the residual
          (ly <-> qx) middle swap is a 16-byte-granule transpose
          (coarser = cheaper than byte-granular).
  i32     widen u8 -> i32, transpose at 4-byte granules, narrow back.
  2hop    byte transpose split into two coarser XLA transposes via the
          (qy, ly, qx, lx) intermediate.

Also measured: the flagship's own input split (phase_split_batch g=8 on
128^2, 1 ch) and the lyr4 L0 input split variants — every production
megakernel pays one of these on its input edge.

All variants are value-checked against the reference split before timing.
Results: docs/DESIGN.md "Roofline — lyr4-wide chained plan".
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def perm_matrix(h, t, dtype):
    """P[r', r] = 1 where r' = (r % h) * t + r // h (the (local, phase) ->
    (phase, local) row swap for an S = h*t axis)."""
    import jax.numpy as jnp
    s = h * t
    r = np.arange(s)
    p = np.zeros((s, s), np.float32)
    p[(r % h) * t + r // h, r] = 1.0
    return jnp.asarray(p, dtype)


def main():
    import jax
    import jax.numpy as jnp

    from tpu_cnn.ops import pallas_poly

    batch = 256
    rs = np.random.RandomState(0)
    xs = [
        jnp.asarray(rs.randint(0, 256, (batch, 16, 128, 128),
                               dtype=np.uint8))
        for _ in range(2)
    ]
    f_in = [
        jnp.asarray(rs.randint(0, 256, (batch, 128, 128), dtype=np.uint8))
        for _ in range(2)
    ]
    jax.block_until_ready([xs, f_in])

    h, s = 8, 128
    t = s // h
    p8 = perm_matrix(h, t, jnp.bfloat16)

    def t8_ref(x):
        return pallas_poly.phase_split_nchw(x, h)

    def t8_mxu(x):
        b, c = x.shape[:2]
        a = x.astype(jnp.bfloat16)
        v = jnp.einsum("ru,bcuv,sv->bcrs", p8, a, p8,
                       preferred_element_type=jnp.bfloat16)
        v = v.astype(jnp.uint8).reshape(b, c, h, t, h, t)
        return v.transpose(0, 1, 2, 4, 3, 5).reshape(b, c, s * s)

    def t8_i32(x):
        b, c = x.shape[:2]
        v = x.astype(jnp.int32).reshape(b, c, t, h, t, h)
        v = v.transpose(0, 1, 3, 5, 2, 4).reshape(b, c, s * s)
        return v.astype(jnp.uint8)

    def t8_2hop(x):
        b, c = x.shape[:2]
        v = x.reshape(b, c, t, h, t, h)
        v = v.transpose(0, 1, 3, 2, 5, 4)     # (qy, ly, qx, lx)
        v = v.transpose(0, 1, 2, 4, 3, 5)     # (qy, qx, ly, lx)
        return v.reshape(b, c, s * s)

    # flagship input split (g=8 on a 1-channel 128^2 image, 16 KB/img)
    def f8_ref(x):
        return pallas_poly.phase_split_batch(x, h)

    def f8_mxu(x):
        return t8_mxu(x[:, None, :, :])

    fns = {
        "t8_ref": t8_ref, "t8_mxu": t8_mxu, "t8_i32": t8_i32,
        "t8_2hop": t8_2hop, "f8_ref": f8_ref, "f8_mxu": f8_mxu,
    }
    stage_pools = {"f8_ref": f_in, "f8_mxu": f_in}

    # value gate
    gate = jnp.asarray(rs.randint(0, 256, (3, 16, 128, 128), dtype=np.uint8))
    want = np.asarray(jax.jit(t8_ref)(gate))
    gate_f = jnp.asarray(rs.randint(0, 256, (3, 128, 128), dtype=np.uint8))
    want_f = np.asarray(jax.jit(f8_ref)(gate_f))

    jfns = {}
    for v, fn in fns.items():
        jfns[v] = jax.jit(fn)
        jax.block_until_ready(jfns[v](stage_pools.get(v, xs)[0]))
        msg = ""
        if v.startswith("t8") and v != "t8_ref":
            ok = np.array_equal(np.asarray(jfns[v](gate)), want)
            msg = " — " + ("BIT-EXACT" if ok else "MISMATCH")
        if v == "f8_mxu":
            got = np.asarray(jfns[v](gate_f))[:, 0]
            ok = np.array_equal(got, want_f.reshape(got.shape))
            msg = " — " + ("BIT-EXACT" if ok else "MISMATCH")
        print(f"  compiled {v}{msg}", flush=True)

    rounds = 20

    def measure(v):
        pool = stage_pools.get(v, xs)
        fn = jfns[v]
        t0 = time.perf_counter()
        probes = []
        for i in range(rounds):
            o = fn(pool[i % 2])
            p = o.reshape(-1)[:8]
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
    print(f"\n  {'variant':8s} {'us/img':>8s}")
    for v in jfns:
        print(f"  {v:8s} {best[v]:8.3f}")


if __name__ == "__main__":
    main()
