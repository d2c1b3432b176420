"""Chunked single-layer Pallas L0 vs the XLA reroute on hardware.

probe_lyr4_roofline measured the production lyr4-wide chain at ~29.6 us/img
with the XLA layer 0 alone costing 24.2 (memory-bound: its f32 conv output
materialises 4.2 MB/img in HBM) and the 3-layer tail megakernel 13.7 — the
two overlap, so fwd = 29.6, not 38. ``pallas_poly.conv_pool_layer_poly``
keeps L0's activations in VMEM (65 KB/img in, 262 KB/img u8 out). This
probe (a) parity-gates the chunked kernel bit-exact against
``quant.fixed_point_conv_layer`` ON HARDWARE at the lyr4 L0 geometry,
(b) times it at the planned and neighbouring n_sub, and (c) times the full
chain (chunked L0 + tb=1 tail mega + fused head) against production.

Results: docs/DESIGN.md "Roofline — lyr4-wide chained plan".
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

VARIANTS = None


def main():
    import jax
    import jax.numpy as jnp

    from tpu_cnn.apps.common import load_model
    from tpu_cnn.ops import detect_head, pallas_int8, pallas_poly, quant

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = load_model(os.path.join(repo, "artifacts", "pretrained-lyr4"),
                       "lyr4-wide")
    kernels = [jnp.asarray(k) for k in model.kernels]
    kmats = [pallas_int8.pack_kernel_matrix(k) for k in model.kernels]
    shifts = jnp.asarray(model.shifts, jnp.int32)
    fc_w = jnp.asarray(model.fc_weight)
    fc_b = jnp.asarray(model.fc_bias)
    s = model.config.img_size
    ic, oc = 1, int(kernels[0].shape[0])
    n_plan = pallas_poly.single_layer_plan(ic, oc, s)
    print(f"geometry s={s} ic={ic} oc={oc}  planned n_sub={n_plan}")

    batch = 256
    rs = np.random.RandomState(0)
    pools = [
        jnp.asarray(rs.randint(0, 256, (batch, s, s), dtype=np.uint8))
        for _ in range(2)
    ]
    jax.block_until_ready(pools)

    # ---- (a) hardware parity: chunked kernel vs the XLA oracle ----------
    gate = jnp.asarray(rs.randint(0, 256, (9, s, s), dtype=np.uint8))

    def xla_l0(x):
        y = quant.fixed_point_conv_layer(
            x[..., None], kernels[0], shifts[0])
        return jnp.transpose(y, (0, 3, 1, 2))  # (B, oc, s/2, s/2)

    want = np.asarray(jax.jit(xla_l0)(gate))
    n_subs = [n for n in (1, 2, 4, 8)
              if pallas_poly.single_layer_supported(ic, oc, s, n_sub=n)]
    chunked = {}
    for n in n_subs:
        fn = jax.jit(lambda x, n=n: pallas_poly.conv_pool_layer_poly(
            x[:, None, :, :], kernels[0], shifts[0], n_sub=n))
        got = np.asarray(fn(gate))
        ok = np.array_equal(got, want)
        print(f"  n_sub={n}: parity {'BIT-EXACT' if ok else 'MISMATCH'}")
        if not ok:
            print(f"    mismatch frac {np.mean(got != want):.4f}")
            continue
        chunked[n] = fn

    # ---- full-chain variants -------------------------------------------
    def fwd_prod(images):
        return pallas_poly.cnn_forward_mega(
            images, kernels, shifts,
            with_bins=True, with_twin=True, with_feats=True)

    def fwd_chunked(images, n_sub):
        x = pallas_poly.conv_pool_layer_poly(
            images[:, None, :, :], kernels[0], shifts[0], n_sub=n_sub)
        return pallas_poly.cnn_forward_polyphase_pallas(
            x, kernels[1:], shifts[1:], tb=1,
            with_bins=True, with_twin=True, with_feats=True)

    def e2e_of(fwd):
        def run(images):
            _, pooled, twin = fwd(images)
            return detect_head.detect_with_pooled(
                None, pooled, fc_w, fc_b, s, features_twin=twin)
        return run

    fns = {"L0-xla": xla_l0, "fwd-prod": fwd_prod,
           "e2e-prod": e2e_of(fwd_prod)}
    for n, fn in chunked.items():
        fns[f"L0-chunk{n}"] = fn
        fns[f"fwd-chunk{n}"] = lambda x, n=n: fwd_chunked(x, n)
    if chunked:
        nb = min(chunked)
        fns["e2e-chunk"] = e2e_of(lambda x: fwd_chunked(x, nb))

    want_fwd = [np.asarray(a) for a in jax.jit(fwd_prod)(gate)]
    jfns = {}
    for v, fn in fns.items():
        jfns[v] = jax.jit(fn)
        jax.block_until_ready(jfns[v](pools[0]))
        msg = ""
        if v.startswith("fwd-chunk"):
            got = [np.asarray(a) for a in jfns[v](gate)]
            ok = all(np.array_equal(g, w) for g, w in zip(got, want_fwd))
            msg = " — chain parity " + ("BIT-EXACT" if ok else "MISMATCH")
        print(f"  compiled {v}{msg}", flush=True)

    rounds = 20

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
        return dt / rounds / batch * 1e6  # us/img

    best = {v: 1e9 for v in jfns}
    for _ in range(4):
        for v in jfns:
            best[v] = min(best[v], measure(v))
    print(f"\n  {'variant':12s} {'us/img':>8s} {'FPS':>9s}")
    for v in jfns:
        print(f"  {v:12s} {best[v]:8.3f} {1e6 / best[v]:9,.0f}")


if __name__ == "__main__":
    main()
