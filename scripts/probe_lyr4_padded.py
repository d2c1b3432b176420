"""lyr4-wide L0-in-the-megakernel probe: zero-padded input channels.

probe_lyr4_roofline.py showed layer 0 — 4% of the MACs — costs 24.9 of
the 29.6 us/img (84%): the 1-input-channel 256 stencil reroutes to the
XLA conv (Mosaic miscompiles int8 staging below 4 sublane rows, so the
megakernel refuses tb*ic0 < 4, and tb=4 at 256 blows VMEM). This probe
tests the workaround the plan family can't express: PAD the input to 4
channels (3 zero planes + zero kernel columns — mathematically identical
output, 4x the layer-0 staging traffic) so tb=1 satisfies the sublane
rule, then run

  pad2L    L0+L1 in ONE 2-layer megakernel (t=64, est 15.2 MiB) +
           the layers-2-3 tail at tb=2 (est 9.8 MiB)
  padwhole the WHOLE padded net in one megakernel at tb=1 (est 17.1 MiB)

Both exceed the conservative 14 MiB budget model, so the probe lifts
POLY_VMEM_BUDGET and lets Mosaic decide — if it compiles and beats the
production 29.6 us/img AND hardware-parity-gates bit-exact, the plan
search learns the padding trick; if not, the result is recorded and the
chained plan stands as the measured floor.

Results: docs/DESIGN.md "Roofline — lyr4-wide chained plan".
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

VARIANTS = ("e2e", "pad2L", "padwhole")


def main():
    global VARIANTS
    if len(sys.argv) > 1:
        VARIANTS = tuple(sys.argv[1].split(","))
    import jax
    import jax.numpy as jnp

    from tpu_cnn.apps.common import load_model
    from tpu_cnn.ops import pallas_poly

    pallas_poly.POLY_VMEM_BUDGET = 18 * 1024 * 1024  # let Mosaic decide

    model = load_model("/root/repo/artifacts/pretrained-lyr4", "lyr4-wide")
    kernels = [jnp.asarray(k) for k in model.kernels]
    k0p = jnp.zeros((kernels[0].shape[0], 4, 3, 3), kernels[0].dtype)
    k0p = k0p.at[:, :1].set(kernels[0])
    shifts = jnp.asarray(model.shifts, jnp.int32)
    img_size = model.config.img_size

    batch = 256
    rs = np.random.RandomState(0)
    pools = [
        jnp.asarray(rs.randint(0, 256, (batch, img_size, img_size),
                               dtype=np.uint8))
        for _ in range(2)
    ]
    jax.block_until_ready(pools)

    def pad4(images):
        x = jnp.zeros((images.shape[0], 4, img_size, img_size), jnp.uint8)
        return x.at[:, 0].set(images)

    def fwd_prod(images):
        return pallas_poly.cnn_forward_mega(
            images, kernels, shifts,
            with_bins=True, with_twin=True, with_feats=True)

    def pad2L(images):
        x = pallas_poly.cnn_forward_polyphase_pallas(
            pad4(images), [k0p, kernels[1]], shifts[:2], tb=1,
            with_feats=True)
        b, c, ss = x.shape
        s = int(round(ss ** 0.5))
        return pallas_poly.cnn_forward_polyphase_pallas(
            x.reshape(b, c, s, s), kernels[2:], shifts[2:], tb=2,
            with_bins=True, with_twin=True, with_feats=True)

    def padwhole(images):
        return pallas_poly.cnn_forward_polyphase_pallas(
            pad4(images), [k0p] + list(kernels[1:]), shifts, tb=1,
            with_bins=True, with_twin=True, with_feats=True)

    fns = {"e2e": fwd_prod, "pad2L": pad2L, "padwhole": padwhole}

    gate = jnp.asarray(rs.randint(0, 256, (8, img_size, img_size),
                                  dtype=np.uint8))
    want = [np.asarray(a) for a in jax.jit(fwd_prod)(gate)]

    jfns = {}
    for v in VARIANTS:
        try:
            jfns[v] = jax.jit(fns[v])
            jax.block_until_ready(jfns[v](pools[0]))
        except Exception as e:
            print(f"  {v}: COMPILE/RUN FAILED — {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        got = [np.asarray(a) for a in jfns[v](gate)]
        feats_ok = np.array_equal(got[0], want[0])
        bins_ok = np.allclose(got[1], want[1], atol=1e-5)  # float head
        # contract: u8 features bit-exact; float bins within the same
        # atol apps.verify uses (fused epilogue rounds once per tile)
        msg = (" — parity feats BIT-EXACT, bins atol-1e-5 OK"
               if feats_ok and bins_ok
               else f" — parity MISMATCH (feats {feats_ok} bins {bins_ok})")
        print(f"  compiled {v}{msg}", flush=True)

    rounds = 20

    def measure(v):
        fn = jfns[v]
        t0 = time.perf_counter()
        probes = []
        for i in range(rounds):
            o = fn(pools[i % 2])
            p = o[1].reshape(-1)[:8]
            p.copy_to_host_async()
            probes.append(p)
        res = [np.asarray(p) for p in probes]
        dt = time.perf_counter() - t0
        assert len(res) == rounds
        return dt / rounds / batch * 1e6

    live = [v for v in VARIANTS if v in jfns]
    best = {v: 1e9 for v in live}
    for _ in range(4):
        for v in live:
            best[v] = min(best[v], measure(v))
    print(f"\n  {'variant':9s} {'us/img':>8s} {'FPS':>10s}")
    for v in live:
        print(f"  {v:9s} {best[v]:8.3f} {1e6 / best[v]:10,.0f}")


if __name__ == "__main__":
    main()
