"""lyr4-wide L0 phase-kernel batch-tile sweep on hardware.

The round-5 tail ablation (probe_lyr4_tail_ablate.py) confirmed MXU
packing as the dominant lever. The same ⌈M/128⌉·⌈K/128⌉·⌈N/128⌉ tile
model applied to the L0 phase kernel: at tb=4 every dot is
(64, 36)×(36, ln) — M half-empty and the staged rows fill only 4 of 8
VPU sublanes. tb=8 gives (128, 72) dots (M exactly full) and full
sublane tiles. The VMEM model says tb=8/n_sub=8 fits (12.1 MiB) but the
compiler measures 18.3M scoped (the i32-widened staging is kept live
beyond the model) — so the sweep tries rising n_sub per tb and records
compile OOMs as results, not crashes.

Parity first (every compiling config must equal the XLA oracle on
CHIP — interpret mode does not catch Mosaic miscompiles), then
interleaved best-of-N timing of (a) L0 alone, (b) the full fused chain.
Results: docs/DESIGN.md "Roofline — lyr4-wide chained plan" (round 5).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

# (tb, n_sub or None=plan default)
CFGS = ((4, None), (8, 32), (8, 64), (16, 128))


def main():
    import jax
    import jax.numpy as jnp

    from tpu_cnn.apps.common import load_model
    from tpu_cnn.ops import pallas_poly, quant

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = load_model(os.path.join(repo, "artifacts", "pretrained-lyr4"),
                       "lyr4-wide")
    kernels = [jnp.asarray(k) for k in model.kernels]
    shifts = jnp.asarray(model.shifts, jnp.int32)
    s = model.config.img_size

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1536
    rs = np.random.RandomState(0)

    imgs = [jnp.asarray(rs.randint(0, 256, (batch, s, s), dtype=np.uint8))
            for _ in range(2)]
    small = jnp.asarray(rs.randint(0, 256, (16, s, s), dtype=np.uint8))
    ref = quant.fixed_point_conv_layer(
        small[..., None], kernels[0], shifts[0])  # (B, S/2, S/2, oc) NHWC
    ref_rows = np.asarray(pallas_poly.phase_split_nchw(
        jnp.transpose(ref, (0, 3, 1, 2)), 8))

    l0, chain = {}, {}
    for tb, ns in CFGS:
        key = f"tb{tb}" + (f"/ns{ns}" if ns else "")

        def mk_l0(tb=tb, ns=ns):
            return jax.jit(lambda x: pallas_poly.conv_pool_layer_phase(
                x[:, None, :, :], kernels[0], shifts[0], h=8, tb=tb,
                n_sub=ns))

        def mk_chain(tb=tb, ns=ns):
            def run(x):
                rows = pallas_poly.conv_pool_layer_phase(
                    x[:, None, :, :], kernels[0], shifts[0], h=8, tb=tb,
                    n_sub=ns)
                return pallas_poly.cnn_forward_polyphase_pallas(
                    rows, kernels[1:], shifts[1:], tb=1, pre_split=True,
                    with_bins=True, with_twin=True, with_feats=True)
            return jax.jit(run)

        try:
            f = mk_l0()
            got = np.asarray(jax.block_until_ready(f(small)))
            assert np.array_equal(got, ref_rows), f"{key} PARITY FAIL"
            jax.block_until_ready(f(imgs[0]))  # big-batch compile
            l0[key] = f
            g = mk_chain()
            jax.block_until_ready(g(imgs[0]))
            chain[key] = g
            print(f"  {key}: parity OK on hardware, big-batch compiled",
                  flush=True)
        except AssertionError:
            raise
        except Exception as e:  # compile OOM etc: record, keep sweeping
            msg = str(e).splitlines()[0][:120]
            print(f"  {key}: COMPILE/RUN FAIL — {msg}", flush=True)

    rounds = 30

    def measure(fn, probe):
        t0 = time.perf_counter()
        probes = []
        for i in range(rounds):
            o = fn(imgs[i % 2])
            p = probe(o)
            p.copy_to_host_async()
            probes.append(p)
        _ = [np.asarray(p) for p in probes]
        return (time.perf_counter() - t0) / rounds / batch * 1e6

    best = {}
    for r in range(4):
        for key in l0:
            k = f"l0 {key}"
            best[k] = min(best.get(k, 1e9),
                          measure(l0[key], lambda o: o[0, 0, :8]))
        for key in chain:
            k = f"chain {key}"
            best[k] = min(best.get(k, 1e9),
                          measure(chain[key], lambda o: o[0][0, 0, :8]))
        print(f"  round {r}: " + "  ".join(
            f"{k}={v:.2f}" for k, v in sorted(best.items())), flush=True)

    print(f"\n  L0 TB SWEEP (us/img, batch {batch}, best-of-4x{rounds})")
    for k in sorted(best):
        print(f"    {k:16s} {best[k]:7.2f}")


if __name__ == "__main__":
    main()
