"""M-folded tail megakernel on hardware: parity + fold on/off A/B.

The round-5 tail ablation isolated MXU packing as the dominant lever
(392 128^3 tiles/img at tb=1, M 25 % full at L1). ``_layer_folds`` packs
lane quarters block-diagonally into M — same staged bytes, 280 tiles/img.
This probe (a) gates the folded chain bit-exact against the XLA int32
oracle ON CHIP (interpret mode cannot catch Mosaic miscompiles), then
(b) times fold=auto vs fold=1 interleaved: tail alone on device-resident
pre-split rows, the full production chain, and the fused detect e2e.

Results: docs/DESIGN.md "Roofline — lyr4-wide chained plan" (round 5).
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
    from tpu_cnn.ops import detect_head, pallas_poly, quant

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = load_model(os.path.join(repo, "artifacts", "pretrained-lyr4"),
                       "lyr4-wide")
    kernels = [jnp.asarray(k) for k in model.kernels]
    shifts = jnp.asarray(model.shifts, jnp.int32)
    fc_w = jnp.asarray(model.fc_weight)
    fc_b = jnp.asarray(model.fc_bias)
    s = model.config.img_size
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1536
    rs = np.random.RandomState(0)

    def tail(rows, fold):
        return pallas_poly.cnn_forward_polyphase_pallas(
            rows, kernels[1:], shifts[1:], tb=1, pre_split=True,
            with_bins=True, with_twin=True, with_feats=True, fold=fold)

    def chain(x, fold):
        rows = pallas_poly.conv_pool_layer_phase(
            x[:, None, :, :], kernels[0], shifts[0], h=8)
        return tail(rows, fold)

    def e2e(x, fold):
        _, pooled, twin = chain(x, fold)
        return detect_head.detect_with_pooled(
            None, pooled, fc_w, fc_b, s, features_twin=twin)

    # arms: production (off), full auto fold, and per-layer localisation
    ARMS = (("nofold", None), ("fold421", 0), ("fold411", (4, 1, 1)),
            ("fold121", (1, 2, 1)))

    # ── parity on chip: every arm vs the XLA oracle ──
    small = jnp.asarray(rs.randint(0, 256, (9, s, s), dtype=np.uint8))
    want = quant.cnn_forward(small, kernels, shifts, compute_dtype="int32")
    gots = {}
    for tag, f in ARMS:
        gots[tag] = jax.jit(lambda x, f=f: chain(x, f))(small)
        assert np.array_equal(np.asarray(gots[tag][0]), np.asarray(want)), \
            f"{tag} feats PARITY FAIL"
    for tag, _ in ARMS[1:]:
        for i in range(3):
            np.testing.assert_array_equal(
                np.asarray(gots[tag][i]), np.asarray(gots["nofold"][i]),
                err_msg=f"{tag} out[{i}] mismatch")
    print("  parity OK on hardware (feats vs XLA oracle; bins/twin "
          "fold-invariant)", flush=True)

    # ── interleaved timing ──
    imgs = [jnp.asarray(rs.randint(0, 256, (batch, s, s), dtype=np.uint8))
            for _ in range(2)]
    rows_dev = [jax.block_until_ready(jax.jit(
        lambda x: pallas_poly.conv_pool_layer_phase(
            x[:, None, :, :], kernels[0], shifts[0], h=8))(p))
        for p in imgs]

    fns = {}
    for tag, f in ARMS:
        fns[f"tail-{tag}"] = (jax.jit(lambda r, f=f: tail(r, f)),
                              rows_dev, lambda o: o[0][0, 0, :8])
        if tag in ("nofold", "fold421"):
            fns[f"e2e-{tag}"] = (jax.jit(lambda x, f=f: e2e(x, f)),
                                 imgs, lambda o: o[0][:8])
    for name, (fn, pool, probe) in fns.items():
        jax.block_until_ready(fn(pool[0]))
        print(f"  compiled {name}", flush=True)

    rounds = 20

    def measure(fn, pool, probe):
        t0 = time.perf_counter()
        ps = []
        for i in range(rounds):
            p = probe(fn(pool[i % 2]))
            p.copy_to_host_async()
            ps.append(p)
        _ = [np.asarray(p) for p in ps]
        return (time.perf_counter() - t0) / rounds / batch * 1e6

    best = {k: 1e9 for k in fns}
    for r in range(4):
        for k, (fn, pool, probe) in fns.items():
            best[k] = min(best[k], measure(fn, pool, probe))
        print(f"  round {r}: " + "  ".join(
            f"{k}={v:.2f}" for k, v in sorted(best.items())), flush=True)

    print(f"\n  FOLD A/B (us/img, batch {batch}, best-of-4x{rounds})")
    for k in sorted(best):
        print(f"    {k:14s} {best[k]:7.2f}  ({1e6 / best[k]:9,.0f} FPS)")


if __name__ == "__main__":
    main()
