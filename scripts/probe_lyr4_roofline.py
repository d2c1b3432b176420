"""lyr4-wide chained-plan decomposition on hardware — attribute the
~29 us/img fused detect (34.3k FPS, docs/ROADMAP.md round-3 addition) to
its constituents, and probe the plan variants the VMEM model allows.

The production lyr4-wide plan is (n_head=1, tb=1): layer 0 runs per-layer
through pallas_int8.fused_conv_layer (which reroutes the 1-input-channel
geometry to the XLA conv — sub-4-sublane-row int8 staging miscompiles on
this Mosaic), and layers 1-3 run in ONE polyphase megakernel at batch
tile 1. The open questions from the r3 review: does the XLA head layer,
the tb=1 tail (block-diag packing loses its fill economics at tb=1), or
the relayout between them dominate?

Variants (interleaved best-of-N, one process; pass a comma subset as
argv[1] — each costs a ~2-3 min remote compile):
  e2e      the production fused detect program (mega forward + fused head)
  fwd      production mega forward alone (bins + twin + feats outputs)
  L0       layer 0 alone (fused_conv_layer on (B,1,256,256))
  L1       layer 1 alone (fused_conv_layer on (B,16,128,128))
  tail     the 3-layer tail megakernel alone on a precomputed L0 output
  tail2    the 2-layer tail (layers 2-3) at tb=2 on a precomputed L1 output
  nh2tb2   full alternative plan: L0+L1 per-layer + 2-layer tail at tb=2
  nh2tb1   same chain with the tail at tb=1 (isolates the tb effect)
  hybrid   all four layers per-layer + XLA bin pool (the fallback backend)

Decomposition: fwd - L0 - tail = the relayout/overhead between the
stages; e2e - fwd = the detect head. nh2tb2 vs fwd answers whether
peeling layer 1 out of the megakernel pays; tail2 vs tail isolates the
fill-economics question. Every value-preserving variant is parity-gated
bit-exact against the production forward before timing.

Results: docs/DESIGN.md "Roofline — lyr4-wide chained plan".
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

VARIANTS = ("e2e", "fwd", "L0", "L1", "tail", "tail2", "nh2tb2", "nh2tb1",
            "hybrid")


def main():
    global VARIANTS
    if len(sys.argv) > 1:
        VARIANTS = tuple(sys.argv[1].split(","))
    import jax
    import jax.numpy as jnp

    from tpu_cnn.apps.common import load_model
    from tpu_cnn.ops import detect_head, pallas_int8, pallas_poly
    from tpu_cnn.utils.paths import default_artifacts
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = load_model(os.path.join(repo, "artifacts", "pretrained-lyr4"),
                       "lyr4-wide")
    kernels = [jnp.asarray(k) for k in model.kernels]
    kmats = [pallas_int8.pack_kernel_matrix(k) for k in model.kernels]
    shifts = jnp.asarray(model.shifts, jnp.int32)
    fc_w = jnp.asarray(model.fc_weight)
    fc_b = jnp.asarray(model.fc_bias)
    img_size = model.config.img_size
    cfgs = model.config.layer_configs
    print(f"geometry {cfgs}  shifts {model.shifts}  "
          f"plan {pallas_poly.polyphase_plan(cfgs, with_bins=True, with_twin=True, with_feats=True)}")
    for nh, tb in ((2, 2), (2, 1)):
        ok = pallas_poly.polyphase_supported(
            cfgs[nh:], with_bins=True, with_twin=True, with_feats=True,
            tb=tb)
        print(f"  VMEM model: nh={nh} tb={tb} tail supported={ok}")

    batch = 256
    rs = np.random.RandomState(0)
    pools = [
        jnp.asarray(rs.randint(0, 256, (batch, img_size, img_size),
                               dtype=np.uint8))
        for _ in range(2)
    ]
    jax.block_until_ready(pools)

    def head_layers(x, n):
        x = x[:, None, :, :]
        for i in range(n):
            x = pallas_int8.fused_conv_layer(x, kmats[i], shifts[i])
        return x

    # precomputed stage inputs for the isolated-stage variants
    x1 = [jax.jit(lambda x: head_layers(x, 1))(p) for p in pools]
    x2 = [jax.jit(lambda x: head_layers(x, 2))(p) for p in pools]
    jax.block_until_ready([x1, x2])

    def fwd_full(images):
        return pallas_poly.cnn_forward_mega(
            images, kernels, shifts,
            with_bins=True, with_twin=True, with_feats=True)

    def chain(images, nh, tb):
        x = head_layers(images, nh)
        return pallas_poly.cnn_forward_polyphase_pallas(
            x, kernels[nh:], shifts[nh:], tb=tb,
            with_bins=True, with_twin=True, with_feats=True)

    def hybrid_fwd(images):
        x = head_layers(images, len(kernels))
        feats = x.reshape(x.shape[0], x.shape[1], -1)
        return feats, detect_head.bin_pool(feats), feats.astype(jnp.bfloat16)

    def e2e(images):
        _, pooled, twin = fwd_full(images)
        return detect_head.detect_with_pooled(
            None, pooled, fc_w, fc_b, img_size, features_twin=twin)

    fns = {
        "e2e": e2e,
        "fwd": fwd_full,
        "L0": lambda x: head_layers(x, 1),
        "L1": None,  # runs on x1
        "tail": None,  # runs on x1
        "tail2": None,  # runs on x2
        "nh2tb2": lambda x: chain(x, 2, 2),
        "nh2tb1": lambda x: chain(x, 2, 1),
        "hybrid": hybrid_fwd,
    }
    fns["L1"] = lambda x: pallas_int8.fused_conv_layer(x, kmats[1],
                                                       shifts[1])
    fns["tail"] = lambda x: pallas_poly.cnn_forward_polyphase_pallas(
        x, kernels[1:], shifts[1:], tb=1,
        with_bins=True, with_twin=True, with_feats=True)
    fns["tail2"] = lambda x: pallas_poly.cnn_forward_polyphase_pallas(
        x, kernels[2:], shifts[2:], tb=2,
        with_bins=True, with_twin=True, with_feats=True)
    stage_pools = {"L1": x1, "tail": x1, "tail2": x2}

    # parity gate: value-preserving full-forward variants must match the
    # production mega bit-exactly (feats AND bins)
    gate = jnp.asarray(rs.randint(0, 256, (8, img_size, img_size),
                                  dtype=np.uint8))
    want = None
    if any(v in VARIANTS for v in ("fwd", "nh2tb2", "nh2tb1", "hybrid")):
        want = [np.asarray(a) for a in jax.jit(fwd_full)(gate)]

    jfns = {}
    for v in VARIANTS:
        jfns[v] = jax.jit(fns[v])
        probe_in = stage_pools.get(v, pools)[0]
        jax.block_until_ready(jfns[v](probe_in))
        msg = ""
        if v in ("nh2tb2", "nh2tb1", "hybrid") and want is not None:
            got = [np.asarray(a) for a in jfns[v](gate)]
            feats_ok = np.array_equal(got[0], want[0])
            bins_ok = np.array_equal(got[1], want[1])
            msg = (" — parity BIT-EXACT" if feats_ok and bins_ok
                   else f" — parity MISMATCH (feats {feats_ok} bins {bins_ok})")
        print(f"  compiled {v}{msg}", flush=True)

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

    best = {v: 1e9 for v in VARIANTS}
    for _ in range(4):
        for v in VARIANTS:
            best[v] = min(best[v], measure(v))
    print(f"\n  {'variant':8s} {'us/img':>8s}")
    for v in VARIANTS:
        print(f"  {v:8s} {best[v]:8.3f}")
    if all(v in best for v in ("fwd", "L0", "tail")):
        print(f"\n  decomposition: fwd {best['fwd']:.3f} = "
              f"L0 {best['L0']:.3f} + tail {best['tail']:.3f} + "
              f"relayout/overhead "
              f"{best['fwd'] - best['L0'] - best['tail']:+.3f}")
    if all(v in best for v in ("e2e", "fwd")):
        print(f"  head cost: e2e - fwd = {best['e2e'] - best['fwd']:+.3f}")


if __name__ == "__main__":
    main()
