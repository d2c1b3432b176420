"""Instance-head component ablation on hardware — attribute the
instances-mode cost (r3 verdict: 12.57 us/img vs 5.84 plain multi, with
no decomposition) before optimising anything.

Variants (interleaved best-of-N in ONE process, batch 1536, the
production fused-bins mega forward; pass a comma subset as argv[1]):
  multi1    the instances=1 multi head (pred/conf/probs/boxes)
  stack     forward + pooled + the shared (B*K) CAM stack only
  thresh    + percentile-70 threshold (shared top_k)
  labels    + core mask + _connected_labels while_loop (BFS pass 1)
  grow      + _grow_labels while_loop (BFS pass 2)
  cstats    + _component_stats (sort/run-length ranking)
  inst2     the full production instances=2 program (shared stack/thr)
  inst2dup  the pre-r4 formulation: cam_bbox_multi_f32 AND
            cam_instances_f32 each rebuilding the CAM stack + threshold
            (measures the de-dup gain directly)

Component variants return a per-image reduction (max/sum over everything
computed) fetched via copy_to_host_async — a full-batch data dependency,
so XLA cannot narrow the batch or DCE the stage (CLAUDE.md measurement
rules; scalar-sum sync is the documented trap).

Results 2026-08-19 (shipped flagship bundle incl. its multi-label head,
batch 1536, interleaved best-of-4 x 30 rounds, healthy relay):

  variant     us/img  delta vs multi1
  multi1       4.147           +0.000
  stack        3.617           +0.529
  thresh       3.895           +0.252
  labels       4.175           -0.028
  grow         4.342           -0.195
  cstats       5.149           -1.002
  inst2        5.417           -1.270
  inst2dup     5.386           -1.239

Reading (and the r3-verdict surprise): instance-mode COMPUTE costs only
+1.27 us/img over plain multi — the two label-propagation while_loops
are nearly free (+0.03/+0.17); _component_stats' sort-based ranking is
the biggest single piece (+0.81). inst2dup == inst2 within noise: XLA
CSE was ALREADY merging the duplicated CAM stack + percentile inside
the one jit, so the r4 source-level de-dup is a clarity/guarantee win,
not a measured one (honest negative). The r3 "12.57 us/img instances
mode" was therefore never compute: it is RESULT READBACK — instance
mode returns ~330 KB/batch of int32 boxes over the ~30 MB/s relay.
Fix shipped: the engine's compact device->host encoding (boxes as u8,
counts as i16, restored to i32 after fetch — see TPUEngine
_compact_multi docs + probe_compact_readback.py for the e2e A/B).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

VARIANTS = ("multi1", "stack", "thresh", "labels", "grow", "cstats",
            "inst2", "inst2dup")


def main():
    global VARIANTS
    if len(sys.argv) > 1:
        VARIANTS = tuple(sys.argv[1].split(","))
    import jax
    import jax.numpy as jnp

    from tpu_cnn.models.cnn import DEFAULT_SHIFTS
    from tpu_cnn.ops import detect_head as dh
    from tpu_cnn.ops import pallas_poly
    from tpu_cnn.utils import artifacts as art
    from tpu_cnn.utils.paths import default_artifacts

    bundle = art.load_bundle(default_artifacts())
    kernels = [jnp.asarray(k) for k in bundle.kernels]
    fc_w = jnp.asarray(bundle.fc_weight)
    fc_b = jnp.asarray(bundle.fc_bias)
    shifts = jnp.asarray(DEFAULT_SHIFTS, jnp.int32)
    img_size = 128
    batch = 1536

    def fwd(images):
        _, pooled, twin = pallas_poly.cnn_forward_mega(
            images, kernels, shifts, with_bins=True, with_twin=True,
            with_feats=True)
        return pooled, twin.astype(jnp.float32)

    def upto(stage):
        """A jitted program computing the instance pipeline up to
        ``stage``, returning (B,)-shaped full-batch reductions."""

        def fn(images):
            pooled, f32 = fwd(images)
            pred, conf, probs = dh._classify_pooled(pooled, fc_w, fc_b)
            stacked = dh._multi_cam_stack(f32, fc_w)  # (B*K, s, s)
            n, s, _ = stacked.shape
            k = n // images.shape[0]
            per_img = lambda x: x.reshape(images.shape[0], -1).max(axis=1)
            if stage == "stack":
                return conf, per_img(stacked)
            thr = dh._cam_threshold(stacked.reshape(n, s * s))
            if stage == "thresh":
                return conf, per_img(stacked), per_img(thr)
            mask = stacked > thr[:, None, None]
            flat = stacked.reshape(n, s * s)
            core_thr = jnp.maximum(
                dh._percentile_topk(flat, dh.CAM_CORE_PERCENTILE), thr)
            cores = stacked > core_thr[:, None, None]
            no_core = ~jnp.any(cores, axis=(1, 2), keepdims=True)
            cores = jnp.where(no_core, mask, cores)
            labels = dh._connected_labels(cores)
            if stage == "labels":
                return conf, per_img(labels)
            labels = dh._grow_labels(labels, mask).reshape(n, s * s)
            if stage == "grow":
                return conf, per_img(labels)
            lab_i, cnt_i = dh._component_stats(labels, 2)
            return conf, per_img(lab_i), per_img(cnt_i)

        return jax.jit(fn)

    progs = {}
    for v in VARIANTS:
        if v == "multi1":
            progs[v] = jax.jit(lambda x: dh.detect_multi_with_pooled(
                *fwd(x), fc_w, fc_b, img_size))
        elif v == "inst2":
            progs[v] = jax.jit(lambda x: dh.detect_multi_with_pooled(
                *fwd(x), fc_w, fc_b, img_size, instances=2))
        elif v == "inst2dup":
            def dup(x):
                pooled, f32 = fwd(x)
                pred, conf, probs = dh._classify_pooled(pooled, fc_w, fc_b)
                boxes = dh.cam_bbox_multi_f32(f32, fc_w, img_size)
                ib, ic = dh.cam_instances_f32(f32, fc_w, img_size, 2)
                return pred, conf, probs, boxes, ib, ic

            progs[v] = jax.jit(dup)
        else:
            progs[v] = upto(v)

    rs = np.random.RandomState(0)
    pools = [
        jnp.asarray(rs.randint(0, 256, (batch, 128, 128), dtype=np.uint8))
        for _ in range(2)
    ]
    jax.block_until_ready(pools)
    for v in VARIANTS:
        jax.block_until_ready(progs[v](pools[0]))
        print(f"  compiled {v}", flush=True)

    rounds = 30

    def measure(v):
        t0 = time.perf_counter()
        probes = []
        for i in range(rounds):
            o = progs[v](pools[i % 2])
            p = o[1] if isinstance(o, tuple) else o
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
    base = best.get("multi1", min(best.values()))
    print(f"\n  {'variant':9s} {'us/img':>8s} {'delta vs multi1':>16s}")
    for v in VARIANTS:
        print(f"  {v:9s} {best[v]:8.3f} {base - best[v]:+16.3f}")


if __name__ == "__main__":
    main()
