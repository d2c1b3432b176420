"""Probe alternative CAM weighted-reduce formulations on the real chip.

profile_head.py showed the full e2e gap vs features-only (3.28 -> 4.37
us/img) is the CAM reduction; the percentile is free. Candidates here keep
the math identical (same f32 products, same reduction set) and only change
how XLA sees it — repeat-materialisation vs broadcast vs binned-einsum.
Each variant is timed async-pipelined AND checked against the host CAM twin
for bbox equality on real test images."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench as bench_mod
    from tpu_cnn.models.cnn import DEFAULT_SHIFTS
    from tpu_cnn.ops import detect_head, pallas_poly
    from tpu_cnn.utils import artifacts as art
    from tpu_cnn.utils.paths import default_artifacts

    art_dir = default_artifacts()
    bundle = art.load_bundle(art_dir)
    kernels = [jnp.asarray(k) for k in bundle.kernels]
    fc_w = jnp.asarray(bundle.fc_weight)
    fc_b = jnp.asarray(bundle.fc_bias)
    shifts = jnp.asarray(DEFAULT_SHIFTS, jnp.int32)
    batch, rounds = 2048, 30
    rs = np.random.RandomState(0)
    pools = [jnp.asarray(rs.randint(0, 256, (batch, 128, 128), dtype=np.uint8))
             for _ in range(4)]
    jax.block_until_ready(pools)

    S, GRID = 16, 4
    NPX = S // GRID

    def bbox_from_cam(cam, b, img_size=128):
        ss = cam.shape[1] * cam.shape[2]
        thr = jnp.percentile(cam.reshape(b, ss), 70.0, axis=1)
        thr = jnp.maximum(thr, 0.25)
        mask = cam > thr[:, None, None]
        rows = mask.any(axis=2); cols = mask.any(axis=1)
        any_mask = rows.any(axis=1)
        r1 = jnp.argmax(rows, axis=1).astype(jnp.int32)
        r2 = (S - 1 - jnp.argmax(rows[:, ::-1], axis=1)).astype(jnp.int32)
        c1 = jnp.argmax(cols, axis=1).astype(jnp.int32)
        c2 = (S - 1 - jnp.argmax(cols[:, ::-1], axis=1)).astype(jnp.int32)
        scale = img_size // S
        bbox = jnp.stack([c1 * scale, r1 * scale,
                          jnp.minimum(img_size - 1, (c2 + 1) * scale),
                          jnp.minimum(img_size - 1, (r2 + 1) * scale)], axis=1)
        full = jnp.array([0, 0, img_size - 1, img_size - 1], jnp.int32)
        return jnp.where(any_mask[:, None], bbox, full[None]).astype(jnp.int32)

    def norm(cam):
        cam = jnp.maximum(cam, 0.0)
        m = cam.max(axis=(1, 2), keepdims=True)
        return jnp.where(m > 0, cam / jnp.maximum(m, 1e-30), cam)

    def cam_repeat(feats, pred):  # current production formulation
        b, c, ss = feats.shape
        fm = feats.astype(jnp.float32).reshape(b, c, S, S)
        w = fc_w[pred].reshape(b, c, GRID, GRID)
        w_exp = jnp.repeat(jnp.repeat(w, NPX, axis=2), NPX, axis=3)
        valid = (fm.mean(axis=(2, 3)) <= 250.0).astype(jnp.float32)
        return norm((w_exp * fm * valid[:, :, None, None]).sum(axis=1))

    def cam_broadcast(feats, pred):
        b, c, ss = feats.shape
        fm = feats.astype(jnp.float32).reshape(b, c, GRID, NPX, GRID, NPX)
        w = fc_w[pred].reshape(b, c, GRID, 1, GRID, 1)
        valid = (feats.astype(jnp.float32).mean(axis=2) <= 250.0)
        w = w * valid[:, :, None, None, None, None].astype(jnp.float32)
        cam = (fm * w).sum(axis=1).reshape(b, S, S)
        return norm(cam)

    def cam_einsum(feats, pred):
        b, c, ss = feats.shape
        fm = feats.astype(jnp.float32).reshape(b, c, GRID, NPX, GRID, NPX)
        g = jnp.transpose(fm, (0, 1, 2, 4, 3, 5)).reshape(b, c, 16, NPX * NPX)
        w = fc_w[pred].reshape(b, c, 16)
        valid = (feats.astype(jnp.float32).mean(axis=2) <= 250.0)
        w = w * valid[:, :, None].astype(jnp.float32)
        camb = jnp.einsum("bcjq,bcj->bjq", g, w)
        cam = camb.reshape(b, GRID, GRID, NPX, NPX)
        cam = jnp.transpose(cam, (0, 1, 3, 2, 4)).reshape(b, S, S)
        return norm(cam)

    variants = {"repeat": cam_repeat, "broadcast": cam_broadcast,
                "einsum": cam_einsum}

    # ── correctness vs host twin on real test images ──
    gate = bench_mod.load_gate_images(art_dir)
    from tpu_cnn.head.cam import cam_bbox_fast
    from tpu_cnn.engine.cpu_ref import numpy_cnn_forward
    from tpu_cnn.head.classify import classify_np

    np_k = [np.asarray(k) for k in bundle.kernels]
    wf = np.stack([numpy_cnn_forward(im, np_k) for im in gate])
    widx, _, _ = classify_np(wf, bundle.fc_weight, bundle.fc_bias)
    want_bbox = np.stack([cam_bbox_fast(wf[i], int(widx[i]), bundle.fc_weight)
                          for i in range(len(gate))])

    for name, camfn in variants.items():
        def full(im, camfn=camfn):
            feats, pooled = pallas_poly.cnn_forward_polyphase_pallas(
                im, kernels, shifts, with_bins=True)
            logits = detect_head._fc_logits(pooled, fc_w, fc_b)
            pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            conf = jax.nn.softmax(logits, -1).max(-1)
            cam = camfn(feats, pred)
            return pred, conf, bbox_from_cam(cam, im.shape[0])

        jf = jax.jit(full)
        gp, gc, gb = (np.asarray(a) for a in jf(jnp.asarray(gate)))
        ok = np.array_equal(gb, want_bbox.astype(gb.dtype))
        jax.block_until_ready(jf(pools[0]))
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            outs = [jf(pools[i % 4]) for i in range(rounds)]
            jax.block_until_ready(outs)
            dt = time.perf_counter() - t0
            best = max(best, rounds * batch / dt)
        print(f"  {name:10s}: {best:12,.0f} FPS  {1e6 / best:6.3f} us/img  "
              f"bbox-parity={'OK' if ok else 'MISMATCH'}", flush=True)


if __name__ == "__main__":
    main()


def probe_f32_twin():
    """Variant: the megakernel emits an f32 twin of the features; the CAM
    reads it directly — no XLA u8->f32 feature relayout at all."""
    import jax
    import jax.numpy as jnp

    from tpu_cnn.models.cnn import DEFAULT_SHIFTS
    from tpu_cnn.ops import detect_head, pallas_poly
    from tpu_cnn.utils import artifacts as art
    from tpu_cnn.utils.paths import default_artifacts
    import bench as bench_mod
    from tpu_cnn.engine.cpu_ref import numpy_cnn_forward
    from tpu_cnn.head.cam import cam_bbox_fast
    from tpu_cnn.head.classify import classify_np

    art_dir = default_artifacts()
    bundle = art.load_bundle(art_dir)
    kernels = [jnp.asarray(k) for k in bundle.kernels]
    fc_w = jnp.asarray(bundle.fc_weight)
    fc_b = jnp.asarray(bundle.fc_bias)
    shifts = jnp.asarray(DEFAULT_SHIFTS, jnp.int32)
    batch, rounds = 2048, 30
    rs = np.random.RandomState(0)
    pools = [jnp.asarray(rs.randint(0, 256, (batch, 128, 128), dtype=np.uint8))
             for _ in range(4)]
    jax.block_until_ready(pools)

    def full(im):
        _, pooled, f32 = pallas_poly.cnn_forward_polyphase_pallas(
            im, kernels, shifts, with_bins=True, with_twin=True)
        logits = detect_head._fc_logits(pooled, fc_w, fc_b)
        probs = jax.nn.softmax(logits, -1)
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        conf = probs.max(-1)
        bbox = detect_head.cam_bbox_f32(f32.astype(jnp.float32), pred,
                                        fc_w, 128)
        return pred, conf, bbox

    jf = jax.jit(full)
    gate = bench_mod.load_gate_images(art_dir)
    gp, gc, gb = (np.asarray(a) for a in jf(jnp.asarray(gate)))
    np_k = [np.asarray(k) for k in bundle.kernels]
    wf = np.stack([numpy_cnn_forward(im, np_k) for im in gate])
    widx, _, _ = classify_np(wf, bundle.fc_weight, bundle.fc_bias)
    want = np.stack([cam_bbox_fast(wf[i], int(widx[i]), bundle.fc_weight)
                     for i in range(len(gate))])
    ok = np.array_equal(gb, want.astype(gb.dtype))

    jax.block_until_ready(jf(pools[0]))
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [jf(pools[i % 4]) for i in range(rounds)]
        jax.block_until_ready(outs)
        best = max(best, rounds * batch / (time.perf_counter() - t0))
    print(f"  f32_twin  : {best:12,.0f} FPS  {1e6 / best:6.3f} us/img  "
          f"bbox-parity={'OK' if ok else 'MISMATCH'}", flush=True)
