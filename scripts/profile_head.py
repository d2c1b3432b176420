"""Where do the e2e microseconds go? Stage-by-stage async-pipelined timing
of the production pipeline on the real chip (round-2 perf push: features
run ~305k FPS, e2e ~234k — the gap is the head; find the exact component)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpu_cnn.models.cnn import DEFAULT_SHIFTS
    from tpu_cnn.ops import detect_head, pallas_poly
    from tpu_cnn.utils import artifacts as art
    from tpu_cnn.utils.paths import default_artifacts

    bundle = art.load_bundle(default_artifacts())
    kernels = [jnp.asarray(k) for k in bundle.kernels]
    fc_w = jnp.asarray(bundle.fc_weight)
    fc_b = jnp.asarray(bundle.fc_bias)
    shifts = jnp.asarray(DEFAULT_SHIFTS, jnp.int32)
    batch, rounds = 2048, 30
    rs = np.random.RandomState(0)
    pools = [jnp.asarray(rs.randint(0, 256, (batch, 128, 128), dtype=np.uint8))
             for _ in range(4)]
    jax.block_until_ready(pools)

    def classify_part(feats, pooled):
        logits = detect_head._fc_logits(pooled, fc_w, fc_b)
        probs = jax.nn.softmax(logits, axis=-1)
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        conf = jnp.take_along_axis(probs, pred[:, None], axis=1)[:, 0]
        return pred, conf, probs

    def cam_fixed_thr(feats, pred):
        # CAM with constant threshold: isolates the percentile cost
        b, c, ss = feats.shape
        s = 16
        fm = feats.astype(jnp.float32).reshape(b, c, s, s)
        w = fc_w[pred].reshape(b, c, 4, 4)
        w_exp = jnp.repeat(jnp.repeat(w, 4, axis=2), 4, axis=3)
        ch_means = fm.mean(axis=(2, 3))
        valid = (ch_means <= 250.0).astype(jnp.float32)
        cam = (w_exp * fm * valid[:, :, None, None]).sum(axis=1)
        cam = jnp.maximum(cam, 0.0)
        cam_max = cam.max(axis=(1, 2), keepdims=True)
        cam = jnp.where(cam_max > 0, cam / jnp.maximum(cam_max, 1e-30), cam)
        mask = cam > 0.25
        rows = mask.any(axis=2); cols = mask.any(axis=1)
        r1 = jnp.argmax(rows, axis=1); c1 = jnp.argmax(cols, axis=1)
        return jnp.stack([c1, r1], axis=1)

    variants = {
        "feat_only": lambda im: pallas_poly.cnn_forward_polyphase_pallas(
            im, kernels, shifts)[:, :1, :1],
        "feat_bins": lambda im: pallas_poly.cnn_forward_polyphase_pallas(
            im, kernels, shifts, with_bins=True)[1][:, :1],
        "bins_classify": None,
        "cam_fixed": None,
        "full": lambda im: pallas_poly and detect_head.detect_with_pooled(
            *pallas_poly.cnn_forward_polyphase_pallas(im, kernels, shifts,
                                                      with_bins=True),
            fc_w, fc_b, 128)[::3],
    }

    def bins_classify(im):
        feats, pooled = pallas_poly.cnn_forward_polyphase_pallas(
            im, kernels, shifts, with_bins=True)
        pred, conf, probs = classify_part(feats, pooled)
        return pred, conf

    def cam_fixed(im):
        feats, pooled = pallas_poly.cnn_forward_polyphase_pallas(
            im, kernels, shifts, with_bins=True)
        pred, conf, probs = classify_part(feats, pooled)
        return pred, cam_fixed_thr(feats, pred)

    variants["bins_classify"] = bins_classify
    variants["cam_fixed"] = cam_fixed

    for name, fn in variants.items():
        jf = jax.jit(fn)
        jax.block_until_ready(jf(pools[0]))
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            outs = [jf(pools[i % 4]) for i in range(rounds)]
            jax.block_until_ready(outs)
            dt = time.perf_counter() - t0
            best = max(best, rounds * batch / dt)
        print(f"  {name:14s}: {best:12,.0f} FPS   {1e6 / best:6.3f} us/img",
              flush=True)


if __name__ == "__main__":
    main()
