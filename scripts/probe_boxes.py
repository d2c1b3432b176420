"""Offline CAM-box strategy sweep (CPU oracle features, synthetic GT boxes).

Exploration harness for the detection-quality lever: sweeps threshold
parameters and alternative box extractors on a calibration split, scores on
the eval split (seed 123, the one eval_detection uses). Not part of the
shipped pipeline.

Run: python scripts/probe_boxes.py
"""
from __future__ import annotations

import numpy as np

from tpu_cnn.engine.cpu_ref import CPURefEngine
from tpu_cnn.models.cnn import DEFAULT_SHIFTS, FpgaCNN
from tpu_cnn.train.data import SyntheticShapes
from tpu_cnn.utils import artifacts as art
from tpu_cnn.utils.paths import default_artifacts
from tpu_cnn.apps.eval_detection import iou
from tpu_cnn.head.cam import _build_cam

IMG = 128


def dataset(seed, n=30):
    ds = SyntheticShapes(n_per_class=n, seed=seed)
    imgs, labels, gt = ds.arrays_with_boxes()
    return np.round(imgs * 255).astype(np.uint8), labels, gt


def cams_and_preds(model, u8):
    eng = CPURefEngine(model.kernels, model.shifts)
    feats = eng.run_batch(u8)
    from tpu_cnn.head.classify import classify_np

    preds, _, _ = classify_np(feats, model.fc_weight, model.fc_bias)
    cams = np.stack([
        _build_cam(feats[i], model.fc_weight[int(preds[i])])
        for i in range(len(u8))
    ])
    return cams, preds


def box_threshold(cam, pct, floor, scale=8):
    thr = max(float(np.percentile(cam, pct)), floor)
    mask = cam > thr
    if not mask.any():
        return (0, 0, IMG - 1, IMG - 1)
    rows, cols = mask.any(axis=1), mask.any(axis=0)
    r1, r2 = np.where(rows)[0][[0, -1]]
    c1, c2 = np.where(cols)[0][[0, -1]]
    return (c1 * scale, r1 * scale,
            min(IMG - 1, (c2 + 1) * scale), min(IMG - 1, (r2 + 1) * scale))


def box_centroid(cam, k, scale=8):
    s = cam.shape[0]
    m = cam / max(cam.sum(), 1e-9)
    ys, xs = np.mgrid[0:s, 0:s]
    cy, cx = (m * ys).sum(), (m * xs).sum()
    sy = np.sqrt((m * (ys - cy) ** 2).sum())
    sx = np.sqrt((m * (xs - cx) ** 2).sum())
    x1 = max(0, cx - k * sx) * scale
    y1 = max(0, cy - k * sy) * scale
    x2 = min(s - 1e-6, cx + k * sx + 1) * scale
    y2 = min(s - 1e-6, cy + k * sy + 1) * scale
    return (x1, y1, min(IMG - 1, x2), min(IMG - 1, y2))


def box_thr_masked_centroid(cam, pct, floor, k, scale=8):
    """Centroid/extent of the thresholded mass only."""
    thr = max(float(np.percentile(cam, pct)), floor)
    w = np.where(cam > thr, cam, 0.0)
    if w.sum() <= 0:
        return (0, 0, IMG - 1, IMG - 1)
    return box_centroid(w, k, scale)


def score(cams, gt, fn):
    return float(np.mean([iou(fn(cams[i]), gt[i]) for i in range(len(cams))]))


def main():
    bundle = art.load_bundle(default_artifacts())
    model = FpgaCNN(bundle.kernels, bundle.fc_weight, bundle.fc_bias,
                    bundle.class_names, shifts=DEFAULT_SHIFTS)

    cal_u8, _, cal_gt = dataset(seed=77, n=30)
    ev_u8, _, ev_gt = dataset(seed=123, n=30)
    cal_cams, _ = cams_and_preds(model, cal_u8)
    ev_cams, _ = cams_and_preds(model, ev_u8)

    print(f"reference (pct=70, floor=0.25): "
          f"cal {score(cal_cams, cal_gt, lambda c: box_threshold(c, 70, 0.25)):.3f}  "
          f"eval {score(ev_cams, ev_gt, lambda c: box_threshold(c, 70, 0.25)):.3f}")
    full = lambda c: (0, 0, IMG - 1, IMG - 1)
    print(f"full-frame baseline:            "
          f"cal {score(cal_cams, cal_gt, full):.3f}  "
          f"eval {score(ev_cams, ev_gt, full):.3f}")

    print("\n-- threshold sweep (cal) --")
    best = (None, -1)
    for pct in (70, 75, 80, 85, 90, 92, 95):
        for floor in (0.1, 0.2, 0.25, 0.3, 0.4, 0.5, 0.6):
            s = score(cal_cams, cal_gt, lambda c: box_threshold(c, pct, floor))
            if s > best[1]:
                best = ((pct, floor), s)
            print(f"  pct={pct:2d} floor={floor:.2f}: {s:.3f}")
    pct, floor = best[0]
    print(f"best threshold (cal): pct={pct} floor={floor} -> "
          f"eval {score(ev_cams, ev_gt, lambda c: box_threshold(c, pct, floor)):.3f}")

    print("\n-- centroid sweep (cal) --")
    bestc = (None, -1)
    for k in (1.0, 1.25, 1.5, 1.75, 2.0, 2.25, 2.5):
        s = score(cal_cams, cal_gt, lambda c: box_centroid(c, k))
        if s > bestc[1]:
            bestc = (k, s)
        print(f"  k={k:.2f}: {s:.3f}")
    print(f"best centroid (cal): k={bestc[0]} -> "
          f"eval {score(ev_cams, ev_gt, lambda c: box_centroid(c, bestc[0])):.3f}")

    print("\n-- thresholded-centroid sweep (cal) --")
    bestm = (None, -1)
    for pct in (50, 60, 70, 80):
        for k in (1.25, 1.5, 1.75, 2.0, 2.5):
            s = score(cal_cams, cal_gt,
                      lambda c: box_thr_masked_centroid(c, pct, 0.1, k))
            if s > bestm[1]:
                bestm = ((pct, k), s)
            print(f"  pct={pct} k={k:.2f}: {s:.3f}")
    (pct, k) = bestm[0]
    print(f"best thr-centroid (cal): pct={pct} k={k} -> "
          f"eval {score(ev_cams, ev_gt, lambda c: box_thr_masked_centroid(c, pct, 0.1, k)):.3f}")


def probe_power():
    bundle = art.load_bundle(default_artifacts())
    model = FpgaCNN(bundle.kernels, bundle.fc_weight, bundle.fc_bias,
                    bundle.class_names, shifts=DEFAULT_SHIFTS)
    cal_u8, _, cal_gt = dataset(seed=77, n=30)
    ev_u8, _, ev_gt = dataset(seed=123, n=30)
    cal_cams, _ = cams_and_preds(model, cal_u8)
    ev_cams, _ = cams_and_preds(model, ev_u8)
    best = (None, -1)
    for p in (1.0, 1.5, 2.0, 3.0, 4.0):
        for k in (1.0, 1.25, 1.5, 1.75, 2.0, 2.5):
            s = score(cal_cams, cal_gt, lambda c: box_centroid(c ** p, k))
            if s > best[1]:
                best = ((p, k), s)
            print(f"  pow={p:.1f} k={k:.2f}: {s:.3f}")
    (p, k) = best[0]
    print(f"best pow-centroid (cal): pow={p} k={k} -> "
          f"eval {score(ev_cams, ev_gt, lambda c: box_centroid(c ** p, k)):.3f}")


if __name__ == "__main__":
    import sys

    probe_power() if "power" in sys.argv[1:] else main()
