"""Quantitative detection evaluation — classification accuracy + bbox IoU.

The reference reports classification accuracy only (README.md:14); its CAM
boxes were never measured. The synthetic generator knows its shape
placements exactly, so this harness scores the full detector: per-class
accuracy, mean IoU of the CAM box against ground truth, and the IoU
advantage over the trivial full-frame box (what an uninformative CAM
degenerates to).

Usage:
  python -m tpu_cnn.apps.eval_detection [--n-per-class 30] [--mode auto]
"""

from __future__ import annotations

import argparse

import numpy as np

from tpu_cnn.models.cnn import FpgaCNN
from tpu_cnn.train.data import SyntheticShapes
from tpu_cnn.utils.metrics import accuracy_report


def iou(a, b) -> float:
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = b
    ix1, iy1 = max(ax1, bx1), max(ay1, by1)
    ix2, iy2 = min(ax2, bx2), min(ay2, by2)
    iw, ih = max(0, ix2 - ix1), max(0, iy2 - iy1)
    inter = iw * ih
    area_a = (ax2 - ax1) * (ay2 - ay1)
    area_b = (bx2 - bx1) * (by2 - by1)
    return inter / max(area_a + area_b - inter, 1)


def evaluate(model: FpgaCNN, mode: str = "auto", n_per_class: int = 30,
             seed: int = 123, verbose: bool = True, box: str = "ref"):
    """Returns dict(accuracy, mean_iou, full_frame_iou, per_class).

    ``box``: "ref" scores the reference CAM threshold box; "centroid" the
    tuned centroid profile (``detect_head.CAM_CENTROID_K``); "reg" the
    learned regression head (needs bbox_weight.npy — apps.train_bbox)."""
    from tpu_cnn.apps.infer import make_engine

    if box == "reg" and model.bbox_weight is None:
        raise ValueError(
            "--box reg needs bbox_weight.npy in the artifact bundle — "
            "train one with: python -m tpu_cnn.apps.train_bbox"
        )
    img_size = model.config.img_size
    ds = SyntheticShapes(n_per_class=n_per_class, seed=seed,
                         img_size=img_size)
    imgs, labels, gt_boxes = ds.arrays_with_boxes()
    u8 = np.round(imgs * 255).astype(np.uint8)

    engine = make_engine(model, mode, box_mode=box)
    if hasattr(engine, "detect_batch"):
        res = engine.detect_batch(u8)
        preds, boxes = res.pred, res.bbox
    else:
        from tpu_cnn.head import cam as cam_host
        from tpu_cnn.head.classify import bin_pool_np, classify_np

        feats = engine.run_batch(u8)
        preds, _, _ = classify_np(feats, model.fc_weight, model.fc_bias)
        if box == "reg":
            from tpu_cnn.head.bbox import bbox_regress_np

            boxes = bbox_regress_np(bin_pool_np(feats), model.bbox_weight,
                                    model.config.img_size)
        else:
            box_fn = (cam_host.cam_bbox_centroid if box == "centroid"
                      else cam_host.cam_bbox_fast)
            boxes = np.asarray([
                box_fn(feats[i], int(preds[i]), model.fc_weight,
                       img_size=img_size)
                for i in range(len(u8))
            ])

    ious = np.asarray([iou(boxes[i], gt_boxes[i]) for i in range(len(u8))])
    full = (0, 0, img_size - 1, img_size - 1)
    base_ious = np.asarray([iou(full, gt_boxes[i]) for i in range(len(u8))])
    rep = accuracy_report(np.asarray(preds), labels, ds.class_names)
    out = {
        "accuracy": rep["accuracy"],
        "per_class": rep["per_class"],
        "mean_iou": float(ious.mean()),
        "full_frame_iou": float(base_ious.mean()),
        "iou_gain": float(ious.mean() - base_ious.mean()),
    }
    if verbose:
        print(f"  samples: {len(u8)} ({len(ds.class_names)} classes)")
        print(f"  accuracy: {out['accuracy'] * 100:.1f}%")
        for name, acc in out["per_class"].items():
            print(f"    {name:10s}: {acc * 100:.1f}%")
        print(f"  mean CAM-box IoU:   {out['mean_iou']:.3f}")
        print(f"  full-frame baseline: {out['full_frame_iou']:.3f} "
              f"(gain {out['iou_gain']:+.3f})")
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description="Detection quality evaluation")
    p.add_argument("--artifacts", default=None)
    p.add_argument("--mode", default="auto",
                   choices=["auto", "xla", "pallas", "hybrid", "mega", "mesh", "cpu"])
    p.add_argument("--n-per-class", type=int, default=30)
    p.add_argument("--box", default="ref", choices=["ref", "centroid", "reg"],
                   help="box head: reference CAM threshold, tuned centroid, "
                        "or learned regression (bbox_weight.npy)")
    from tpu_cnn.apps.common import add_variant_arg, load_model

    add_variant_arg(p)
    args = p.parse_args(argv)
    from tpu_cnn.utils.paths import default_artifacts

    args.artifacts = args.artifacts or default_artifacts()

    print("=" * 60)
    print("  DETECTION QUALITY EVALUATION")
    print("=" * 60)
    model = load_model(args.artifacts, args.variant)
    evaluate(model, mode=args.mode, n_per_class=args.n_per_class, box=args.box)


if __name__ == "__main__":
    main()
