"""Single/batch image inference CLI — the ``pynq_inference.py`` surface.

Same flag set and behaviours as the reference CLI
(``software/pynq_inference.py:496-575``): single ``--image`` (.bin/.jpg/.png)
or a directory sweep of ``test_image_*_classC.bin`` with accuracy scoring
from filename labels, annotated JPEG output, ``--shifts l0,l1,l2``,
``--dump-features``. The FPGA bitstream/DMA plumbing is replaced by the
TPUEngine; ``--mode cpu`` swaps in the native/numpy oracle engine.

Usage:
  python -m tpu_cnn.apps.infer --artifacts <dir>                 # all test images
  python -m tpu_cnn.apps.infer --artifacts <dir> --image img.png # single image
"""

from __future__ import annotations

import argparse
import glob
import os
import time

import numpy as np

from tpu_cnn.head import cam as cam_host
from tpu_cnn.head import classify as classify_host
from tpu_cnn.models.cnn import FpgaCNN
from tpu_cnn.utils import artifacts as art


def make_engine(model: FpgaCNN, mode: str, box_mode: str = "ref"):
    """The engine swap (reference --mode fpga|arm, realtime_detect.py:556):
    cpu = host oracle, mesh = all local chips data-parallel, otherwise
    TPUEngine with the named compute backend. ``box_mode`` picks the fused
    CAM box profile ("ref" = reference threshold semantics, "centroid" =
    tuned sort-free profile); the CPU oracle engine has no fused head, its
    callers pick the host twin themselves."""
    if mode == "cpu":
        from tpu_cnn.engine.cpu_ref import CPURefEngine

        return CPURefEngine(model.kernels, model.shifts)
    if mode == "mesh":
        from tpu_cnn.parallel.mesh import MeshEngine

        return MeshEngine(model, box_mode=box_mode)
    from tpu_cnn.engine.tpu import TPUEngine

    return TPUEngine(
        model,
        backend=mode if mode in ("xla", "pallas", "hybrid", "mega") else "auto",
        box_mode=box_mode,
    )


def annotate_and_save(image_flat, bbox, label, out_path, img_size=128):
    """Green bbox + label band, reference-identical output format
    (``pynq_inference.py:467-491``)."""
    from PIL import Image, ImageDraw

    gray = image_flat.reshape(img_size, img_size)
    rgb = np.stack([gray, gray, gray], axis=2)
    img = Image.fromarray(rgb, "RGB")
    draw = ImageDraw.Draw(img)
    x1, y1, x2, y2 = bbox
    draw.rectangle([x1, y1, x2, y2], outline=(0, 255, 0), width=2)
    ty = max(0, y1 - 14)
    draw.rectangle([x1, ty, x1 + len(label) * 7, ty + 13], fill=(0, 255, 0))
    draw.text((x1 + 2, ty + 1), label, fill=(0, 0, 0))
    img.save(out_path, quality=95)


# one fixed colour per class index for multi-object overlays
MULTI_COLORS = [
    (0, 255, 0), (255, 160, 0), (80, 160, 255),
    (255, 80, 255), (255, 255, 0), (0, 255, 220),
]


def annotate_multi_and_save(image_flat, detections, class_names, out_path,
                            img_size=128):
    """One labelled box per detection (class_idx, prob, bbox) — the
    multi-object counterpart of :func:`annotate_and_save`."""
    from PIL import Image, ImageDraw

    gray = image_flat.reshape(img_size, img_size)
    rgb = np.stack([gray, gray, gray], axis=2)
    img = Image.fromarray(rgb, "RGB")
    draw = ImageDraw.Draw(img)
    for k, prob, (x1, y1, x2, y2) in detections:
        color = MULTI_COLORS[k % len(MULTI_COLORS)]
        label = f"{class_names[k]} {prob:.0%}"
        draw.rectangle([x1, y1, x2, y2], outline=color, width=2)
        ty = max(0, y1 - 14)
        draw.rectangle([x1, ty, x1 + len(label) * 7, ty + 13], fill=color)
        draw.text((x1 + 2, ty + 1), label, fill=(0, 0, 0))
    img.save(out_path, quality=95)


def run_inference(engine, model, image_path, verbose=True, save_output=True,
                  box: str = "ref", multi_thresh: float | None = None,
                  instances: int = 1):
    size = model.config.img_size
    image = art.load_image_any(image_path, img_size=size)
    feat, conv_ms, read_ms = engine.run(image)

    idx, name, conf, probs = classify_host.classify_np(
        feat, model.fc_weight, model.fc_bias, model.class_names
    )
    detections = None
    if multi_thresh is not None:
        from tpu_cnn.engine.tpu import detections_above, instance_detections

        sc = probs
        if model.multi_head is not None:
            sc = classify_host.multi_scores_np(
                classify_host.pool_for_head(feat, model.fc_weight),
                *model.multi_head)
        boxes_all = cam_host.cam_bbox_multi(
            feat, model.fc_weight, img_size=size,
            box_mode="centroid" if box == "centroid" else "ref",
        )
        if instances > 1:
            inst_boxes, inst_counts = cam_host.cam_instances(
                feat, model.fc_weight, img_size=size,
                max_instances=instances,
            )
            detections = instance_detections(
                sc, boxes_all, inst_boxes, inst_counts, multi_thresh
            )
        else:
            detections = detections_above(sc, boxes_all, multi_thresh)
    if box == "reg":
        from tpu_cnn.head.bbox import bbox_regress_features_np

        bbox = bbox_regress_features_np(feat, model.bbox_weight, img_size=size)
    elif model.head_mode != "bins":
        bbox = (0, 0, size - 1, size - 1)
    elif box == "centroid":
        bbox = cam_host.cam_bbox_centroid(feat, idx, model.fc_weight,
                                          img_size=size)
    else:
        _, bbox = cam_host.cam_bbox_hires(feat, idx, model.fc_weight,
                                          img_size=size)

    if verbose:
        base = os.path.basename(image_path)
        true = art.label_from_filename(image_path)
        suffix = f" (true: class {true})" if true >= 0 else ""
        print(f"\n  Image:      {base}{suffix}")
        print(f"  Prediction: {name} (class {idx})")
        print(f"  Confidence: {conf:.1%}")
        print(f"  BBox:       ({bbox[0]}, {bbox[1]}) -> ({bbox[2]}, {bbox[3]})")
        if detections is not None:
            thr_s = (f"{multi_thresh:.0%}" if np.ndim(multi_thresh) == 0
                     else "per-class calibrated floors")
            print(f"  Detections (prob >= {thr_s}):")
            for k, prob, (x1, y1, x2, y2) in detections:
                print(f"    {model.class_names[k]:10s} {prob:5.1%}  "
                      f"({x1}, {y1}) -> ({x2}, {y2})")
        print(f"  Engine:     {conv_ms:.2f} ms compute + {read_ms:.2f} ms readout")
        top3 = np.argsort(probs)[::-1][:3]
        print("  Top-3:")
        for rank, i in enumerate(top3):
            print(f"    {rank + 1}. {model.class_names[i]}: {probs[i]:.1%}")

    if save_output:
        stem = os.path.splitext(os.path.basename(image_path))[0]
        out_path = os.path.join(
            os.path.dirname(os.path.abspath(image_path)), f"{stem}_result.jpg"
        )
        if detections is not None:
            annotate_multi_and_save(image, detections, model.class_names,
                                    out_path, img_size=size)
        else:
            annotate_and_save(image, bbox, f"{name} {conf:.0%}", out_path,
                              img_size=size)
        if verbose:
            print(f"  Output:     {out_path}")

    return idx, name, conf


def main(argv=None):
    p = argparse.ArgumentParser(description="TPU CNN inference")
    p.add_argument("--artifacts", default=None,
                   help="dir with weights.bin + fc_*.npy + classes.json "
                        "(default: repo pretrained bundle or mounted reference)")
    p.add_argument("--head-prefix", default="", help="e.g. 'arm_' for engine-specific head")
    p.add_argument("--image", default=None, help="single image (.bin/.jpg/.png)")
    p.add_argument("--image-dir", default=None, help="directory of test_image_*.bin")
    p.add_argument("--mode", default="auto", choices=["auto", "xla", "pallas", "hybrid", "mega", "mesh", "cpu"])
    p.add_argument("--no-save", action="store_true")
    p.add_argument("--shifts", default=None,
                   help="comma list, one per layer (default: the bundle's "
                        "shifts.json if present, else the variant ladder)")
    p.add_argument("--dump-features", action="store_true")
    p.add_argument("--variant", default="lyr3-std",
                   help="model geometry from models.registry")
    p.add_argument("--box", default="ref", choices=["ref", "centroid", "reg"],
                   help="box head: reference CAM, tuned centroid, or learned "
                        "regression (needs bbox_weight.npy)")
    p.add_argument("--multi", action="store_true",
                   help="multi-object mode: one CAM box per class above "
                        "--multi-thresh (beyond-reference; bins head only)")
    p.add_argument("--multi-thresh", type=float, default=None,
                   help="uniform probability floor for --multi detections "
                        "(default: the bundle's calibrated per-class "
                        "multi_thresh.json if present, else 0.15)")
    p.add_argument("--instances", type=int, default=1,
                   help="with --multi: up to N connected-component boxes "
                        "per class, so two objects of the SAME class get "
                        "separate boxes (default 1 = one box per class)")
    args = p.parse_args(argv)
    from tpu_cnn.utils.paths import default_artifacts

    args.artifacts = (args.artifacts
                      or default_artifacts(getattr(args, "variant", "lyr3-std")))

    shifts = ([int(s) for s in args.shifts.split(",")]
              if args.shifts is not None else None)

    print("=" * 60)
    print("  TPU CNN — INFERENCE")
    print("=" * 60)
    from tpu_cnn.apps.common import load_model

    model = load_model(args.artifacts, args.variant, args.head_prefix,
                       shifts=shifts)
    if args.box == "reg" and model.bbox_weight is None:
        p.error("--box reg needs bbox_weight.npy in the bundle "
                "(train one: python -m tpu_cnn.apps.train_bbox)")
    if args.multi and model.head_mode != "bins":
        p.error("--multi needs the spatial-bin head (a (C, C*16) fc_weight); "
                "the 64-d GAP head has no per-class spatial CAM")
    multi_thresh = None
    if args.multi:
        multi_thresh = (args.multi_thresh if args.multi_thresh is not None
                        else (model.multi_thresh
                              if model.multi_thresh is not None else 0.15))
    engine = make_engine(model, args.mode)
    print(f"Engine: {type(engine).__name__} ({getattr(engine, 'backend', '?')})")
    print(f"Classifier: {len(model.class_names)} classes — {model.class_names} "
          f"[{model.head_mode} head]")

    if args.image:
        run_inference(engine, model, args.image, save_output=not args.no_save,
                      box=args.box, multi_thresh=multi_thresh,
                      instances=args.instances)
        if args.dump_features:
            feat, *_ = engine.run(art.load_image_any(args.image))
            out = os.path.splitext(args.image)[0] + "_features.npy"
            np.save(out, feat)
            print(f"  Features saved: {out}")
        return

    image_dir = args.image_dir or args.artifacts
    images = sorted(glob.glob(os.path.join(image_dir, "test_image_*.bin")))
    if not images:
        print(f"\nNo test images found in {image_dir}")
        print("Generate some first: python -m tpu_cnn.train.train_cnn --synthetic")
        return

    print(f"\nClassifying {len(images)} images...")
    correct = total = 0
    t0 = time.time()
    for path in images:
        idx, name, conf = run_inference(engine, model, path,
                                        save_output=not args.no_save,
                                        box=args.box,
                                        multi_thresh=multi_thresh,
                                        instances=args.instances)
        true = art.label_from_filename(path)
        if true >= 0:
            total += 1
            correct += int(idx == true)
    dt = time.time() - t0
    print("\n" + "=" * 60)
    print("  RESULTS")
    print("=" * 60)
    print(f"  Images: {len(images)}  ({dt / max(len(images), 1) * 1e3:.1f} ms/image)")
    if total:
        print(f"  Accuracy: {correct}/{total} = {100 * correct / total:.1f}%")
    print("=" * 60)


if __name__ == "__main__":
    main()
