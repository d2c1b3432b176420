"""Calibrate per-class multi-object detection thresholds.

The multi-object head (``--multi`` everywhere) filters per-class CAM boxes
by a probability floor. A softmax head trained single-object spreads its
mass very unevenly across classes on multi-object frames, so ONE uniform
floor is the wrong operating point for every class at once. This CLI
sweeps a per-class threshold vector by coordinate descent on detection F1
over composite calibration scenes (``train.data.CompositeScenes``,
analytic ground truth, a calibration seed disjoint from evaluation) and
persists the winner to the bundle as ``multi_thresh.json`` — which every
CLI and both serving front ends then use as their default multi floor
(explicit ``--multi-thresh`` still forces a uniform scalar).

Measured on the flagship bundle (calibration seed 555, evaluation seed
123, 80 scenes each): held-out detection F1 0.545 -> 0.652 (precision
0.50 -> 0.67 with recall 0.61 -> 0.64).

Beyond-reference: the reference has no multi-object surface at all.

Usage:
  python -m tpu_cnn.apps.calibrate_multi --save [--mode auto]
"""

from __future__ import annotations

import argparse

import numpy as np


def _detection_sets(probs, truths, thr):
    tp = fp = fn = 0
    k_count = probs.shape[1]
    for i, truth in enumerate(truths):
        gt = {c for c, _ in truth}
        det = {k for k in range(k_count) if probs[i, k] >= thr[k]}
        tp += len(det & gt)
        fp += len(det - gt)
        fn += len(gt - det)
    return tp, fp, fn


def prf(probs, truths, thr):
    """(precision, recall, F1) of the thresholded detections vs truth."""
    tp, fp, fn = _detection_sets(probs, truths, thr)
    p = tp / max(tp + fp, 1)
    r = tp / max(tp + fn, 1)
    return p, r, 2 * p * r / max(p + r, 1e-9)


def _multi_probs(model, engine, seed, n_scenes):
    from tpu_cnn.head.classify import classify_np
    from tpu_cnn.train.data import CompositeScenes

    ds = CompositeScenes(n_scenes=n_scenes, seed=seed,
                         img_size=model.config.img_size)
    imgs, truths = ds.arrays()
    u8 = np.round(imgs * 255).astype(np.uint8)
    if hasattr(engine, "detect_multi_batch"):
        probs = engine.detect_multi_batch(u8).probs
    else:  # CPU oracle engine: classification probs via the host head
        feats = engine.run_batch(u8)
        _, _, probs = classify_np(feats, model.fc_weight, model.fc_bias)
    return np.asarray(probs), truths


def calibrate(model, mode: str = "auto", n_scenes: int = 80,
              cal_seed: int = 555, eval_seed: int = 123,
              grid_step: float = 0.01, rounds: int = 3,
              verbose: bool = True):
    """Coordinate-descent per-class threshold sweep on calibration-scene
    F1; reports held-out P/R/F1 against the uniform 0.15 floor.
    Returns (thresholds (K,), report dict)."""
    from tpu_cnn.apps.infer import make_engine

    num_classes = len(model.class_names)
    engine = make_engine(model, mode)  # ONE engine: compile once, run both seeds
    cal_p, cal_t = _multi_probs(model, engine, cal_seed, n_scenes)
    ev_p, ev_t = _multi_probs(model, engine, eval_seed, n_scenes)

    uniform = np.full(num_classes, 0.15)
    thr = uniform.copy()
    grid = np.arange(grid_step, 0.6 + 1e-9, grid_step)
    for _ in range(rounds):
        for k in range(num_classes):
            def f1_at(t, k=k):
                cand = thr.copy()
                cand[k] = t
                return prf(cal_p, cal_t, cand)[2]

            thr[k] = max(grid, key=f1_at)

    rep = {
        "uniform_cal": prf(cal_p, cal_t, uniform),
        "uniform_eval": prf(ev_p, ev_t, uniform),
        "calibrated_eval": prf(ev_p, ev_t, thr),
        "calibrated_cal": prf(cal_p, cal_t, thr),
    }
    if verbose:
        print(f"  calibration: {n_scenes} scenes (seed {cal_seed}), "
              f"eval: {n_scenes} scenes (seed {eval_seed})")
        for name, t in zip(model.class_names, thr):
            print(f"    {name:10s}: {t:.2f}")
        for label, key in (("uniform 0.15 (held-out)", "uniform_eval"),
                           ("calibrated   (held-out)", "calibrated_eval")):
            p, r, f1 = rep[key]
            print(f"  {label}: P {p:.3f}  R {r:.3f}  F1 {f1:.3f}")
    return thr, rep


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Calibrate per-class multi-object thresholds")
    p.add_argument("--artifacts", default=None)
    p.add_argument("--mode", default="auto",
                   choices=["auto", "xla", "pallas", "hybrid", "mega",
                            "mesh", "cpu"])
    p.add_argument("--n-scenes", type=int, default=80)
    p.add_argument("--cal-seed", type=int, default=555)
    p.add_argument("--eval-seed", type=int, default=123)
    p.add_argument("--head-prefix", default="",
                   help="calibrate a prefixed head; --save writes "
                        "<prefix>multi_thresh.json")
    p.add_argument("--save", action="store_true",
                   help="persist to <artifacts>/<prefix>multi_thresh.json — "
                        "every --multi surface then defaults to it")
    from tpu_cnn.apps.common import add_variant_arg, load_model

    add_variant_arg(p)
    args = p.parse_args(argv)
    from tpu_cnn.utils import artifacts as art
    from tpu_cnn.utils.paths import default_artifacts

    args.artifacts = args.artifacts or default_artifacts()

    print("=" * 60)
    print("  MULTI-OBJECT THRESHOLD CALIBRATION")
    print("=" * 60)
    model = load_model(args.artifacts, args.variant, args.head_prefix)
    if model.head_mode != "bins":
        p.error("multi-object calibration needs the spatial-bin head")
    thr, rep = calibrate(model, mode=args.mode, n_scenes=args.n_scenes,
                         cal_seed=args.cal_seed, eval_seed=args.eval_seed)
    if args.save:
        import json
        import os

        path = os.path.join(args.artifacts,
                            args.head_prefix + art.MULTI_THRESH_JSON)
        with open(path, "w") as f:
            json.dump([round(float(t), 4) for t in thr], f)
        print(f"\n  saved {path} — --multi surfaces now default to it")
    return thr, rep


if __name__ == "__main__":
    main()
