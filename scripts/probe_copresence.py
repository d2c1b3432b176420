"""Co-presence backbone training (--composite-frac) measured end-to-end
on the real-photo protocol — the round-5 follow-up to the head-family
sweep (scripts/probe_binmax_head.py), which attributed the scenes-F1
ceiling (0.63-0.68 for every linear head family) to the BACKBONE:
single-label phase-1 training never teaches the features to keep two
classes' evidence alive in one frame.

The lever: ``train_cnn --composite-frac F`` mixes F*N 2-object
composites (``data.soft_composites`` — distinct-class tiles on the
noise canvas) into phase 1 beside the one-hot singles, under either
loss formulation:
  - ``--composite-loss ce``  (default): soft softmax targets 0.5/0.5 —
    the two classes SPLIT the probability mass;
  - ``--composite-loss bce``: multi-hot 1/1 under per-class sigmoid
    BCE — presences are independent (the deployed presence head's own
    formulation, ops/detect_head.py multi_scores).

Protocol per arm (identical to the shipped bundle-qat loop,
docs/ROADMAP.md round-4 item 4):
  1. train:    train_cnn --bin-folder artifacts/realphoto/train_bins
               --val-bin-folder artifacts/realphoto/val_bins --augment
               [--composite-frac F --composite-loss L] [--seed S]
  2. head:     dump_features (cpu oracle) -> retrain_classifier
               --optimizer adam  (the (6, 1024) bins head)
  3. singles:  apps.infer on the 193 held-out val_bins tiles
  4. scenes:   calibrate_multi.fit_head --real (fit on train_bins
               composites, held-out seed-123 val_bins composites)

Run:  python scripts/probe_copresence.py [--train] [--arms a,b,...]
(--train re-trains missing bundles on the TPU; without it, only
existing artifacts/generated/bundle-<arm> dirs are scored.)

Results: docs/ROADMAP.md "Round 5 (cont.)" — co-presence composites.
Reference anchor: the reference trains single-label only
(training/train_cnn.py:259-301); multi-object is a head-side concern
(pynq_inference.py CAM threshold path), so this lever is
beyond-reference capability probing.
"""
import argparse
import functools
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RP = os.path.join(REPO, "artifacts", "realphoto")
GEN = os.path.join(REPO, "artifacts", "generated")

# arm name -> extra train_cnn flags (all arms share the bundle-qat recipe)
ARMS = {
    "cp0nq": [],
    "cp0nq-s1": ["--seed", "1"],
    "cp25nq": ["--composite-frac", "0.25"],
    "cp50nq": ["--composite-frac", "0.5"],
    "cp25bce": ["--composite-frac", "0.25", "--composite-loss", "bce"],
    "cp50bce": ["--composite-frac", "0.5", "--composite-loss", "bce"],
    "cp50bce-s1": ["--composite-frac", "0.5", "--composite-loss", "bce",
                   "--seed", "1"],
}
BASE = ["--bin-folder", os.path.join(RP, "train_bins"),
        "--val-bin-folder", os.path.join(RP, "val_bins"), "--augment"]


def train_arm(name):
    out = os.path.join(GEN, f"bundle-{name}")
    if os.path.exists(os.path.join(out, "weights.bin")):
        return out
    env = dict(os.environ,
               PYTHONPATH=f"{REPO}:/root/.axon_site")
    subprocess.run([sys.executable, "-m", "tpu_cnn.train.train_cnn",
                    *BASE, *ARMS[name], "--output-dir", out],
                   check=True, env=env, cwd=REPO)
    return out


def score_arm(bundle):
    """(singles_acc, scenes (P,R,F1), singles-frames head (P,R,F1))."""
    from tpu_cnn.apps.calibrate_multi import fit_head
    from tpu_cnn.apps.common import load_model
    from tpu_cnn.apps.infer import make_engine
    from tpu_cnn.head.classify import bin_pool_np, classify_np
    from tpu_cnn.train.data import BinFolderDataset, RealComposites
    from tpu_cnn.train.train_cnn import TrainConfig
    from tpu_cnn.train.train_cnn import fit_head as fit_linear

    model = load_model(bundle)
    engine = make_engine(model, "cpu")
    tr_i, tr_l = BinFolderDataset(os.path.join(RP, "train_bins"),
                                  img_size=128).arrays()
    va_i, va_l = BinFolderDataset(os.path.join(RP, "val_bins"),
                                  img_size=128).arrays()

    # the (6, 1024) adam bins head from the dump->retrain loop
    feats = engine.run_batch(np.round(tr_i * 255).astype(np.uint8))
    cfg = TrainConfig(num_classes=len(model.class_names))
    w, b = fit_linear(bin_pool_np(feats).astype(np.float32), tr_l, cfg,
                      verbose=False)
    model.fc_weight = np.asarray(w, np.float32)
    model.fc_bias = np.asarray(b, np.float32)

    fv = engine.run_batch(np.round(va_i * 255).astype(np.uint8))
    pred = classify_np(fv, model.fc_weight, model.fc_bias)[0]
    acc = float((np.asarray(pred) == va_l).mean())

    singles = ((tr_i, tr_l), (va_i, va_l))  # calibrate_multi --real exactly
    _, _, rep = fit_head(
        model, "cpu", verbose=False,
        scenes_cls=functools.partial(RealComposites,
                                     root=os.path.join(RP, "train_bins")),
        eval_scenes_cls=functools.partial(RealComposites,
                                          root=os.path.join(RP, "val_bins")),
        singles=singles)
    return acc, rep["eval_head"], rep["eval_singles_head"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true",
                    help="train missing arms on the TPU (~11 min each)")
    ap.add_argument("--arms", default=",".join(ARMS))
    args = ap.parse_args()

    rows = []
    for name in args.arms.split(","):
        bundle = os.path.join(GEN, f"bundle-{name}")
        if not os.path.exists(os.path.join(bundle, "weights.bin")):
            if not args.train:
                print(f"{name}: missing (run with --train)")
                continue
            bundle = train_arm(name)
        acc, ev, sg = score_arm(bundle)
        rows.append((name, acc, ev, sg))
        print(f"{name:10s} singles {acc * 100:5.1f}%  "
              f"scenes P {ev[0]:.3f} R {ev[1]:.3f} F1 {ev[2]:.3f}  "
              f"singles-head F1 {sg[2]:.3f}", flush=True)

    print("\nshipped bundle-qat reference: singles 95.9%, scenes F1 0.631,"
          " singles-head F1 0.870 (docs/ROADMAP.md Round 5)")


if __name__ == "__main__":
    main()
