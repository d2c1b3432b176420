"""Real-photo multi-object scoring across ALL bundles (round-5 verdict
item 2): the round-4 repo validated real-photo statistics for ONE bundle
(realphoto/bundle-qat); the three main bundles' presence heads + floors
are synthetic-fit and were never scored on ``RealComposites``. This
probe records that gap, per class (which classes drive misses vs false
alarms), on never-seen val_bins photographs:

  - composite scenes F1 (60 scenes, seed 123 — the bundle-qat protocol)
  - single-frame F1 on the raw val tiles (deployment distribution)
  - per-class tp/fp/fn decomposition of both

Tiles are bilinearly rescaled to each variant's native image size
(lyr2-small 64^2, lyr4-wide 256^2). Results: docs/ROADMAP.md
"Real-photo validation" + the gates in tests/test_accuracy_gates.py.

Run: python scripts/probe_realphoto_bundles.py [--head-prefix real_]
"""
import argparse
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

BUNDLES = (
    ("artifacts/pretrained", "lyr3-std"),
    ("artifacts/pretrained-lyr2", "lyr2-small"),
    ("artifacts/pretrained-lyr4", "lyr4-wide"),
    ("artifacts/realphoto/bundle-qat", "lyr3-std"),
)


def score_bundle(model, n_scenes=60, seed=123, root=None,
                 background="noise"):
    """(scenes (P,R,F1), singles (P,R,F1), per-class dicts for both)."""
    from tpu_cnn.apps.calibrate_multi import per_class_prf, prf
    from tpu_cnn.apps.infer import make_engine
    from tpu_cnn.head.classify import (classify_np, multi_scores_np,
                                       pool_for_head)
    from tpu_cnn.train.data import BinFolderDataset, RealComposites
    from tpu_cnn.utils.paths import _REPO_ROOT

    if root is None:
        root = os.path.join(_REPO_ROOT, "artifacts", "realphoto", "val_bins")
    s = model.config.img_size
    engine = make_engine(model, "cpu")

    def scores_of(imgs):
        feats = engine.run_batch(np.round(imgs * 255).astype(np.uint8))
        pooled = pool_for_head(feats, model.fc_weight)
        if model.multi_head is not None:
            return multi_scores_np(pooled, *model.multi_head)
        return classify_np(feats, model.fc_weight, model.fc_bias)[2]

    thr = (np.asarray(model.multi_thresh)
           if model.multi_thresh is not None
           else np.full(len(model.class_names), 0.15))

    kw = {"background": background} if background != "noise" else {}
    ds = RealComposites(n_scenes=n_scenes, seed=seed, img_size=s, root=root,
                        **kw)
    imgs, truths = ds.arrays()
    sc = scores_of(imgs)
    scenes = prf(sc, truths, thr)
    scenes_pc = per_class_prf(sc, truths, thr)

    tiles, labels = BinFolderDataset(root, img_size=128).arrays()
    if s != 128:
        tiles = np.stack([RealComposites._resize(t, s) for t in tiles])
    sct = scores_of(tiles)
    truths_t = [[(int(c), (0, 0, s - 1, s - 1))] for c in labels]
    singles = prf(sct, truths_t, thr)
    singles_pc = per_class_prf(sct, truths_t, thr)
    return scenes, singles, scenes_pc, singles_pc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--head-prefix", default="",
                    help="score a prefixed head (e.g. real_) instead of "
                         "the default synthetic-fit one")
    ap.add_argument("--background", default="noise",
                    choices=["noise", "real"])
    ap.add_argument("--n-scenes", type=int, default=60)
    args = ap.parse_args()

    from tpu_cnn.apps.common import load_model

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for rel, variant in BUNDLES:
        d = os.path.join(repo, rel)
        try:
            model = load_model(d, variant, args.head_prefix)
        except FileNotFoundError as e:
            print(f"\n== {rel} ({variant}): SKIP — {e}")
            continue
        scenes, singles, spc, gpc = score_bundle(
            model, n_scenes=args.n_scenes, background=args.background)
        head = ("multi-label head" if model.multi_head is not None
                else "softmax")
        print(f"\n== {rel} ({variant}) — {head}, "
              f"background={args.background}")
        print(f"   scenes : P {scenes[0]:.3f}  R {scenes[1]:.3f}  "
              f"F1 {scenes[2]:.3f}")
        print(f"   singles: P {singles[0]:.3f}  R {singles[1]:.3f}  "
              f"F1 {singles[2]:.3f}")
        print(f"   {'class':10s} {'scenes tp/fp/fn':>16s} {'F1':>6s}   "
              f"{'singles tp/fp/fn':>17s} {'F1':>6s}")
        for k, name in enumerate(model.class_names):
            a, b = spc[k], gpc[k]
            print(f"   {name:10s} {a['tp']:4d}/{a['fp']:3d}/{a['fn']:3d}"
                  f"{'':5s}{a['f1']:6.3f}   "
                  f"{b['tp']:5d}/{b['fp']:3d}/{b['fn']:3d}{'':5s}"
                  f"{b['f1']:6.3f}")


if __name__ == "__main__":
    main()
