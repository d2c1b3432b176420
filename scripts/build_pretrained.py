"""Build the self-contained pretrained artifact bundle.

Reproduces the reference's full artifact pipeline without any external
dataset: two-phase QAT training on the procedural shapes set, export of the
weights.bin/fc/classes bundle + labelled test images, then the dump->retrain
loop to produce the production (6, 1024) spatial-bin head — all into
``artifacts/pretrained/``.

Run:  python scripts/build_pretrained.py [--epochs 12] [--n-per-class 120]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_cnn.apps.dump_features import dump_features
from tpu_cnn.apps.retrain_classifier import report, train_linear_classifier
from tpu_cnn.head.classify import bin_pool_np
from tpu_cnn.models.cnn import DEFAULT_SHIFTS, FpgaCNN
from tpu_cnn.train import data as D
from tpu_cnn.train.train_cnn import TrainConfig, train
from tpu_cnn.utils import artifacts as art


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--n-per-class", type=int, default=120)
    p.add_argument("--out", default="artifacts/pretrained")
    p.add_argument("--mode", default="auto", help="engine for the feature dump")
    args = p.parse_args()

    ds = D.SyntheticShapes(n_per_class=args.n_per_class, seed=7)
    imgs, labels = ds.arrays()
    n_val = len(imgs) // 6
    cfg = TrainConfig(epochs=args.epochs, batch_size=64, head_epochs=400)

    print("== phase 1+2: QAT training + export ==")
    train(cfg, (imgs[n_val:], labels[n_val:]), (imgs[:n_val], labels[:n_val]),
          args.out, class_names=ds.class_names)

    print("\n== dump -> retrain: production (6, 1024) spatial-bin head ==")
    model = FpgaCNN.from_artifacts(args.out)
    paths = sorted(glob.glob(os.path.join(args.out, "test_image_*.bin")))
    # widen the head-training set beyond the exported test images
    extra = D.SyntheticShapes(n_per_class=60, seed=11)
    eimgs, elabels = extra.arrays()
    features, flabels, names = dump_features(model, paths, mode=args.mode)
    from tpu_cnn.apps.infer import make_engine

    engine = make_engine(model, args.mode)
    eu8 = np.round(eimgs * 255).astype(np.uint8)
    efeats = np.concatenate(
        [engine.run_batch(eu8[s : s + 64]) for s in range(0, len(eu8), 64)]
    )
    all_feats = np.concatenate([features, efeats])
    all_labels = np.concatenate([flabels, elabels])

    pooled = bin_pool_np(all_feats)
    W, bias = train_linear_classifier(pooled, all_labels, cfg.num_classes,
                                      lr=0.01, epochs=900)
    acc = report(pooled, all_labels, W, bias, ds.class_names)
    np.save(os.path.join(args.out, "fc_weight.npy"), W)
    np.save(os.path.join(args.out, "fc_bias.npy"), bias)
    print(f"\nBundle complete in {args.out}/ (head acc {acc:.1f}%)")


if __name__ == "__main__":
    main()
