"""Classifier retrainer — the dump->retrain loop's second half.

Trains the (num_classes, 1024) spatial-bin linear head on dumped features,
reproducing the reference trainer's semantics exactly
(``software/retrain_classifier.py:24-124``): softmax cross-entropy with
inverse-frequency class weights, full-batch SGD + momentum 0.9, L2 1e-3,
LR halved every 300 epochs, best-validation-accuracy weight selection,
seed-42 80/20 split — but as a jitted JAX scan that runs the whole
optimisation on device in one shot.

Usage:
  python -m tpu_cnn.apps.retrain_classifier --features tpu_features.npz
  python -m tpu_cnn.apps.retrain_classifier --features cpu_features.npz --prefix arm_
"""

from __future__ import annotations

import argparse
import json
import os
from functools import partial

import numpy as np

from tpu_cnn.head.classify import bin_pool_np
from tpu_cnn.utils import artifacts as art


@partial(__import__("jax").jit, static_argnames=("epochs", "eval_every"))
def _train_scan(X_train, y_train, X_val, y_val, sample_w, W0, b0, lr0,
                epochs: int, eval_every: int):
    import jax
    import jax.numpy as jnp

    n_t = X_train.shape[0]
    reg = 1e-3
    momentum = 0.9

    def loss_grads(W, b):
        logits = X_train @ W + b
        logits = logits - logits.max(axis=1, keepdims=True)
        probs = jax.nn.softmax(logits, axis=1)
        dlogits = probs.at[jnp.arange(n_t), y_train].add(-1.0)
        dlogits = dlogits * sample_w[:, None] / n_t
        dW = X_train.T @ dlogits + reg * W
        db = dlogits.sum(axis=0)
        return dW, db

    def accuracy(X, y, W, b):
        return ((X @ W + b).argmax(axis=1) == y).mean()

    def step(carry, epoch):
        W, b, vW, vb, lr, best_acc, bW, bb = carry
        dW, db = loss_grads(W, b)
        vW = momentum * vW - lr * dW
        vb = momentum * vb - lr * db
        W, b = W + vW, b + vb

        def do_eval(args):
            W, b, best_acc, bW, bb = args
            acc = accuracy(X_val, y_val, W, b)
            better = acc > best_acc
            return (
                jnp.where(better, acc, best_acc),
                jnp.where(better, W, bW),
                jnp.where(better, b, bb),
            )

        evaled = (epoch + 1) % eval_every == 0
        best_acc, bW, bb = jax.lax.cond(
            evaled, do_eval, lambda a: (a[2], a[3], a[4]), (W, b, best_acc, bW, bb)
        )
        lr = jnp.where((epoch + 1) % 300 == 0, lr * 0.5, lr)
        return (W, b, vW, vb, lr, best_acc, bW, bb), None

    init = (W0, b0, jnp.zeros_like(W0), jnp.zeros_like(b0),
            lr0, jnp.float32(-1.0), W0, b0)
    (W, b, _, _, _, best_acc, bW, bb), _ = jax.lax.scan(
        step, init, jnp.arange(epochs)
    )
    return bW, bb, best_acc


def train_linear_classifier(
    features: np.ndarray,  # (N, D) float32 pooled
    labels: np.ndarray,  # (N,)
    num_classes: int,
    lr: float = 0.01,
    epochs: int = 1000,
    val_split: float = 0.2,
    seed: int = 42,
    verbose: bool = True,
):
    """Returns (weight (C, D), bias (C,)) — PyTorch convention like the
    reference (``retrain_classifier.py:124``)."""
    import jax.numpy as jnp

    n, d = features.shape
    rng = np.random.RandomState(seed)
    idx = rng.permutation(n)
    n_val = max(1, int(n * val_split))
    val_idx, train_idx = idx[:n_val], idx[n_val:]
    X_train, y_train = features[train_idx], labels[train_idx]
    X_val, y_val = features[val_idx], labels[val_idx]

    counts = np.maximum(np.bincount(y_train, minlength=num_classes), 1).astype(np.float32)
    class_w = (1.0 / counts)
    class_w = class_w / class_w.sum() * num_classes
    sample_w = class_w[y_train]

    W0 = (rng.randn(d, num_classes) * 0.01).astype(np.float32)
    b0 = np.zeros(num_classes, np.float32)

    bW, bb, best_acc = _train_scan(
        jnp.asarray(X_train), jnp.asarray(y_train.astype(np.int32)),
        jnp.asarray(X_val), jnp.asarray(y_val.astype(np.int32)),
        jnp.asarray(sample_w), jnp.asarray(W0), jnp.asarray(b0),
        jnp.float32(lr), epochs=epochs, eval_every=100,
    )
    if verbose:
        print(f"  best val acc: {float(best_acc) * 100:.1f}%")
    return np.asarray(bW).T.astype(np.float32), np.asarray(bb).astype(np.float32)


def report(pooled, labels, W, bias, class_names):
    """Post-training evaluation: overall accuracy, per-class recall with a
    gauge bar, and a true->predicted count matrix."""
    preds = (pooled @ W.T + bias).argmax(axis=1)
    acc = float((preds == labels).mean()) * 100
    classes = [int(c) for c in np.unique(labels)]
    name_of = {c: (class_names[c] if class_names else f"class{c}")
               for c in classes}
    pad = max(len(n) for n in name_of.values())

    print(f"\n== evaluation on {len(labels)} samples ==")
    print(f"overall accuracy: {acc:.1f}%\n")
    for c in classes:
        hits = preds[labels == c] == c
        r = float(hits.mean()) if hits.size else 0.0
        gauge = "#" * round(r * 24)
        print(f"  {name_of[c].ljust(pad)}  {r * 100:6.1f}%  "
              f"|{gauge:<24}|  n={int(hits.size)}")

    print("\nconfusion (true row -> predicted column):")
    print("  " + " " * pad + "  " + " ".join(f"{name_of[c][:6]:>6}" for c in classes))
    for t in classes:
        counts = [int((preds[labels == t] == p).sum()) for p in classes]
        print(f"  {name_of[t].ljust(pad)}  " + " ".join(f"{n:>6}" for n in counts))
    return acc


def main(argv=None):
    p = argparse.ArgumentParser(description="Retrain classifier on dumped features")
    p.add_argument("--features", default="tpu_features.npz")
    p.add_argument("--output-dir", default="artifacts/generated")
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--epochs", type=int, default=1500)
    from tpu_cnn.utils.paths import default_artifacts

    p.add_argument("--classes",
                   default=os.path.join(default_artifacts(), "classes.json"),
                   help="class-name override when the feature dump has none")
    p.add_argument("--prefix", default="", help="e.g. 'arm_' -> arm_fc_weight.npy")
    p.add_argument("--optimizer", default="ref", choices=("ref", "adam"),
                   help="ref (default) = the reference trainer's exact "
                        "semantics (SGD momentum 0.9, L2 1e-3, LR "
                        "halving). adam = the trainer's unregularized "
                        "adaptive Adam head fit (beyond-reference) — "
                        "converges where the reference recipe under-fits "
                        "hard feature matrices (docs/ROADMAP.md round-3 "
                        "probes)")
    args = p.parse_args(argv)

    print("=" * 60)
    print("  RETRAIN CLASSIFIER ON DUMPED FEATURES")
    print("=" * 60)
    features, labels, names, shifts = art.load_feature_dump(args.features)
    valid = labels >= 0
    features, labels = features[valid], labels[valid]
    print(f"  Samples: {features.shape[0]}  shifts: {shifts}")

    ch_means = features.astype(float).mean(axis=(0, 2))
    print(f"  Feature range: [{features.min()}, {features.max()}]  "
          f"mean {features.astype(float).mean():.2f}  "
          f"nonzero {(features > 0).mean() * 100:.1f}%  "
          f"active ch {(ch_means > 1.0).sum()}/{features.shape[1]}")

    pooled = bin_pool_np(features)  # (N, 1024) in [0, 1]
    num_classes = int(labels.max()) + 1
    class_names = None
    if os.path.exists(args.classes):
        with open(args.classes) as f:
            class_names = json.load(f)

    if args.optimizer == "adam":
        from tpu_cnn.train.train_cnn import TrainConfig, fit_head

        # --epochs is the per-chunk step count here; fit_head runs up to
        # 10 chunks, keeping the chunk-boundary best-val weights
        print(f"\nTraining linear head (adam, lr={args.lr}, "
              f"{args.epochs}-step chunks, best-val) on "
              f"{pooled.shape} features...")
        cfg = TrainConfig(num_classes=num_classes, head_lr=args.lr,
                          head_epochs=args.epochs)
        W, bias = fit_head(pooled.astype(np.float32), labels, cfg)
    else:
        print(f"\nTraining linear head (ref, lr={args.lr}, "
              f"epochs={args.epochs}) on {pooled.shape} features...")
        W, bias = train_linear_classifier(
            pooled, labels, num_classes, lr=args.lr, epochs=args.epochs
        )
    report(pooled, labels, W, bias, class_names)

    os.makedirs(args.output_dir, exist_ok=True)
    wp = os.path.join(args.output_dir, f"{args.prefix}fc_weight.npy")
    bp = os.path.join(args.output_dir, f"{args.prefix}fc_bias.npy")
    np.save(wp, W)
    np.save(bp, bias)
    print(f"\nSaved: {wp} {W.shape}\n       {bp} {bias.shape}")


if __name__ == "__main__":
    main()
