"""Calibrate the multi-object detection filter (floors, and optionally
the multi-label presence head).

The multi-object head (``--multi`` everywhere) filters per-class CAM boxes
by a score floor. Two calibration levels:

1. **Floors only** (default): per-class thresholds over the softmax
   probabilities, swept by coordinate descent on detection F1 over
   composite calibration scenes (``train.data.CompositeScenes``, analytic
   ground truth, calibration seeds disjoint from evaluation); persisted
   as ``multi_thresh.json``. Softmax rows sum to 1, so co-present objects
   suppress each other — this level tops out at held-out F1 ~0.65
   (flagship).

2. **``--fit-head``**: additionally train a per-class sigmoid MULTI-LABEL
   head (``multi_head.npz``) on the pooled features of composite AND
   single-object frames produced by the real engine — the reference's
   dump->retrain discipline (``software/retrain_classifier.py:24-124``)
   applied to the multi-object task. Presence scores stop competing, and
   the floors are then calibrated in the head's sigmoid-score space.
   Measured held-out (seed 123) detection F1: flagship 0.650 -> 0.810,
   lyr2-small 0.472 -> 0.796, lyr4-wide 0.386 -> 0.842
   (scripts/probe_multilabel.py); real-photo bundle-qat on never-seen
   val_bins composites 0.412 -> 0.631 with single-frame F1 0.870
   (``--fit-head --real``). ``pred/conf/probs`` stay softmax — only
   the presence filter changes space.

Beyond-reference: the reference has no multi-object surface at all.

Usage:
  python -m tpu_cnn.apps.calibrate_multi --save [--mode auto]
  python -m tpu_cnn.apps.calibrate_multi --fit-head --save
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


def per_class_prf(probs, truths, thr):
    """Per-class (tp, fp, fn, precision, recall, F1) — the error-analysis
    decomposition of the aggregate F1 (which classes drive the misses vs
    the false alarms). Returns a list of dicts, one per class."""
    k_count = probs.shape[1]
    tp = np.zeros(k_count, int)
    fp = np.zeros(k_count, int)
    fn = np.zeros(k_count, int)
    for i, truth in enumerate(truths):
        gt = {c for c, _ in truth}
        for k in range(k_count):
            det = probs[i, k] >= thr[k]
            if det and k in gt:
                tp[k] += 1
            elif det:
                fp[k] += 1
            elif k in gt:
                fn[k] += 1
    out = []
    for k in range(k_count):
        p = tp[k] / max(tp[k] + fp[k], 1)
        r = tp[k] / max(tp[k] + fn[k], 1)
        out.append({"tp": int(tp[k]), "fp": int(fp[k]), "fn": int(fn[k]),
                    "precision": p, "recall": r,
                    "f1": 2 * p * r / max(p + r, 1e-9)})
    return out


def coord_descent(scores, truths, grid, rounds: int = 3, init=None):
    """Per-class threshold sweep by coordinate descent on detection F1 —
    the shared fitter for softmax floors and multi-label score floors."""
    k_count = scores.shape[1]
    thr = (np.full(k_count, grid[len(grid) // 2]) if init is None
           else np.asarray(init, np.float64).copy())
    for _ in range(rounds):
        for k in range(k_count):
            def f1_at(t, k=k):
                cand = thr.copy()
                cand[k] = t
                return prf(scores, truths, cand)[2]

            thr[k] = max(grid, key=f1_at)
    return thr


def _multi_probs(model, engine, seed, n_scenes):
    """Presence scores per scene: the bundle's multi-label head when it
    ships one (floors must be calibrated in the SAME space the filter
    thresholds), else softmax probabilities."""
    from tpu_cnn.head.classify import (classify_np, multi_scores_np,
                                       pool_for_head)
    from tpu_cnn.train.data import CompositeScenes

    ds = CompositeScenes(n_scenes=n_scenes, seed=seed,
                         img_size=model.config.img_size)
    imgs, truths = ds.arrays()
    u8 = np.round(imgs * 255).astype(np.uint8)
    if hasattr(engine, "detect_multi_batch"):
        from tpu_cnn.engine.tpu import presence_scores

        probs = presence_scores(engine.detect_multi_batch(u8))
    else:  # CPU oracle engine: presence scores via the host twins
        feats = engine.run_batch(u8)
        if model.multi_head is not None:
            probs = multi_scores_np(pool_for_head(feats, model.fc_weight),
                                    *model.multi_head)
        else:
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


def _singles_truth(labels, img_size):
    """Single-object frames as 1-element truth lists (full-frame box —
    only class membership matters to the F1 filter metric)."""
    return [[(int(c), (0, 0, img_size - 1, img_size - 1))] for c in labels]


def _pooled(model, engine, imgs):
    """Engine features -> the pooled vector the fc head reads (dump->
    retrain discipline: statistics come from the real pipeline)."""
    import numpy as np

    from tpu_cnn.head.classify import pool_for_head

    u8 = np.round(imgs * 255).astype(np.uint8)
    feats = engine.run_batch(u8)
    return pool_for_head(feats, model.fc_weight)


def _train_sigmoid_head(x, y, init, wd, steps=800, lr=0.05):
    """Full-batch adam on BCE + L2 for the (K, D) sigmoid head.

    Pinned to the host CPU backend: the problem is tiny (~1k x 1k), and
    through the TPU relay 800 sequential dispatches would take minutes
    per config (CLAUDE.md dispatch rules) — the fit sweeps 12 configs."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    import optax

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        xj = jnp.asarray(x, jnp.float32)
        yj = jnp.asarray(y, jnp.float32)
        params = {"w": jnp.asarray(np.asarray(init[0], np.float32)),
                  "b": jnp.asarray(np.asarray(init[1], np.float32))}

        def loss_fn(p):
            z = xj @ p["w"].T + p["b"]
            return (optax.sigmoid_binary_cross_entropy(z, yj).mean()
                    + wd * (p["w"] ** 2).sum())

        opt = optax.adam(lr)
        state = opt.init(params)

        @jax.jit
        def step(p, s):
            _, g = jax.value_and_grad(loss_fn)(p)
            u, s = opt.update(g, s)
            return optax.apply_updates(p, u), s

        for _ in range(steps):
            params, state = step(params, state)
        return np.asarray(params["w"]), np.asarray(params["b"])


def fit_head(model, mode: str = "auto", n_scenes: int = 480,
             eval_seed: int = 123, rounds: int = 3, verbose: bool = True,
             scenes_cls=None, eval_scenes_cls=None, singles=None):
    """Fit the multi-label presence head + its score floors.

    Protocol (validated in scripts/probe_multilabel.py): train on
    composite scenes (seeds 555+777) AND single-object frames (seed 888)
    pooled by the real engine; select init (fc warm-start vs zero) and
    weight decay on a DISJOINT validation split (scenes 999 + singles
    444); calibrate per-class floors on the train split; report held-out
    ``eval_seed`` F1 beside the softmax-floor baseline. Returns
    ((w, b), thresholds, report).

    ``scenes_cls`` swaps the scene source (e.g. ``train.data
    .RealComposites`` for real-photo statistics); it must match
    ``CompositeScenes``'s ``(n_scenes, seed, img_size)`` constructor
    contract. ``eval_scenes_cls`` (default: ``scenes_cls``) lets the
    held-out report come from a DIFFERENT tile pool — the --real path
    fits on train_bins composites and evaluates on never-seen val_bins
    photographs. ``singles`` overrides the single-object frame source:
    ``((imgs, labels), (val_imgs, val_labels))`` float 0..1 arrays —
    the --real path passes the raw train/val tiles themselves (the
    actual deployment distribution), where the default synthetic
    single-shape frames would be out-of-domain noise for a
    photo-trained network."""
    import numpy as np

    from tpu_cnn.apps.infer import make_engine
    from tpu_cnn.train.data import CompositeScenes, SyntheticShapes

    scenes_cls = scenes_cls or CompositeScenes
    eval_scenes_cls = eval_scenes_cls or scenes_cls
    s = model.config.img_size
    k_count = len(model.class_names)
    engine = make_engine(model, mode)

    n1 = min(80, n_scenes // 6)
    tr1 = scenes_cls(n_scenes=n1, seed=555, img_size=s)
    tr2 = scenes_cls(n_scenes=n_scenes - n1, seed=777, img_size=s)
    val = scenes_cls(n_scenes=max(40, n_scenes // 6), seed=999, img_size=s)
    ev = eval_scenes_cls(n_scenes=max(40, n_scenes // 6), seed=eval_seed,
                         img_size=s)
    if singles is None:
        sg_tr = SyntheticShapes(n_per_class=60, seed=888, img_size=s)
        sg_val = SyntheticShapes(n_per_class=15, seed=444, img_size=s)
        ist, sg_tr_l = sg_tr.arrays()
        isv, sg_val_l = sg_val.arrays()
    else:
        (ist, sg_tr_l), (isv, sg_val_l) = singles

    i1, t1 = tr1.arrays()
    i2, t2 = tr2.arrays()
    iv, val_t = val.arrays()
    ie, ev_t = ev.arrays()
    tr_t = t1 + t2

    p_tr = np.concatenate([_pooled(model, engine, i1),
                           _pooled(model, engine, i2)])
    p_val = _pooled(model, engine, iv)
    p_ev = _pooled(model, engine, ie)
    p_sgt = _pooled(model, engine, ist)
    p_sgv = _pooled(model, engine, isv)

    def multihot(truths):
        m = np.zeros((len(truths), k_count), np.float32)
        for i, tr in enumerate(truths):
            for cls, _ in tr:
                m[i, cls] = 1.0
        return m

    sg_hot = np.zeros((len(sg_tr_l), k_count), np.float32)
    sg_hot[np.arange(len(sg_tr_l)), sg_tr_l] = 1.0
    x_tr = np.concatenate([p_tr, p_sgt])
    y_tr = np.concatenate([multihot(tr_t), sg_hot])
    tr_truth = tr_t + _singles_truth(sg_tr_l, s)
    val_truth = val_t + _singles_truth(sg_val_l, s)
    sgrid = np.arange(0.05, 0.95 + 1e-9, 0.01)

    best = None
    for init_name, init in (
            ("fc-init", (model.fc_weight, model.fc_bias)),
            ("zero-init", (np.zeros_like(model.fc_weight),
                           np.zeros_like(model.fc_bias)))):
        for wd in (3e-3, 1e-3, 3e-4, 1e-4, 3e-5, 0.0):
            w, b = _train_sigmoid_head(x_tr, y_tr, init, wd)

            def sc(pool, w=w, b=b):
                return 1.0 / (1.0 + np.exp(-(pool @ w.T + b)))

            thr = coord_descent(
                np.concatenate([sc(p_tr), sc(p_sgt)]), tr_truth, sgrid,
                rounds=rounds)
            vf1 = prf(np.concatenate([sc(p_val), sc(p_sgv)]),
                      val_truth, thr)[2]
            if best is None or vf1 > best[0]:
                best = (vf1, init_name, wd, w, b, thr)
    vf1, init_name, wd, w, b, thr = best

    def sc(pool):
        return 1.0 / (1.0 + np.exp(-(pool @ w.T + b)))

    ev_pr = prf(sc(p_ev), ev_t, thr)
    # softmax-floor baseline on the SAME eval scenes
    def softmax(pool):
        z = pool @ model.fc_weight.T + model.fc_bias
        z -= z.max(axis=-1, keepdims=True)
        e = np.exp(z)
        return e / e.sum(axis=-1, keepdims=True)

    base_thr = (np.asarray(model.multi_thresh)
                if model.multi_thresh is not None
                else np.full(k_count, 0.15))
    base_pr = prf(softmax(p_ev), ev_t, base_thr)
    rep = {
        "val_f1": vf1, "init": init_name, "wd": wd,
        "eval_head": ev_pr, "eval_softmax_floors": base_pr,
        "eval_singles_head": prf(sc(p_sgv), _singles_truth(sg_val_l, s),
                                 thr),
    }
    if verbose:
        print(f"  selected: {init_name}, wd={wd:g} (val F1 {vf1:.3f})")
        for name, t in zip(model.class_names, thr):
            print(f"    {name:10s}: {t:.2f}")
        for label, key in (
                ("softmax floors (held-out)", "eval_softmax_floors"),
                ("multi-label head (held-out)", "eval_head"),
                ("single-object frames (head)", "eval_singles_head")):
            p_, r_, f1_ = rep[key]
            print(f"  {label}: P {p_:.3f}  R {r_:.3f}  F1 {f1_:.3f}")
    return (w, b), thr, rep


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
    p.add_argument("--fit-head", action="store_true",
                   help="train the multi-label presence head "
                        "(multi_head.npz) and calibrate floors in its "
                        "sigmoid-score space — breaks the softmax "
                        "sum-to-1 ceiling on multi-object F1")
    p.add_argument("--real", action="store_true",
                   help="with --fit-head: composite scenes from REAL "
                        "photograph tiles — fit on train_bins, report "
                        "held-out on never-seen val_bins photographs")
    p.add_argument("--save", action="store_true",
                   help="persist to <artifacts>/<prefix>multi_thresh.json "
                        "(+ <prefix>multi_head.npz with --fit-head) — "
                        "every --multi surface then defaults to them")
    from tpu_cnn.apps.common import add_variant_arg, load_model

    add_variant_arg(p)
    args = p.parse_args(argv)
    from tpu_cnn.utils import artifacts as art
    from tpu_cnn.utils.paths import default_artifacts

    args.artifacts = (args.artifacts
                      or default_artifacts(getattr(args, "variant", "lyr3-std")))

    print("=" * 60)
    print("  MULTI-OBJECT THRESHOLD CALIBRATION")
    print("=" * 60)
    model = load_model(args.artifacts, args.variant, args.head_prefix)
    if model.head_mode != "bins":
        p.error("multi-object calibration needs the spatial-bin head")
    head = None
    if args.fit_head:
        scenes_cls = eval_scenes_cls = singles = None
        if args.real:
            import functools
            import os

            from tpu_cnn.train.data import BinFolderDataset, RealComposites
            from tpu_cnn.utils.paths import _REPO_ROOT

            rp = os.path.join(_REPO_ROOT, "artifacts", "realphoto")
            scenes_cls = functools.partial(
                RealComposites, root=os.path.join(rp, "train_bins"))
            eval_scenes_cls = functools.partial(
                RealComposites, root=os.path.join(rp, "val_bins"))
            print("  scenes: REAL photograph composites "
                  "(fit: train_bins, held-out: val_bins)")

            def tiles_at_native(root):
                # raw 128^2 tiles, bilinearly rescaled to the variant's
                # native image size (lyr2-small 64^2, lyr4-wide 256^2)
                imgs, labels = BinFolderDataset(root, img_size=128).arrays()
                s = model.config.img_size
                if s != 128:
                    imgs = np.stack([RealComposites._resize(t, s)
                                     for t in imgs])
                return imgs, labels

            singles = (
                tiles_at_native(os.path.join(rp, "train_bins")),
                tiles_at_native(os.path.join(rp, "val_bins")),
            )
        head, thr, rep = fit_head(model, mode=args.mode,
                                  eval_seed=args.eval_seed,
                                  scenes_cls=scenes_cls,
                                  eval_scenes_cls=eval_scenes_cls,
                                  singles=singles)
    else:
        thr, rep = calibrate(model, mode=args.mode, n_scenes=args.n_scenes,
                             cal_seed=args.cal_seed,
                             eval_seed=args.eval_seed)
    if args.save:
        import json
        import os

        path = os.path.join(args.artifacts,
                            args.head_prefix + art.MULTI_THRESH_JSON)
        with open(path, "w") as f:
            json.dump([round(float(t), 4) for t in thr], f)
        print(f"\n  saved {path} — --multi surfaces now default to it")
        if head is not None:
            hpath = os.path.join(args.artifacts,
                                 args.head_prefix + art.MULTI_HEAD_NPZ)
            np.savez(hpath, w=head[0].astype(np.float32),
                     b=head[1].astype(np.float32))
            print(f"  saved {hpath} — --multi presence scores now come "
                  f"from the multi-label head")
    return thr, rep


if __name__ == "__main__":
    main()
