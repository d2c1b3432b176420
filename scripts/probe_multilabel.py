"""Probe: break the softmax ceiling on multi-object detection F1.

The shipped --multi filter thresholds SOFTMAX probabilities
(per-class floors, apps.calibrate_multi). Softmax rows sum to 1, so two
confident objects structurally suppress each other — calibration had to
push floors to ~0.15 and held-out F1 capped at 0.650 (flagship). This
probe A/Bs, on identical composite-scene forward passes (host twins,
parity-tested against the device path):

  A. softmax probs + the bundle's shipped multi_thresh.json  (baseline)
  B. softmax probs + per-class floors re-fit on THIS cal set (control —
     separates "better score space" from "more calibration data")
  C. raw fc LOGITS + per-class floors (Platt-equivalent: thresholding
     sigmoid(a*z+b) at t is thresholding z at (logit(t)-b)/a, so a
     per-class logit floor IS a per-class sigmoid calibration)
  D. a dedicated MULTI-LABEL head: K-sigmoid logistic regression on the
     same pooled bins the classifier reads, trained on composite +
     single-object scenes (multi-hot targets, BCE + weight decay), floors
     then calibrated per class — the dump->retrain discipline
     (reference software/retrain_classifier.py:24-124) applied to the
     multi-object task itself.

All floors are fit by the same coordinate descent on calibration F1
(seed 555 + extra training scenes), scored on held-out seed 123 — the
exact protocol of apps.calibrate_multi, so numbers are comparable to the
shipped 0.650/0.472/0.386 (ROADMAP).

Run: PYTHONPATH=/root/repo python scripts/probe_multilabel.py
"""
import sys

sys.path.insert(0, "/root/repo")


def coord_descent(scores, truths, grid, rounds=3, init=None):
    import numpy as np

    from tpu_cnn.apps.calibrate_multi import prf

    k_count = scores.shape[1]
    thr = np.full(k_count, grid[len(grid) // 2]) if init is None else init.copy()
    for _ in range(rounds):
        for k in range(k_count):
            def f1_at(t, k=k):
                cand = thr.copy()
                cand[k] = t
                return prf(scores, truths, cand)[2]

            thr[k] = max(grid, key=f1_at)
    return thr


def forward(model, engine, imgs):
    """pooled bins + logits + softmax probs via the host twins."""
    import numpy as np

    from tpu_cnn.head.classify import bin_pool_np

    u8 = np.round(imgs * 255).astype(np.uint8)
    feats = engine.run_batch(u8)
    pooled = bin_pool_np(feats)
    logits = pooled @ model.fc_weight.T + model.fc_bias
    z = logits - logits.max(axis=-1, keepdims=True)
    e = np.exp(z)
    probs = e / e.sum(axis=-1, keepdims=True)
    return pooled, logits, probs


def train_multilabel(pooled, targets, num_classes, wd=1e-3, steps=800,
                     lr=0.05, init=None):
    """K independent sigmoids on the pooled bins: BCE + L2, full-batch
    adam. ``init=(w, b)`` warm-starts from the softmax head (whose raw
    logits are already a strong multi-label score — probe line C).
    Returns (W (K, D), b (K,))."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    x = jnp.asarray(pooled, jnp.float32)
    y = jnp.asarray(targets, jnp.float32)  # (N, K) multi-hot
    d = x.shape[1]
    if init is not None:
        params = {"w": jnp.asarray(init[0], jnp.float32),
                  "b": jnp.asarray(init[1], jnp.float32)}
    else:
        params = {
            "w": jnp.zeros((num_classes, d), jnp.float32),
            "b": jnp.zeros((num_classes,), jnp.float32),
        }

    def loss_fn(p):
        z = x @ p["w"].T + p["b"]
        bce = optax.sigmoid_binary_cross_entropy(z, y).mean()
        return bce + wd * (p["w"] ** 2).sum()

    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, loss

    for _ in range(steps):
        params, state, loss = step(params, state)
    return np.asarray(params["w"]), np.asarray(params["b"])


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from tpu_cnn.apps.calibrate_multi import prf
    from tpu_cnn.apps.common import load_model
    from tpu_cnn.apps.infer import make_engine
    from tpu_cnn.train.data import CompositeScenes, SyntheticShapes

    import os

    bundles = [
        ("lyr3-std", "artifacts/pretrained"),
        ("lyr2-small", "artifacts/pretrained-lyr2"),
        ("lyr4-wide", "artifacts/pretrained-lyr4"),
    ]

    for variant, art_dir in bundles:
        model = load_model(art_dir, variant)
        k_count = len(model.class_names)
        s = model.config.img_size

        def multihot(truths):
            m = np.zeros((len(truths), k_count), np.float32)
            for i, tr in enumerate(truths):
                for cls, _ in tr:
                    m[i, cls] = 1.0
            return m

        # datasets: train scenes (555 + 777) + train singles (888);
        # wd selection on val scenes 999 + val singles 444 (single-object
        # frames have exactly one "present" class, so the same F1 metric
        # penalises multi-emitting on them); final report on eval 123.
        cache = f"/tmp/probe_ml_{variant}.npz"
        if os.path.exists(cache):
            z = np.load(cache, allow_pickle=True)
            pools = {k: z[f"pool_{k}"] for k in
                     ("tr", "val", "ev", "sg_tr", "sg_val")}
            probs_ev, logits = z["probs_ev"], {"ev": z["logits_ev"]}
            tr_t, val_t, ev_t = (z["tr_t"].tolist(), z["val_t"].tolist(),
                                 z["ev_t"].tolist())
            sg_tr_l, sg_val_l = z["sg_tr_l"], z["sg_val_l"]
        else:
            engine = make_engine(model, "xla")
            tr1 = CompositeScenes(n_scenes=80, seed=555, img_size=s)
            tr2 = CompositeScenes(n_scenes=400, seed=777, img_size=s)
            val = CompositeScenes(n_scenes=80, seed=999, img_size=s)
            ev = CompositeScenes(n_scenes=80, seed=123, img_size=s)
            sg_tr = SyntheticShapes(n_per_class=60, seed=888, img_size=s)
            sg_val = SyntheticShapes(n_per_class=15, seed=444, img_size=s)

            i1, t1 = tr1.arrays()
            i2, t2 = tr2.arrays()
            iv, val_t = val.arrays()
            ie, ev_t = ev.arrays()
            ist, sg_tr_l = sg_tr.arrays()
            isv, sg_val_l = sg_val.arrays()
            tr_t = t1 + t2

            p1, _, _ = forward(model, engine, i1)
            p2, _, _ = forward(model, engine, i2)
            pv, _, _ = forward(model, engine, iv)
            pe, ze, probs_ev = forward(model, engine, ie)
            pst, _, _ = forward(model, engine, ist)
            psv, _, _ = forward(model, engine, isv)
            pools = {"tr": np.concatenate([p1, p2]), "val": pv, "ev": pe,
                     "sg_tr": pst, "sg_val": psv}
            logits = {"ev": ze}
            np.savez(cache, pool_tr=pools["tr"], pool_val=pools["val"],
                     pool_ev=pools["ev"], pool_sg_tr=pst, pool_sg_val=psv,
                     probs_ev=probs_ev, logits_ev=ze,
                     tr_t=np.asarray(tr_t, dtype=object),
                     val_t=np.asarray(val_t, dtype=object),
                     ev_t=np.asarray(ev_t, dtype=object),
                     sg_tr_l=sg_tr_l, sg_val_l=sg_val_l)

        def singles_truth(labels):
            return [[(int(c), (0, 0, s - 1, s - 1))] for c in labels]

        print(f"\n=== {variant} ({art_dir}) ===", flush=True)

        # A. shipped floors on softmax
        shipped = (np.asarray(model.multi_thresh)
                   if model.multi_thresh is not None
                   else np.full(k_count, 0.15))
        p, r, f1 = prf(probs_ev, ev_t, shipped)
        print(f"A shipped softmax floors:  P {p:.3f} R {r:.3f} F1 {f1:.3f}")

        # C. raw fc logit floors (Platt-equivalent), fit on train scenes
        def fc_logits(pool):
            return pool @ model.fc_weight.T + model.fc_bias

        zgrid = np.unique(np.quantile(fc_logits(pools["tr"]),
                                      np.linspace(0.02, 0.98, 60)))
        thr_c = coord_descent(fc_logits(pools["tr"]), tr_t, zgrid)
        p, r, f1 = prf(logits["ev"], ev_t, thr_c)
        print(f"C fc-logit floors:         P {p:.3f} R {r:.3f} F1 {f1:.3f}")

        # D. multi-label head, fc-init, wd swept on the val split
        x_tr = np.concatenate([pools["tr"], pools["sg_tr"]])
        sg_hot = np.zeros((len(sg_tr_l), k_count), np.float32)
        sg_hot[np.arange(len(sg_tr_l)), sg_tr_l] = 1.0
        y_tr = np.concatenate([multihot(tr_t), sg_hot])
        val_truth = val_t + singles_truth(sg_val_l)
        sgrid = np.arange(0.05, 0.95 + 1e-9, 0.01)

        # floors are fit on scenes + single-object frames together, so the
        # operating point respects both regimes
        tr_truth = tr_t + singles_truth(sg_tr_l)
        best = None
        for init_name, init in (("fc-init",
                                 (model.fc_weight, model.fc_bias)),
                                ("zero-init", None)):
            for wd in (3e-3, 1e-3, 3e-4, 1e-4, 3e-5, 0.0):
                w_ml, b_ml = train_multilabel(x_tr, y_tr, k_count, wd=wd,
                                              init=init)

                def sc(pool, w=w_ml, b=b_ml):
                    return 1.0 / (1.0 + np.exp(-(pool @ w.T + b)))

                thr = coord_descent(
                    np.concatenate([sc(pools["tr"]), sc(pools["sg_tr"])]),
                    tr_truth, sgrid)
                val_scores = np.concatenate(
                    [sc(pools["val"]), sc(pools["sg_val"])])
                vf1 = prf(val_scores, val_truth, thr)[2]
                if best is None or vf1 > best[0]:
                    best = (vf1, init_name, wd, w_ml, b_ml, thr)
        vf1, init_name, wd, w_ml, b_ml, thr_d = best

        def sc(pool):
            return 1.0 / (1.0 + np.exp(-(pool @ w_ml.T + b_ml)))

        p, r, f1 = prf(sc(pools["ev"]), ev_t, thr_d)
        print(f"D ml head ({init_name}, wd={wd:g}, val F1 {vf1:.3f}):")
        print(f"   held-out eval:          P {p:.3f} R {r:.3f} F1 {f1:.3f}")
        # single-object false-alarm check: F1 where truth = the one class
        sp, sr, sf1 = prf(sc(pools["sg_val"]), singles_truth(sg_val_l),
                          thr_d)
        print(f"   single-object frames:   P {sp:.3f} R {sr:.3f} "
              f"F1 {sf1:.3f}")


if __name__ == "__main__":
    main()
