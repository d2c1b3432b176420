"""Max-over-bins (MIL) presence head vs the dense sigmoid head on REAL
photo scenes — the round-5 attempt at bundle-qat's scenes F1 >= 0.70.

Hypothesis: the dense head scores a class on the GLOBAL 64ch x 16bin
vector, so a 2-object scene dilutes each object to its ~1-4 occupied
bins and recall caps (~0.63 held-out, recall-limited per the round-5
decomposition). A MIL head scores each spatial bin independently with a
shared (K, 64) channel head and takes the max over bins — "present
ANYWHERE", the right inductive bias for multi-object scenes, same
artifact size.

Protocol = calibrate_multi.fit_head --real exactly: fit on train_bins
composites (seeds 555+777) + raw train tiles, select weight decay on a
disjoint val split (999 + val tiles... val singles come from val_bins as
in fit_head), floors by coordinate descent on the train split, report
held-out seed-123 val_bins composites + singles for BOTH heads.

Results: docs/ROADMAP.md "Round 5".
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def train_binmax(x, y, k_count, wd, steps=800, lr=0.05, seed=0, bins=16):
    """x (N, C*bins) bin-pooled, y (N, K) multi-hot -> (w (K, C), b (K,)).
    BCE on the max-over-bins logit, full-batch adam on host CPU.
    bins=256 runs the MIL head at CAM resolution (the per-pixel feature
    map itself) instead of the 4x4 pooled bins."""
    import jax
    import jax.numpy as jnp
    import optax

    c = x.shape[1] // bins
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        xb = jnp.asarray(x.reshape(-1, c, bins), jnp.float32)
        yj = jnp.asarray(y, jnp.float32)
        rs = np.random.RandomState(seed)
        params = {"w": jnp.asarray(rs.randn(k_count, c).astype(np.float32)
                                   * 0.01),
                  "b": jnp.zeros(k_count, jnp.float32)}

        def loss_fn(p):
            # (N, K, 16) bin logits -> max over bins
            z = jnp.einsum("ncj,kc->nkj", xb, p["w"]) + p["b"][None, :, None]
            zmax = z.max(axis=-1)
            return (optax.sigmoid_binary_cross_entropy(zmax, yj).mean()
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


def binmax_scores(pooled, w, b, bins=16):
    c = w.shape[1]
    z = np.einsum("ncj,kc->nkj", pooled.reshape(-1, c, bins), w) \
        + b[None, :, None]
    with np.errstate(over="ignore"):
        return 1.0 / (1.0 + np.exp(-z.max(axis=-1)))


def train_combo(x, y, k_count, wd, fc_init, steps=800, lr=0.05):
    """Combined head: logit_k = x @ wg_k + max_bin(wl_k . feat_bin) + b_k
    — the dense head's singles fidelity plus the MIL head's
    present-anywhere recall. Returns (wg (K, D), wl (K, C), b (K,))."""
    import jax
    import jax.numpy as jnp
    import optax

    c = x.shape[1] // 16
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        xj = jnp.asarray(x, jnp.float32)
        xb = jnp.asarray(x.reshape(-1, c, 16), jnp.float32)
        yj = jnp.asarray(y, jnp.float32)
        params = {"wg": jnp.asarray(np.asarray(fc_init[0], np.float32)),
                  "wl": jnp.zeros((k_count, c), jnp.float32),
                  "b": jnp.asarray(np.asarray(fc_init[1], np.float32))}

        def loss_fn(p):
            zg = xj @ p["wg"].T
            zl = (jnp.einsum("ncj,kc->nkj", xb, p["wl"])).max(axis=-1)
            z = zg + zl + p["b"]
            return (optax.sigmoid_binary_cross_entropy(z, yj).mean()
                    + wd * ((p["wg"] ** 2).sum() + (p["wl"] ** 2).sum()))

        opt = optax.adam(lr)
        state = opt.init(params)

        @jax.jit
        def step(p, s):
            _, g = jax.value_and_grad(loss_fn)(p)
            u, s = opt.update(g, s)
            return optax.apply_updates(p, u), s

        for _ in range(steps):
            params, state = step(params, state)
        return (np.asarray(params["wg"]), np.asarray(params["wl"]),
                np.asarray(params["b"]))


def combo_scores(pooled, wg, wl, b):
    c = wl.shape[1]
    zg = pooled @ wg.T
    zl = np.einsum("ncj,kc->nkj", pooled.reshape(-1, c, 16), wl).max(axis=-1)
    return 1.0 / (1.0 + np.exp(-(zg + zl + b)))


def main():
    import functools

    from tpu_cnn.apps.calibrate_multi import (_train_sigmoid_head,
                                              coord_descent, per_class_prf,
                                              prf)
    from tpu_cnn.apps.common import load_model
    from tpu_cnn.apps.infer import make_engine
    from tpu_cnn.head.classify import pool_for_head
    from tpu_cnn.train.data import BinFolderDataset, RealComposites

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rp = os.path.join(repo, "artifacts", "realphoto")
    model = load_model(os.path.join(rp, "bundle-qat"))
    engine = make_engine(model, "cpu")
    s = model.config.img_size
    k_count = len(model.class_names)

    tr_cls = functools.partial(RealComposites,
                               root=os.path.join(rp, "train_bins"))
    ev_cls = functools.partial(RealComposites,
                               root=os.path.join(rp, "val_bins"))

    def pooled_of(imgs):
        """(pooled (N, C*16), flat feature pixels (N, C*256) /255 — the
        CAM-resolution MIL substrate)."""
        feats = engine.run_batch(np.round(imgs * 255).astype(np.uint8))
        return (pool_for_head(feats, model.fc_weight),
                feats.reshape(len(feats), -1).astype(np.float32) / 255.0)

    def multihot(truths):
        m = np.zeros((len(truths), k_count), np.float32)
        for i, tr in enumerate(truths):
            for cls, _ in tr:
                m[i, cls] = 1.0
        return m

    n_scenes = 480
    n1 = min(80, n_scenes // 6)
    i1, t1 = tr_cls(n_scenes=n1, seed=555, img_size=s).arrays()
    i2, t2 = tr_cls(n_scenes=n_scenes - n1, seed=777, img_size=s).arrays()
    iv, tv = tr_cls(n_scenes=80, seed=999, img_size=s).arrays()
    ie, te = ev_cls(n_scenes=80, seed=123, img_size=s).arrays()
    sgt_i, sgt_l = BinFolderDataset(os.path.join(rp, "train_bins"),
                                    img_size=128).arrays()
    sgv_i, sgv_l = BinFolderDataset(os.path.join(rp, "val_bins"),
                                    img_size=128).arrays()

    (p1, f1_), (p2, f2_) = pooled_of(i1), pooled_of(i2)
    p_tr, f_tr = np.concatenate([p1, p2]), np.concatenate([f1_, f2_])
    (p_val, f_val), (p_ev, f_ev) = pooled_of(iv), pooled_of(ie)
    (p_sgt, f_sgt), (p_sgv, f_sgv) = pooled_of(sgt_i), pooled_of(sgv_i)
    print("  features pooled", flush=True)

    def singles_truth(labels):
        return [[(int(c), (0, 0, s - 1, s - 1))] for c in labels]

    sg_hot = np.zeros((len(sgt_l), k_count), np.float32)
    sg_hot[np.arange(len(sgt_l)), sgt_l] = 1.0
    x_tr = np.concatenate([p_tr, p_sgt])
    y_tr = np.concatenate([multihot(t1 + t2), sg_hot])
    tr_truth = t1 + t2 + singles_truth(sgt_l)
    val_truth = tv + singles_truth(sgv_l)
    sgrid = np.arange(0.05, 0.95 + 1e-9, 0.01)

    if "--combo-only" in sys.argv:
        kinds = ("combo",)
    elif "--milcam-only" in sys.argv:
        kinds = ("milcam",)
    else:
        kinds = ("dense", "binmax", "combo", "milcam")
    pooled_sub = dict(tr=p_tr, sgt=p_sgt, val=p_val, sgv=p_sgv, ev=p_ev)
    flat_sub = dict(tr=f_tr, sgt=f_sgt, val=f_val, sgv=f_sgv, ev=f_ev)
    heads = {}
    for kind in kinds:
        S = flat_sub if kind == "milcam" else pooled_sub
        X_tr = np.concatenate([S["tr"], S["sgt"]])
        best = None
        for wd in (3e-3, 1e-3, 3e-4, 1e-4, 3e-5, 0.0):
            if kind == "dense":
                w, b = _train_sigmoid_head(
                    X_tr, y_tr, (model.fc_weight, model.fc_bias), wd)

                def sc(pool, w=w, b=b):
                    with np.errstate(over="ignore"):
                        return 1.0 / (1.0 + np.exp(-(pool @ w.T + b)))
            elif kind == "combo":
                wg, wl, b = train_combo(
                    X_tr, y_tr, k_count, wd,
                    (model.fc_weight, model.fc_bias))
                w = (wg, wl)

                def sc(pool, wg=wg, wl=wl, b=b):
                    return combo_scores(pool, wg, wl, b)
            else:  # binmax (4x4) or milcam (16x16 CAM resolution)
                bins = 256 if kind == "milcam" else 16
                w, b = train_binmax(X_tr, y_tr, k_count, wd, bins=bins)

                def sc(pool, w=w, b=b, bins=bins):
                    return binmax_scores(pool, w, b, bins=bins)

            thr = coord_descent(
                np.concatenate([sc(S["tr"]), sc(S["sgt"])]), tr_truth,
                sgrid)
            vf1 = prf(np.concatenate([sc(S["val"]), sc(S["sgv"])]),
                      val_truth, thr)[2]
            if best is None or vf1 > best[0]:
                best = (vf1, wd, w, b, thr, sc)
            print(f"  {kind:7s} wd={wd:g}: val F1 {vf1:.3f}", flush=True)
        heads[kind] = best

    print()
    for kind, (vf1, wd, w, b, thr, sc) in heads.items():
        S = flat_sub if kind == "milcam" else pooled_sub
        ev = prf(sc(S["ev"]), te, thr)
        sg = prf(sc(S["sgv"]), singles_truth(sgv_l), thr)
        print(f"  {kind:7s} (wd={wd:g}, val {vf1:.3f}) — HELD-OUT "
              f"scenes P {ev[0]:.3f} R {ev[1]:.3f} F1 {ev[2]:.3f}  |  "
              f"singles F1 {sg[2]:.3f}")
        pc = per_class_prf(sc(S["ev"]), te, thr)
        print("    per-class scenes F1: " + "  ".join(
            f"{model.class_names[k]}={pc[k]['f1']:.2f}"
            for k in range(k_count)))

    winner = max(heads, key=lambda k: heads[k][0])
    print(f"\n  val winner: {winner} (val F1 {heads[winner][0]:.3f}) — "
          f"wiring decision recorded in docs/ROADMAP.md")


if __name__ == "__main__":
    main()
