"""Mixed-background refit of bundle-qat's presence head (round 5).

Measured collapse: the shipped multi_head.npz was fit on NOISE-canvas
real-tile composites and scores F1 0.624 there — but 0.270 (recall
0.183) when the canvas is a blurred REAL photograph
(`probe_realphoto_bundles.py --background real`): background bins shift
from near-black to real lighting statistics and the head's gate
collapses. This refits the head with a 50/50 noise/real-background
composite mix (same fit protocol otherwise: calibrate_multi.fit_head,
train_bins tiles, raw-tile singles) and reports ALL THREE held-out
surfaces for old vs new:

  noise-canvas val_bins scenes | real-canvas val_bins scenes | singles

Save (--save) replaces bundle-qat's multi_head.npz + multi_thresh.json
ONLY if noise-scene F1 stays within 0.03 of the shipped head (the
existing gates must keep passing).
"""
import functools
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


class MixedBackgroundComposites:
    """50/50 noise-canvas / blurred-real-canvas RealComposites, matching
    the (n_scenes, seed, img_size) scenes_cls contract."""

    def __init__(self, n_scenes: int = 60, seed: int = 0, img_size=128,
                 root=None):
        from tpu_cnn.train.data import RealComposites

        h = n_scenes // 2
        self.a = RealComposites(n_scenes=n_scenes - h, seed=seed,
                                img_size=img_size, root=root)
        self.b = RealComposites(n_scenes=h, seed=seed + 50000,
                                img_size=img_size, root=root,
                                background="real")

    def arrays(self):
        ia, ta = self.a.arrays()
        ib, tb = self.b.arrays()
        return np.concatenate([ia, ib]), ta + tb


def main():
    save = "--save" in sys.argv

    from tpu_cnn.apps.calibrate_multi import fit_head, prf
    from tpu_cnn.apps.common import load_model
    from tpu_cnn.apps.infer import make_engine
    from tpu_cnn.head.classify import multi_scores_np, pool_for_head
    from tpu_cnn.train.data import BinFolderDataset, RealComposites

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rp = os.path.join(repo, "artifacts", "realphoto")
    bundle = os.path.join(rp, "bundle-qat")
    model = load_model(bundle)
    engine = make_engine(model, "cpu")
    s = model.config.img_size

    singles = (
        BinFolderDataset(os.path.join(rp, "train_bins"),
                         img_size=128).arrays(),
        BinFolderDataset(os.path.join(rp, "val_bins"),
                         img_size=128).arrays(),
    )
    (w, b), thr, rep = fit_head(
        model, mode="cpu",
        scenes_cls=functools.partial(MixedBackgroundComposites,
                                     root=os.path.join(rp, "train_bins")),
        eval_scenes_cls=functools.partial(
            RealComposites, root=os.path.join(rp, "val_bins")),
        singles=singles, verbose=True)

    # held-out surfaces, old vs new
    def scores_with(head, imgs):
        feats = engine.run_batch(np.round(imgs * 255).astype(np.uint8))
        return multi_scores_np(pool_for_head(feats, model.fc_weight), *head)

    surfaces = {}
    for bg in ("noise", "real"):
        kw = {"background": "real"} if bg == "real" else {}
        ds = RealComposites(n_scenes=60, seed=123, img_size=s,
                            root=os.path.join(rp, "val_bins"), **kw)
        surfaces[f"scenes-{bg}"] = ds.arrays()
    tiles, labels = singles[1]
    surfaces["singles"] = (tiles,
                           [[(int(c), (0, 0, s - 1, s - 1))]
                            for c in labels])

    old_head, old_thr = model.multi_head, np.asarray(model.multi_thresh)
    keep_noise = None
    print(f"\n  {'surface':14s} {'shipped F1':>11s} {'mixed-fit F1':>13s}")
    for name, (imgs, truths) in surfaces.items():
        of1 = prf(scores_with(old_head, imgs), truths, old_thr)[2]
        nf1 = prf(scores_with((w, b), imgs), truths, thr)[2]
        if name == "scenes-noise":
            keep_noise = (of1, nf1)
        print(f"  {name:14s} {of1:11.3f} {nf1:13.3f}")

    if save:
        if keep_noise[1] < keep_noise[0] - 0.03:
            print(f"\n  NOT saved: noise-scene F1 dropped "
                  f"{keep_noise[0]:.3f} -> {keep_noise[1]:.3f} (> 0.03)")
            return
        import json

        np.savez(os.path.join(bundle, "multi_head.npz"),
                 w=w.astype(np.float32), b=b.astype(np.float32))
        with open(os.path.join(bundle, "multi_thresh.json"), "w") as f:
            json.dump([round(float(t), 4) for t in thr], f)
        print(f"\n  saved mixed-fit head into {bundle}")


if __name__ == "__main__":
    main()
