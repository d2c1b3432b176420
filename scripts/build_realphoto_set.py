"""Build a real-photograph validation set from images baked into this
machine's installed packages.

Context (round-2 verdict item "real-data accuracy parity"): the reference's
headline 56.1% is measured on 544 real COCO val images. This environment has
NO network egress and no COCO on disk, so the COCO protocol itself cannot be
reproduced here (documented in README). This script builds the closest
obtainable substitute: a 6-class single-label set of REAL PHOTOGRAPHS
(photographic texture/scene assets shipped inside dm_control /
gymnasium_robotics / sklearn), cropped into 128x128 tiles with a spatially
disjoint train/val split (val tiles come from image regions never seen in
training, with a one-tile guard band).

Outputs under artifacts/realphoto/ (gitignored; fully regenerable):
  bundle/          weights.bin + classes.json (+ retrained fc head after
                   the dump->retrain loop writes it here)
  train_bins/      test_image_{i}_class{c}.bin raw 128x128 crops (train)
  val_bins/        same, from the held-out image regions (val)

Then the standard CLIs run the whole loop:
  python scripts/build_realphoto_set.py [--run-loop]
  python -m tpu_cnn.apps.dump_features --image-dir artifacts/realphoto/train_bins \
      --artifacts artifacts/realphoto/bundle --output realphoto_train.npz
  python -m tpu_cnn.apps.retrain_classifier --features realphoto_train.npz \
      --output-dir artifacts/realphoto/bundle --classes artifacts/realphoto/bundle/classes.json
  python -m tpu_cnn.apps.infer --artifacts artifacts/realphoto/bundle \
      --image-dir artifacts/realphoto/val_bins --no-save
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
SP = "/opt/venv/lib/python3.12/site-packages"

# class -> list of real photographs (first existing paths are used)
SOURCES = {
    "wood": [
        f"{SP}/gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/wood1.png",
        f"{SP}/gymnasium_robotics/envs/assets/adroit_hand/resources/textures/darkwood.png",
    ],
    "marble": [
        f"{SP}/gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/white_marble_tile2.png",
        f"{SP}/gymnasium_robotics/envs/assets/kitchen_franka/kitchen_assets/textures/white_marble_tile.png",
    ],
    "skin": [
        f"{SP}/gymnasium_robotics/envs/assets/adroit_hand/resources/textures/skin.png",
        f"{SP}/dm_control/suite/dog_assets/skin_texture.png",
    ],
    "grass": [
        f"{SP}/dm_control/locomotion/arenas/assets/outdoor_natural/OutdoorGrassFloorD.png",
    ],
    "sky": [
        f"{SP}/dm_control/locomotion/arenas/assets/outdoor_natural/OutdoorSkybox2048.png",
    ],
    "urban": [
        f"{SP}/sklearn/datasets/images/china.jpg",
        f"{SP}/sklearn/datasets/images/flower.jpg",
    ],
}

CROP = 128
VAL_FRACTION = 0.3  # rightmost 30% of every photo is val-only
GUARD = CROP  # unused band between train and val regions (no tile overlap)


def tiles_from_image(path: str, per_class_budget: int, rng: np.random.RandomState):
    """Yield ('train'|'val', (128,128) u8 gray tile) with a spatially
    disjoint split along x."""
    from PIL import Image

    img = Image.open(path).convert("L")
    w, h = img.size
    scale = 1
    # very large textures: also sample at 2x downscale for scene variety
    arrs = [np.asarray(img, np.uint8)]
    if min(w, h) >= 4 * CROP:
        arrs.append(np.asarray(img.resize((w // 2, h // 2)), np.uint8))
    for arr in arrs:
        hh, ww = arr.shape
        if hh < CROP or ww < CROP:
            continue
        val_x0 = int(ww * (1 - VAL_FRACTION))
        train_x1 = max(0, val_x0 - GUARD)
        # small photos: denser (still non-degenerate) tiling
        stride = CROP // 2 if min(hh, ww) >= 1024 else CROP // 4
        for y in range(0, hh - CROP + 1, stride):
            for x in range(0, ww - CROP + 1, stride):
                if x + CROP <= train_x1:
                    yield "train", arr[y : y + CROP, x : x + CROP]
                elif x >= val_x0 and x + CROP <= ww:
                    yield "val", arr[y : y + CROP, x : x + CROP]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts", "realphoto"))
    ap.add_argument("--per-class", type=int, default=120,
                    help="train tiles per class (val scales with VAL_FRACTION)")
    ap.add_argument("--run-loop", action="store_true",
                    help="after building, run dump->retrain->eval via the CLIs")
    args = ap.parse_args(argv)

    rng = np.random.RandomState(0)
    out = args.out
    for d in ("bundle", "train_bins", "val_bins"):
        os.makedirs(os.path.join(out, d), exist_ok=True)

    classes = sorted(SOURCES)
    counts = {}
    for ci, cname in enumerate(classes):
        pools = {"train": [], "val": []}
        for src in SOURCES[cname]:
            if not os.path.exists(src):
                print(f"  [{cname}] missing source {src} — skipped")
                continue
            for split, tile in tiles_from_image(src, args.per_class, rng):
                pools[split].append(tile)
        for split, budget in (("train", args.per_class),
                              ("val", int(args.per_class * VAL_FRACTION))):
            tiles = pools[split]
            if not tiles:
                print(f"  [{cname}] NO {split} tiles — class dropped"); break
            idx = rng.permutation(len(tiles))[:budget]
            for j, t in enumerate(idx):
                p = os.path.join(out, f"{split}_bins",
                                 f"test_image_{j}_class{ci}.bin")
                pools[split][t].tofile(p)
            counts[(cname, split)] = len(idx)

    from tpu_cnn.utils.paths import default_artifacts

    shutil.copy(os.path.join(default_artifacts(), "weights.bin"),
                os.path.join(out, "bundle", "weights.bin"))
    with open(os.path.join(out, "bundle", "classes.json"), "w") as f:
        json.dump(classes, f)
    # placeholder head so load_bundle works before retraining writes the
    # real one (random init, same shape as the retrained spatial-bin head)
    if not os.path.exists(os.path.join(out, "bundle", "fc_weight.npy")):
        np.save(os.path.join(out, "bundle", "fc_weight.npy"),
                (rng.randn(len(classes), 1024) * 0.01).astype(np.float32))
        np.save(os.path.join(out, "bundle", "fc_bias.npy"),
                np.zeros(len(classes), np.float32))

    print("built real-photo set:")
    for (cname, split), n in sorted(counts.items()):
        print(f"  {cname:8s} {split:5s}: {n} tiles")

    if args.run_loop:
        sys.path.insert(0, REPO)
        from tpu_cnn.apps import dump_features, infer, retrain_classifier

        npz = os.path.join(out, "realphoto_train.npz")
        dump_features.main(["--image-dir", os.path.join(out, "train_bins"),
                            "--artifacts", os.path.join(out, "bundle"),
                            "--output", npz])
        retrain_classifier.main(["--features", npz,
                                 "--output-dir", os.path.join(out, "bundle"),
                                 "--classes",
                                 os.path.join(out, "bundle", "classes.json")])
        print("\n== held-out real-photo evaluation (val_bins) ==")
        infer.main(["--artifacts", os.path.join(out, "bundle"),
                    "--image-dir", os.path.join(out, "val_bins"), "--no-save"])


if __name__ == "__main__":
    main()
