"""Cross-implementation parity verifier — the golden-model system test.

The reference's most important test compares every value of every channel of
all 3 layers against a golden model and prints a per-channel mismatch report
ending in a "DESIGN IS BIT-ACCURATE" verdict (``sim/top/tb.v:635-712``).
This CLI does the same across ALL implementations in this framework:

    numpy oracle  vs  native C++ oracle  vs  XLA f32  vs  XLA int32
    [vs Pallas kernels]  [vs torch QAT sim when torch is installed]

over controlled stimuli (the testbench ramp image, all-zero, all-255),
random images, and any test_image_*.bin found. Per-channel mismatch counts
are reported for every failing pair.

Usage:
  python -m tpu_cnn.apps.verify [--weights path] [--backends ...] [--images N]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

from tpu_cnn.models.cnn import DEFAULT_SHIFTS
from tpu_cnn.utils import weights as wc


def make_stimuli(n_random: int, image_dir: str | None, seed: int = 0,
                 size: int = 128):
    """Controlled + random + on-disk stimuli (tb.v:478-530 idiom)."""
    stims = {}
    i = np.arange(size * size, dtype=np.int64)
    stims["ramp"] = ((13 * i + 5) % 256).astype(np.uint8).reshape(size, size)
    stims["zeros"] = np.zeros((size, size), np.uint8)
    stims["full255"] = np.full((size, size), 255, np.uint8)
    rs = np.random.RandomState(seed)
    for k in range(n_random):
        stims[f"random{k}"] = rs.randint(0, 256, (size, size)).astype(np.uint8)
    if image_dir and size == 128:
        for p in sorted(glob.glob(os.path.join(image_dir, "test_image_*.bin")))[:8]:
            stims[os.path.basename(p)] = np.fromfile(p, np.uint8).reshape(size, size)
    return stims


def build_backends(kernels, shifts, names, img_size: int = 128):
    """Map backend name -> fn(images (B,S,S) u8) -> (B, C, S'*S') u8."""
    backends = {}

    if "numpy" in names:
        from tpu_cnn.engine.cpu_ref import numpy_cnn_forward

        backends["numpy"] = lambda imgs: np.stack(
            [numpy_cnn_forward(im, kernels, shifts) for im in imgs]
        )
    if "native" in names:
        try:
            from tpu_cnn.native.oracle import NativeOracle

            oracle = NativeOracle()
            backends["native"] = lambda imgs: oracle.infer_batch(imgs, kernels, shifts)
        except Exception as e:
            print(f"  native backend unavailable: {e}")
    if any(n in names for n in ("xla-f32", "xla-int32", "pallas", "hybrid", "mega")):
        import jax.numpy as jnp

        kj = [jnp.asarray(k) for k in kernels]
        sj = jnp.asarray(list(shifts), jnp.int32)
        if "xla-f32" in names:
            from tpu_cnn.ops import quant

            backends["xla-f32"] = lambda imgs: np.asarray(
                quant.cnn_forward(jnp.asarray(imgs), kj, sj)
            )
        if "xla-int32" in names:
            from tpu_cnn.ops import quant

            backends["xla-int32"] = lambda imgs: np.asarray(
                quant.cnn_forward(jnp.asarray(imgs), kj, sj, compute_dtype="int32")
            )
        if "pallas" in names:
            from tpu_cnn.ops import pallas_int8

            backends["pallas"] = lambda imgs: np.asarray(
                pallas_int8.cnn_forward_pallas(jnp.asarray(imgs), kj, sj)
            )
        if "hybrid" in names:
            from tpu_cnn.ops import pallas_int8

            backends["hybrid"] = lambda imgs: np.asarray(
                pallas_int8.cnn_forward_hybrid(jnp.asarray(imgs), kj, sj)
            )
        if "mega" in names:
            from tpu_cnn.ops import pallas_poly

            sizes = [img_size // 2**i for i in range(len(kernels))]
            layer_cfg = tuple(
                (k.shape[1], k.shape[0], s) for k, s in zip(kernels, sizes)
            )
            plan = pallas_poly.polyphase_plan(layer_cfg, with_bins=False)
            if plan is not None:
                if plan[0]:
                    print(f"  mega plan for this geometry: {plan[0]} head "
                          f"layer(s) + tail megakernel at batch tile "
                          f"{plan[1]}")
                backends["mega"] = lambda imgs: np.asarray(
                    pallas_poly.cnn_forward_mega(jnp.asarray(imgs), kj, sj)
                )
            else:
                print("  mega backend skipped: no megakernel plan fits "
                      "VMEM for this geometry (hybrid is the production "
                      "path here)")
    if "torch" in names:
        try:
            from tests.test_torch_parity import torch_fixed_point_forward

            backends["torch"] = lambda imgs: np.stack(
                [torch_fixed_point_forward(im, kernels, shifts) for im in imgs]
            )
        except Exception as e:
            print(f"  torch backend unavailable: {e}")
    return backends


def verify_head(kernels, shifts, fc_weight, fc_bias, batch, stim_names,
                img_size, want_feats, use_mega, multi_head=None):
    """Fused-head verify stage: the PRODUCTION on-device head (classifier +
    CAM box, with the bin pooling fused into the megakernel epilogue when
    the geometry supports it) vs the host numpy twins. The reference's
    golden compare runs against the real DUT (``sim/top/tb.v:635-712``);
    this stage makes the canonical verify command exercise the head path
    that actually ships, not just the feature backends."""
    import jax
    import jax.numpy as jnp

    from tpu_cnn.head.cam import cam_bbox_fast, cam_bbox_multi, cam_instances
    from tpu_cnn.head.classify import bin_pool_np, classify_np
    from tpu_cnn.ops import detect_head

    kj = [jnp.asarray(k) for k in kernels]
    sj = jnp.asarray(list(shifts), jnp.int32)
    fc_w = jnp.asarray(fc_weight)
    fc_b = jnp.asarray(fc_bias)
    if multi_head is None:
        # no shipped head: seeded random weights — the arithmetic parity
        # of the sigmoid-score path is verified regardless (random-kernel
        # idiom of the feature stage)
        rs = np.random.RandomState(11)
        multi_head = ((rs.randn(*fc_weight.shape) * 0.05).astype(np.float32),
                      np.zeros(fc_weight.shape[0], np.float32))
    mh = tuple(jnp.asarray(a) for a in multi_head)

    if use_mega:
        from tpu_cnn.ops import pallas_poly

        @jax.jit
        def head_fn(images):
            feats, pooled, f32 = pallas_poly.cnn_forward_mega(
                images, kj, sj, with_bins=True, with_twin=True
            )
            mboxes = detect_head.cam_bbox_multi_f32(
                f32.astype(jnp.float32), fc_w, img_size
            )
            iboxes, icounts = detect_head.cam_instances_f32(
                f32.astype(jnp.float32), fc_w, img_size
            )
            return (pooled,) + detect_head.detect_with_pooled(
                feats, pooled, fc_w, fc_b, img_size, features_twin=f32
            ) + (mboxes, iboxes, icounts,
                 detect_head.multi_scores(pooled, *mh))

        label = "mega(+fused bins)"
    else:
        from tpu_cnn.ops import quant

        @jax.jit
        def head_fn(images):
            feats = quant.cnn_forward(images, kj, sj)
            pooled = detect_head.bin_pool(feats)
            mboxes = detect_head.cam_bbox_multi_f32(
                feats.astype(jnp.float32), fc_w, img_size
            )
            iboxes, icounts = detect_head.cam_instances_f32(
                feats.astype(jnp.float32), fc_w, img_size
            )
            return (pooled,) + detect_head.detect(
                feats, fc_w, fc_b, "bins", img_size
            ) + (mboxes, iboxes, icounts,
                 detect_head.multi_scores(pooled, *mh))

        label = "xla"
    pooled, pred, conf, probs, bbox, mboxes, iboxes, icounts, mscores = (
        np.asarray(a) for a in head_fn(jnp.asarray(batch))
    )

    widx, wconf, wprobs = classify_np(want_feats, fc_weight, fc_bias)
    from tpu_cnn.head.classify import multi_scores_np

    want_mscores = multi_scores_np(bin_pool_np(want_feats), *multi_head)
    want_pooled = bin_pool_np(want_feats)
    want_bbox = np.stack([
        cam_bbox_fast(want_feats[i], int(widx[i]), fc_weight, img_size)
        for i in range(len(batch))
    ])
    want_mboxes = np.stack([
        cam_bbox_multi(want_feats[i], fc_weight, img_size=img_size)
        for i in range(len(batch))
    ])
    want_inst = [cam_instances(want_feats[i], fc_weight, img_size=img_size)
                 for i in range(len(batch))]
    want_iboxes = np.stack([w[0] for w in want_inst])
    want_icounts = np.stack([w[1] for w in want_inst])

    ok = True
    # fused bin sums are exact integers; /16/255 folding may differ by 1 ulp
    checks = [
        ("bin pooling", np.allclose(pooled, want_pooled, atol=1e-5)),
        ("predictions", np.array_equal(pred, widx.astype(pred.dtype))),
        ("probabilities", np.allclose(probs, wprobs, atol=1e-4)),
        ("CAM bbox", np.array_equal(bbox, want_bbox.astype(bbox.dtype))),
        ("multi boxes", np.array_equal(mboxes,
                                       want_mboxes.astype(mboxes.dtype))),
        ("instances", np.array_equal(iboxes,
                                     want_iboxes.astype(iboxes.dtype))
         and np.array_equal(icounts, want_icounts.astype(icounts.dtype))),
        # sigmoid over a (D=1024)-sum f32 logit: dot accumulation order
        # differs device vs numpy (measured up to ~5e-6 on the shipped
        # head, z spanning +-24) — same tolerance as probabilities; the
        # calibrated floors are spaced 0.01, so 1e-4 slack is meaningless
        ("multi scores", np.allclose(mscores, want_mscores, atol=1e-4)),
    ]
    for name, good in checks:
        if good:
            print(f"  head[{label}] vs host twin {name:13s}: OK")
        else:
            ok = False
            if name == "predictions":
                bad = np.nonzero(pred != widx)[0]
            elif name == "CAM bbox":
                bad = np.nonzero((bbox != want_bbox).any(axis=1))[0]
            elif name == "multi boxes":
                bad = np.nonzero((mboxes != want_mboxes).any(axis=(1, 2)))[0]
            elif name == "instances":
                bad = np.nonzero(
                    (iboxes != want_iboxes).any(axis=(1, 2, 3))
                    | (icounts != want_icounts).any(axis=(1, 2))
                )[0]
            else:
                bad = np.asarray([], int)
            names = [stim_names[i] for i in bad[:6]]
            print(f"  head[{label}] vs host twin {name:13s}: MISMATCH "
                  f"{('on ' + ', '.join(names)) if names else ''}")
    return ok


def compare(reference_name, outputs, stim_names):
    """Per-channel mismatch report; returns True if all pairs bit-identical."""
    ok = True
    ref = outputs[reference_name]
    for name, out in outputs.items():
        if name == reference_name:
            continue
        if np.array_equal(out, ref):
            print(f"  {reference_name} vs {name:10s}: BIT-EXACT "
                  f"({out.size} values over {len(stim_names)} stimuli)")
            continue
        ok = False
        print(f"  {reference_name} vs {name:10s}: MISMATCH")
        for si, sname in enumerate(stim_names):
            diff = out[si] != ref[si]
            if diff.any():
                per_ch = diff.sum(axis=1)
                bad = np.nonzero(per_ch)[0]
                print(f"    stimulus {sname}: {diff.sum()} mismatched values "
                      f"in channels {bad[:8].tolist()}"
                      f"{'...' if len(bad) > 8 else ''} "
                      f"(per-ch max {per_ch.max()})")
    return ok


def main(argv=None):
    p = argparse.ArgumentParser(description="Cross-implementation parity verifier")
    p.add_argument("--weights", default=None)
    p.add_argument("--image-dir", default=None)
    p.add_argument("--images", type=int, default=4, help="random stimuli count")
    p.add_argument("--backends",
                   default="numpy,native,xla-f32,xla-int32,pallas,hybrid,mega",
                   help="comma list: numpy,native,xla-f32,xla-int32,pallas,"
                        "hybrid,mega,torch. Default covers every production "
                        "compute path (mega auto-skips where the VMEM model "
                        "refuses the geometry).")
    p.add_argument("--no-head", action="store_true",
                   help="skip the fused-head verify stage (classify + CAM "
                        "vs the host twins)")
    p.add_argument("--shifts", default=None)
    p.add_argument("--variant", default="lyr3-std",
                   help="model geometry from models.registry; non-stock "
                        "variants verify with seeded random weights")
    args = p.parse_args(argv)

    from tpu_cnn.models.registry import default_shifts, get_config

    config = get_config(args.variant)
    if args.shifts is None:
        shifts = (list(DEFAULT_SHIFTS) if args.variant == "lyr3-std"
                  else default_shifts(config))
    else:
        shifts = [int(s) for s in args.shifts.split(",")]

    if args.weights is not None:
        kernels = wc.load_weights_bin(args.weights, config.layer_configs)
    elif args.variant == "lyr3-std":
        from tpu_cnn.utils.paths import default_artifacts

        args.weights = os.path.join(default_artifacts(), "weights.bin")
        kernels = wc.load_weights_bin(args.weights)
    else:
        # Parity is about arithmetic, not trained weights: seeded random
        # int8 kernels exercise the full accumulation range.
        rs = np.random.RandomState(0)
        kernels = [
            rs.randint(-127, 128, size=(oc, ic, 3, 3)).astype(np.int8)
            for ic, oc, _ in config.layer_configs
        ]
    names = [b.strip() for b in args.backends.split(",")]

    print("=" * 64)
    print(f"  CROSS-IMPLEMENTATION PARITY VERIFICATION [{args.variant}]")
    print("=" * 64)
    stims = make_stimuli(args.images, args.image_dir, size=config.img_size)
    batch = np.stack(list(stims.values()))
    print(f"  {len(stims)} stimuli x {len(names)} backends "
          f"(shifts {shifts})")

    backends = build_backends(kernels, shifts, names, config.img_size)
    outputs = {}
    for name, fn in backends.items():
        outputs[name] = fn(batch)
        print(f"  {name:10s}: computed {outputs[name].shape}")

    print("-" * 64)
    ref = "numpy" if "numpy" in outputs else next(iter(outputs))
    ok = compare(ref, outputs, list(stims.keys()))

    if not args.no_head:
        # fused-head stage: the shipped bundle's bins head when its feature
        # dim matches this geometry, else a seeded random bins head (head
        # arithmetic parity, same idiom as the random kernels above)
        oc_last = kernels[-1].shape[0]
        fcw = fcb = None
        multi_head = None
        if args.variant == "lyr3-std":
            try:
                from tpu_cnn.utils import artifacts as art
                from tpu_cnn.utils.paths import default_artifacts

                bundle = art.load_bundle(default_artifacts())
                if bundle.fc_weight.shape[1] == oc_last * 16:
                    fcw, fcb = bundle.fc_weight, bundle.fc_bias
                    multi_head = bundle.multi_head  # shipped presence head
            except Exception:
                pass
        if fcw is None:
            rs = np.random.RandomState(7)
            fcw = (rs.randn(6, oc_last * 16) * 0.05).astype(np.float32)
            fcb = np.zeros(6, np.float32)
        print("-" * 64)
        head_ok = verify_head(
            kernels, shifts, fcw, fcb, batch, list(stims.keys()),
            config.img_size, outputs[ref], use_mega="mega" in outputs,
            multi_head=multi_head,
        )
        ok = ok and head_ok
    print("=" * 64)
    if ok:
        print("  VERDICT: DESIGN IS BIT-ACCURATE across all backends")
    else:
        print("  VERDICT: MISMATCHES FOUND — see report above")
    print("=" * 64)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
