"""Compiled-artifact export/load — the reference bitstream's role, TPU-style.

The reference ships its datapath as a compiled artifact
(``fpga/hw/lyr3_cnn.bit`` + ``.hwh``) that ``pynq.Overlay`` loads at runtime
(``software/pynq_inference.py:105``). The TPU-native analogue is the fused
detect program — polyphase megakernel + classifier + box head, conv/fc
weights folded in as constants — serialized as StableHLO via ``jax.export``:
ONE deployable file that runs with only jax installed (no tpu_cnn
model-building code on the serving host), compiled by the target's XLA on
first load the way the bitstream programs the fabric. The per-layer ReLU
shifts remain a RUNTIME argument of the exported program — the register
semantics survive export.

Usage:
  # export (any host — TPU lowering works from a CPU-only machine):
  python -m tpu_cnn.apps.export_model --output model.tcnnx --batch 1536
  # inspect / smoke-run a deployable:
  python -m tpu_cnn.apps.export_model --load model.tcnnx [--image x.bin ...]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import zipfile

import numpy as np

MANIFEST = "manifest.json"
PROGRAM = "detect.stablehlo"  # format-1 single program (still readable)
FORMAT_VERSION = 2  # format 2: one program per batch bucket


def build_detect_fn(model, backend: str, box_mode: str):
    """The production fused detect (images, shifts) -> (pred, conf, probs,
    bbox) with weights closed over — mega (Pallas megakernel plan) or xla.
    ``interpret`` is pinned False so the Mosaic lowering is embedded even
    when exporting from a CPU-only host."""
    import jax.numpy as jnp

    from tpu_cnn.ops import detect_head, pallas_poly, quant

    kernels = [jnp.asarray(k) for k in model.kernels]
    fc_w = jnp.asarray(model.fc_weight)
    fc_b = jnp.asarray(model.fc_bias)
    bbox_w = (jnp.asarray(model.bbox_weight)
              if model.bbox_weight is not None else None)
    img_size = model.config.img_size
    head_mode = model.head_mode

    if backend == "mega":
        with_twin = box_mode != "reg"

        def detect(images, shifts):
            out = pallas_poly.cnn_forward_mega(
                images, kernels, shifts, with_bins=True, with_twin=with_twin,
                with_feats=with_twin, interpret=False,
            )
            pooled, f32 = (out[1], out[2]) if with_twin else (out, None)
            return detect_head.detect_with_pooled(
                None, pooled, fc_w, fc_b, img_size, features_twin=f32,
                box_mode=box_mode, bbox_weight=bbox_w,
            )
    else:

        def detect(images, shifts):
            feats = quant.cnn_forward(images, kernels, shifts)
            return detect_head.detect(feats, fc_w, fc_b, head_mode, img_size,
                                      box_mode=box_mode, bbox_weight=bbox_w)

    return detect


def build_detect_multi_fn(model, backend: str, box_mode: str,
                          instances: int = 1):
    """The multi-object head (images, shifts) -> (pred, conf, probs,
    boxes (B, K, 4)) with weights closed over — the exportable twin of
    ``TPUEngine._detect_multi`` ('reg' engines export the 'ref' CAM
    profile, the regressor being class-agnostic). ``instances > 1``
    bakes the watershed instance head in (two extra outputs, like the
    live engine's ``detect_multi_batch(instances=)``). A bundle shipping
    ``multi_head.npz`` bakes the multi-label presence head in too (scores
    as the LAST output, mirroring the live engine)."""
    import jax.numpy as jnp

    from tpu_cnn.ops import detect_head, pallas_poly, quant

    kernels = [jnp.asarray(k) for k in model.kernels]
    fc_w = jnp.asarray(model.fc_weight)
    fc_b = jnp.asarray(model.fc_bias)
    mh = (tuple(jnp.asarray(a) for a in model.multi_head)
          if getattr(model, "multi_head", None) is not None else None)
    img_size = model.config.img_size
    head_mode = model.head_mode
    box_mode = "centroid" if box_mode == "centroid" else "ref"

    if backend == "mega" and head_mode == "bins":
        from tpu_cnn.ops import pallas_poly as _pp

        # same plan fallback as the live TPUEngine._detect_multi: if the
        # bins+twin+feats kernel config doesn't fit this geometry's VMEM
        # budget, fall through to the u8-feature formulation below
        if _pp.polyphase_plan(model.config.layer_configs, with_bins=True,
                              with_twin=True, with_feats=True) is None:
            backend = "mega-feats"

    if backend == "mega" and head_mode == "bins":

        def detect_multi(images, shifts):
            _, pooled, twin = pallas_poly.cnn_forward_mega(
                images, kernels, shifts, with_bins=True, with_twin=True,
                with_feats=True, interpret=False,
            )
            return detect_head.detect_multi_with_pooled(
                pooled, twin, fc_w, fc_b, img_size, box_mode=box_mode,
                instances=instances, multi_head=mh,
            )
    else:
        use_mega_feats = backend.startswith("mega")

        def detect_multi(images, shifts):
            feats = (
                pallas_poly.cnn_forward_mega(images, kernels, shifts,
                                             interpret=False)
                if use_mega_feats
                else quant.cnn_forward(images, kernels, shifts)
            )
            return detect_head.detect_multi(feats, fc_w, fc_b, head_mode,
                                            img_size, box_mode=box_mode,
                                            instances=instances,
                                            multi_head=mh)

    return detect_multi


def export_bundle(model, batch=1536, backend: str = "mega",
                  box_mode: str = "ref", platforms=("tpu",),
                  multi: bool = False, instances: int = 1) -> bytes:
    """Serialize the fused detect program for ``platforms``. ``batch`` may
    be an int or a sequence of bucket sizes — each bucket is its own
    compiled program in the container, and the loader picks the smallest
    bucket that fits a request (single-digit batches don't pay the
    1536-wide pad). Returns the .tcnnx container bytes."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from tpu_cnn.ops import detect_head as _dh

    if backend == "mega" and any(p != "tpu" for p in platforms):
        raise ValueError(
            "the megakernel lowers for TPU only; use --backend xla for "
            f"platforms {platforms}"
        )
    batches = sorted({int(b) for b in
                      (batch if hasattr(batch, "__iter__") else [batch])})
    detect = build_detect_fn(model, backend, box_mode)
    s = model.config.img_size
    n_layers = len(model.kernels)
    jitted = jax.jit(detect)
    programs = {}
    multi_programs = {}
    jitted_multi = (jax.jit(build_detect_multi_fn(model, backend, box_mode,
                                                  instances))
                    if multi else None)
    for b in batches:
        shapes = (jax.ShapeDtypeStruct((b, s, s), jnp.uint8),
                  jax.ShapeDtypeStruct((n_layers,), jnp.int32))
        programs[b] = jexport.export(
            jitted, platforms=list(platforms))(*shapes).serialize()
        if multi:
            multi_programs[b] = jexport.export(
                jitted_multi, platforms=list(platforms))(*shapes).serialize()
    manifest = {
        "format": FORMAT_VERSION,
        "platforms": list(platforms),
        "backend": backend,
        "box_mode": box_mode,
        "batches": batches,
        "img_size": s,
        "n_layers": n_layers,
        "classes": list(model.class_names),
        "default_shifts": [int(v) for v in model.shifts],
        "multi": bool(multi),
        "instances": int(instances) if multi else 1,
        "multi_thresh": ([float(t) for t in model.multi_thresh]
                         if getattr(model, "multi_thresh", None) is not None
                         else None),
        # whether the multi program's LAST output is the multi-label
        # presence scores (the space multi_thresh is calibrated in) — the
        # head weights themselves are baked into the program
        "multi_head": bool(multi
                           and getattr(model, "multi_head", None) is not None),
        # instance emission policy floors (engine.instance_detections
        # semantics) — the deployable must reproduce the live engine's
        # filtered detections without the bundle on the serving host
        "instance_min_pixels": _dh.INSTANCE_MIN_PIXELS,
        "instance_min_frac": _dh.INSTANCE_MIN_FRAC,
        "jax_version": jax.__version__,
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(MANIFEST, json.dumps(manifest, indent=1))
        for b, blob in programs.items():
            z.writestr(f"detect_b{b}.stablehlo", blob)
        for b, blob in multi_programs.items():
            z.writestr(f"detect_multi_b{b}.stablehlo", blob)
    return buf.getvalue()


class DeployedDetector:
    """A loaded .tcnnx deployable: ``detect(images[, shifts])`` on the
    current jax platform. Pads/chunks arbitrary batch sizes to the exported
    batch (the artifact is compiled for ONE batch shape, like the bitstream
    is compiled for one geometry)."""

    def __init__(self, blob: bytes):
        import jax
        from jax import export as jexport

        with zipfile.ZipFile(io.BytesIO(blob)) as z:
            self.manifest = json.loads(z.read(MANIFEST))
            fmt = self.manifest.get("format")
            if fmt == 1:  # single-program container
                self.manifest["batches"] = [self.manifest["batch"]]
                exps = {self.manifest["batch"]: jexport.deserialize(z.read(PROGRAM))}
            elif fmt == FORMAT_VERSION:
                exps = {
                    b: jexport.deserialize(z.read(f"detect_b{b}.stablehlo"))
                    for b in self.manifest["batches"]
                }
            else:
                raise ValueError(f"unsupported .tcnnx format {fmt}")
            multi_exps = (
                {
                    b: jexport.deserialize(z.read(f"detect_multi_b{b}.stablehlo"))
                    for b in self.manifest["batches"]
                }
                if self.manifest.get("multi") else {}
            )
        self._exported = exps[max(exps)]  # largest bucket (introspection)
        self._calls = {b: jax.jit(e.call) for b, e in exps.items()}
        self._multi_calls = {b: jax.jit(e.call) for b, e in multi_exps.items()}

    @classmethod
    def load(cls, path: str) -> "DeployedDetector":
        with open(path, "rb") as f:
            return cls(f.read())

    def _run_chunked(self, calls: dict, images: np.ndarray, shifts):
        import jax.numpy as jnp

        images = np.asarray(images, np.uint8)
        if shifts is None:
            shifts = self.manifest["default_shifts"]
        sj = jnp.asarray(shifts, jnp.int32)
        buckets = sorted(calls)
        outs = []
        c0 = 0
        while c0 < len(images):
            remaining = len(images) - c0
            # smallest bucket that fits the remainder; largest for chunking
            eb = next((b for b in buckets if b >= remaining), buckets[-1])
            chunk = images[c0 : c0 + eb]
            b = len(chunk)
            if b < eb:
                chunk = np.concatenate(
                    [chunk, np.zeros((eb - b, *chunk.shape[1:]), np.uint8)]
                )
            res = calls[eb](jnp.asarray(chunk), sj)
            outs.append([np.asarray(r)[:b] for r in res])
            c0 += b
        return tuple(np.concatenate([o[i] for o in outs])
                     for i in range(len(outs[0])))

    def detect(self, images: np.ndarray, shifts=None):
        """(B, S, S) u8 -> (pred, conf, probs, bbox) numpy arrays."""
        return self._run_chunked(self._calls, images, shifts)

    def detect_multi(self, images: np.ndarray, shifts=None):
        """(B, S, S) u8 -> (pred, conf, probs, boxes (B, K, 4)) — only in
        containers exported with --multi (``manifest["multi"]``). When the
        container was exported with --instances N, two extra arrays
        (inst_boxes (B, K, N, 4), inst_counts (B, K, N)) follow; when the
        bundle shipped a multi-label presence head, its scores ride as
        the LAST array (``manifest["multi_head"]``)."""
        if not self._multi_calls:
            raise ValueError(
                "this .tcnnx has no multi-object program — re-export with "
                "apps.export_model --multi")
        return self._run_chunked(self._multi_calls, images, shifts)

    def detections(self, images: np.ndarray, shifts=None, threshold=None):
        """Filtered per-image detections [(class_idx, score, (x1, y1, x2,
        y2)), ...] — the deployment twin of
        ``MultiDetectResult.detections``. The calibrated floors, presence
        score space, and instance emission policy all travel in the
        manifest, so a serving host WITHOUT the artifact bundle reproduces
        the live engine's filtered output exactly (the .tcnnx is the whole
        deployment contract, like the reference's weights/ + .bit +
        .hwh)."""
        from tpu_cnn.engine.tpu import detections_above, instance_detections

        m = self.manifest
        out = self.detect_multi(images, shifts)
        scores = None
        if m.get("multi_head"):
            scores, out = out[-1], out[:-1]
        pred, conf, probs, boxes = out[:4]
        inst = out[4:] if len(out) > 4 else None
        sc = scores if scores is not None else probs
        if threshold is None:
            threshold = (m["multi_thresh"] if m.get("multi_thresh")
                         is not None else 0.15)
        if inst is not None and m.get("instances", 1) > 1:
            return [
                instance_detections(
                    sc[i], boxes[i], inst[0][i], inst[1][i], threshold,
                    min_pixels=m.get("instance_min_pixels"),
                    min_frac=m.get("instance_min_frac"))
                for i in range(len(sc))
            ]
        return [detections_above(sc[i], boxes[i], threshold)
                for i in range(len(sc))]


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Export/load the fused detect program as a deployable"
    )
    p.add_argument("--artifacts", default=None)
    p.add_argument("--head-prefix", default="")
    p.add_argument("--output", default=None, help="write a .tcnnx deployable")
    p.add_argument("--load", default=None, help="load + smoke-run a .tcnnx")
    p.add_argument("--image", action="append", default=[],
                   help="with --load: run these images (.bin/.png/...)")
    p.add_argument("--batch", default="8,1536",
                   help="comma list of compiled batch buckets; the loader "
                        "picks the smallest bucket that fits a request")
    p.add_argument("--backend", default="mega", choices=["mega", "xla"])
    p.add_argument("--box", default="ref", choices=["ref", "centroid", "reg"])
    p.add_argument("--multi", action="store_true",
                   help="also export the multi-object program (one CAM box "
                        "per class; DeployedDetector.detect_multi / "
                        "serve --deployable --multi)")
    p.add_argument("--instances", type=int, default=1,
                   help="with --multi: bake the watershed instance head "
                        "into the multi program (up to N component boxes "
                        "per class)")
    p.add_argument("--platforms", default="tpu",
                   help="comma list (tpu[,cpu]; mega is tpu-only)")
    from tpu_cnn.apps.common import add_variant_arg, load_model

    add_variant_arg(p)
    args = p.parse_args(argv)

    if args.load:
        det = DeployedDetector.load(args.load)
        m = det.manifest
        print(f"  {args.load}: format {m['format']}"
              + (" +multi" if m.get("multi") else "") + f", platforms "
              f"{m['platforms']}, backend {m['backend']}, "
              f"batch buckets {m['batches']}, "
              f"{m['img_size']}x{m['img_size']}, classes {m['classes']}, "
              f"shifts {m['default_shifts']} (runtime-overridable)")
        if args.image:
            from tpu_cnn.utils.artifacts import load_image_any

            imgs = np.stack([
                load_image_any(pth, m["img_size"]).reshape(
                    m["img_size"], m["img_size"]
                )
                for pth in args.image
            ])
            pred, conf, probs, bbox = det.detect(imgs)
            for i, pth in enumerate(args.image):
                print(f"  {os.path.basename(pth)}: "
                      f"{m['classes'][int(pred[i])]} "
                      f"({conf[i] * 100:.1f}%)  box {bbox[i].tolist()}")
        return 0

    if not args.output:
        p.error("need --output (export) or --load (inspect/run)")
    from tpu_cnn.utils.paths import default_artifacts

    args.artifacts = (args.artifacts
                      or default_artifacts(getattr(args, "variant", "lyr3-std")))
    model = load_model(args.artifacts, args.variant, args.head_prefix)
    platforms = tuple(s.strip() for s in args.platforms.split(","))
    batches = [int(v) for v in str(args.batch).split(",")]
    if args.instances > 1 and not args.multi:
        p.error("--instances needs --multi")
    blob = export_bundle(model, batches, args.backend, args.box, platforms,
                         multi=args.multi, instances=args.instances)
    with open(args.output, "wb") as f:
        f.write(blob)
    print(f"  exported {args.output}: {len(blob):,} bytes "
          f"({args.backend} backend, batch {args.batch}, platforms "
          f"{list(platforms)}) — run with --load on a "
          f"{'/'.join(platforms)} host")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
