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
PROGRAM = "detect.stablehlo"
FORMAT_VERSION = 1


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
        with_f32 = box_mode != "reg"

        def detect(images, shifts):
            out = pallas_poly.cnn_forward_mega(
                images, kernels, shifts, with_bins=True, with_f32=with_f32,
                with_feats=with_f32, interpret=False,
            )
            pooled, f32 = (out[1], out[2]) if with_f32 else (out, None)
            return detect_head.detect_with_pooled(
                None, pooled, fc_w, fc_b, img_size, features_f32=f32,
                box_mode=box_mode, bbox_weight=bbox_w,
            )
    else:

        def detect(images, shifts):
            feats = quant.cnn_forward(images, kernels, shifts)
            return detect_head.detect(feats, fc_w, fc_b, head_mode, img_size,
                                      box_mode=box_mode, bbox_weight=bbox_w)

    return detect


def export_bundle(model, batch: int, backend: str = "mega",
                  box_mode: str = "ref", platforms=("tpu",)) -> bytes:
    """Serialize the fused detect program for ``platforms``. Returns the
    .tcnnx container bytes (zip: manifest + StableHLO program)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    if backend == "mega" and any(p != "tpu" for p in platforms):
        raise ValueError(
            "the megakernel lowers for TPU only; use --backend xla for "
            f"platforms {platforms}"
        )
    detect = build_detect_fn(model, backend, box_mode)
    s = model.config.img_size
    n_layers = len(model.kernels)
    exp = jexport.export(jax.jit(detect), platforms=list(platforms))(
        jax.ShapeDtypeStruct((batch, s, s), jnp.uint8),
        jax.ShapeDtypeStruct((n_layers,), jnp.int32),
    )
    manifest = {
        "format": FORMAT_VERSION,
        "platforms": list(platforms),
        "backend": backend,
        "box_mode": box_mode,
        "batch": batch,
        "img_size": s,
        "n_layers": n_layers,
        "classes": list(model.class_names),
        "default_shifts": [int(v) for v in model.shifts],
        "jax_version": jax.__version__,
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(MANIFEST, json.dumps(manifest, indent=1))
        z.writestr(PROGRAM, exp.serialize())
    return buf.getvalue()


class DeployedDetector:
    """A loaded .tcnnx deployable: ``detect(images[, shifts])`` on the
    current jax platform. Pads/chunks arbitrary batch sizes to the exported
    batch (the artifact is compiled for ONE batch shape, like the bitstream
    is compiled for one geometry)."""

    def __init__(self, blob: bytes):
        from jax import export as jexport

        with zipfile.ZipFile(io.BytesIO(blob)) as z:
            self.manifest = json.loads(z.read(MANIFEST))
            self._exported = jexport.deserialize(z.read(PROGRAM))
        if self.manifest.get("format") != FORMAT_VERSION:
            raise ValueError(f"unsupported .tcnnx format {self.manifest.get('format')}")
        import jax

        self._call = jax.jit(self._exported.call)

    @classmethod
    def load(cls, path: str) -> "DeployedDetector":
        with open(path, "rb") as f:
            return cls(f.read())

    def detect(self, images: np.ndarray, shifts=None):
        """(B, S, S) u8 -> (pred, conf, probs, bbox) numpy arrays."""
        import jax.numpy as jnp

        m = self.manifest
        images = np.asarray(images, np.uint8)
        if shifts is None:
            shifts = m["default_shifts"]
        sj = jnp.asarray(shifts, jnp.int32)
        eb = m["batch"]
        outs = []
        for c0 in range(0, len(images), eb):
            chunk = images[c0 : c0 + eb]
            b = len(chunk)
            if b < eb:
                chunk = np.concatenate(
                    [chunk, np.zeros((eb - b, *chunk.shape[1:]), np.uint8)]
                )
            res = self._call(jnp.asarray(chunk), sj)
            outs.append([np.asarray(r)[:b] for r in res])
        return tuple(np.concatenate([o[i] for o in outs]) for i in range(4))


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
    p.add_argument("--batch", type=int, default=1536,
                   help="compiled batch shape of the exported program")
    p.add_argument("--backend", default="mega", choices=["mega", "xla"])
    p.add_argument("--box", default="ref", choices=["ref", "centroid", "reg"])
    p.add_argument("--platforms", default="tpu",
                   help="comma list (tpu[,cpu]; mega is tpu-only)")
    from tpu_cnn.apps.common import add_variant_arg, load_model

    add_variant_arg(p)
    args = p.parse_args(argv)

    if args.load:
        det = DeployedDetector.load(args.load)
        m = det.manifest
        print(f"  {args.load}: format {m['format']}, platforms "
              f"{m['platforms']}, backend {m['backend']}, batch {m['batch']}, "
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

    args.artifacts = args.artifacts or default_artifacts()
    model = load_model(args.artifacts, args.variant, args.head_prefix)
    platforms = tuple(s.strip() for s in args.platforms.split(","))
    blob = export_bundle(model, args.batch, args.backend, args.box, platforms)
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
