"""Native-front-end inference service.

The HTTP layer runs in C++ (``native/http_front.cpp``): accept, parse, body
read, per-ticket response rendezvous, and push-back all happen off the GIL.
Python does only what it must — this worker loop drains request batches
through one ctypes call, runs the engine's fused detect, and posts JSON
results back. Closes the one "remaining" native-runtime item from the
round-2 roadmap (the Python ThreadingHTTPServer front end in ``apps.serve``
stays as the portable fallback; same response schema).

Protocol: ``POST /detect`` with EXACTLY img_size^2 raw uint8 bytes (the
reference's test_image_*.bin format) -> JSON {pred, name, conf, probs,
bbox}; ``GET /healthz`` -> {status, pending, served}.

Usage:
  python -m tpu_cnn.apps.serve_native [--port 8000] [--mode auto]
  curl --data-binary @artifacts/pretrained/test_image_0_class3.bin \\
       http://127.0.0.1:8000/detect
"""

from __future__ import annotations

import argparse
import ctypes
import json

import numpy as np

from tpu_cnn.engine.tpu import detections_above

from tpu_cnn.native import build


def _get_lib():
    lib = ctypes.CDLL(build.ensure_built())
    lib.tcnn_http_start.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.tcnn_http_start.restype = ctypes.c_void_p
    lib.tcnn_http_stop.argtypes = [ctypes.c_void_p]
    lib.tcnn_http_port.argtypes = [ctypes.c_void_p]
    lib.tcnn_http_port.restype = ctypes.c_int
    lib.tcnn_http_take.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_double,
    ]
    lib.tcnn_http_take.restype = ctypes.c_int
    lib.tcnn_http_respond.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_char_p, ctypes.c_int,
    ]
    lib.tcnn_http_served.argtypes = [ctypes.c_void_p]
    lib.tcnn_http_served.restype = ctypes.c_uint64
    return lib


class NativeFrontEnd:
    """The C++ HTTP front end + this process's engine worker loop."""

    def __init__(self, host: str, port: int, img_size: int,
                 max_batch: int = 256):
        self._lib = _get_lib()
        self.img_size = img_size
        self.max_batch = max_batch
        self._h = self._lib.tcnn_http_start(
            host.encode(), port, img_size * img_size, 4 * max_batch
        )
        if not self._h:
            raise RuntimeError(f"native front end failed to bind {host}:{port}")
        self.port = self._lib.tcnn_http_port(self._h)

    def serve_once(self, detect_fn, class_names, timeout_s: float = 0.2,
                   multi_thresh: float | None = None) -> int:
        """Drain one batch (blocking up to timeout_s), run ``detect_fn``
        ((B, S, S) u8 -> DetectResult-like), post responses. Returns the
        number of requests served. With ``multi_thresh``, ``detect_fn``
        must return a MultiDetectResult and every response carries a
        'detections' list (the raw-bytes C++ protocol has no query
        string, so the threshold is server-level here)."""
        s = self.img_size
        imgs = np.empty((self.max_batch, s, s), np.uint8)
        tickets = np.empty(self.max_batch, np.uint64)
        n = self._lib.tcnn_http_take(
            self._h, imgs.ctypes.data_as(ctypes.c_void_p),
            tickets.ctypes.data_as(ctypes.c_void_p), self.max_batch,
            ctypes.c_double(timeout_s),
        )
        if n <= 0:
            return 0
        res = detect_fn(imgs[:n])
        for i in range(n):
            idx = int(res.pred[i])
            obj = {
                "pred": idx,
                "name": class_names[idx],
                "conf": float(res.conf[i]),
                "probs": [float(v) for v in res.probs[i]],
                "bbox": [int(v) for v in (res.boxes[i, idx]
                                          if multi_thresh is not None
                                          else res.bbox[i])],
            }
            if multi_thresh is not None:
                from tpu_cnn.engine.tpu import presence_scores

                sc = presence_scores(res)
                if getattr(res, "inst_boxes", None) is not None:
                    from tpu_cnn.engine.tpu import instance_detections

                    dets = instance_detections(
                        sc[i], res.boxes[i], res.inst_boxes[i],
                        res.inst_counts[i], multi_thresh)
                else:
                    dets = detections_above(sc[i], res.boxes[i],
                                            multi_thresh)
                obj["detections"] = [
                    {"pred": k, "name": class_names[k], "conf": prob,
                     "bbox": list(bbox)}
                    for k, prob, bbox in dets
                ]
            payload = json.dumps(obj).encode()
            self._lib.tcnn_http_respond(
                self._h, ctypes.c_uint64(int(tickets[i])), payload,
                len(payload),
            )
        return n

    @property
    def served(self) -> int:
        return int(self._lib.tcnn_http_served(self._h))

    def stop(self) -> None:
        if self._h:
            self._lib.tcnn_http_stop(self._h)
            self._h = None


def main(argv=None):
    p = argparse.ArgumentParser(description="Native-front-end detect service")
    p.add_argument("--artifacts", default=None)
    p.add_argument("--mode", default="auto",
                   choices=["auto", "xla", "pallas", "hybrid", "mega",
                            "mesh", "cpu"])
    p.add_argument("--host", default="127.0.0.1",
                   help="bind address (no auth — expose deliberately)")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=256)
    p.add_argument("--box", default="ref", choices=["ref", "centroid", "reg"])
    p.add_argument("--multi", action="store_true",
                   help="multi-object responses (one CAM box per class "
                        "above --multi-thresh; server-level threshold — "
                        "the raw-bytes protocol has no per-request params)")
    p.add_argument("--multi-thresh", type=float, default=None,
                   help="uniform floor (default: the bundle's calibrated "
                        "multi_thresh.json if present, else 0.15)")
    p.add_argument("--instances", type=int, default=1,
                   help="with --multi: up to N watershed component boxes "
                        "per class in 'detections' (default 1)")
    p.add_argument("--head-prefix", default="")
    from tpu_cnn.apps.common import add_variant_arg, load_model

    add_variant_arg(p)
    args = p.parse_args(argv)
    from tpu_cnn.utils.paths import default_artifacts

    args.artifacts = (args.artifacts
                      or default_artifacts(getattr(args, "variant", "lyr3-std")))
    model = load_model(args.artifacts, args.variant, args.head_prefix)

    from tpu_cnn.apps.infer import make_engine
    from tpu_cnn.apps.serve import _HostDetectAdapter

    if args.multi and model.head_mode != "bins":
        p.error("--multi needs the spatial-bin head (per-class CAM)")
    engine = make_engine(model, args.mode, box_mode=args.box)
    if args.instances > 1:
        import inspect

        if (not args.multi or not hasattr(engine, "detect_multi_batch")
                or "instances" not in inspect.signature(
                    engine.detect_multi_batch).parameters):
            p.error("--instances needs --multi and an engine with "
                    "instance support")
    if hasattr(engine, "warmup"):
        engine.warmup(batch=args.max_batch, multi=args.multi,
                      instances=args.instances)
    if not hasattr(engine, "detect_batch"):
        engine = _HostDetectAdapter(engine, model, box=args.box)
    if args.multi and args.instances > 1:
        import functools

        detect_fn = functools.partial(engine.detect_multi_batch,
                                      instances=args.instances)
    elif args.multi:
        detect_fn = engine.detect_multi_batch
    else:
        detect_fn = engine.detect_batch
    multi_thresh = None
    if args.multi:
        multi_thresh = (args.multi_thresh if args.multi_thresh is not None
                        else (model.multi_thresh
                              if model.multi_thresh is not None else 0.15))

    front = NativeFrontEnd(args.host, args.port, model.config.img_size,
                           args.max_batch)
    print(f"native front end on {args.host}:{front.port} "
          f"(backend {getattr(engine, 'backend', args.mode)}, "
          f"max_batch {args.max_batch}) — POST raw "
          f"{model.config.img_size}^2 bytes to /detect", flush=True)
    try:
        while True:
            front.serve_once(detect_fn, model.class_names,
                             multi_thresh=multi_thresh)
    except KeyboardInterrupt:
        pass
    finally:
        front.stop()


if __name__ == "__main__":
    main()
