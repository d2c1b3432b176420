"""Throughput/latency benchmark — the ``arm_benchmark.py`` role.

Doubles as a correctness check (classification of a labelled image) and a
perf regression gate, like the reference (``software/arm_benchmark.py:246-264``).
Reports per-layer MAC counts, end-to-end batched FPS per backend, and the
speedup vs the reference FPGA's published numbers (22 FPS end-to-end,
6.8 ms conv latency — BASELINE.md).

Usage:
  python -m tpu_cnn.apps.benchmark --batch 1024 --runs 30
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from tpu_cnn.models.cnn import DEFAULT_SHIFTS, LAYER_CONFIGS, FpgaCNN
from tpu_cnn.utils import artifacts as art

FPGA_FPS = 22.0  # reference README.md:11
FPGA_CONV_MS = 6.8  # reference README.md:12


def macs_per_image() -> int:
    return sum(size * size * oc * ic * 9 for ic, oc, size in LAYER_CONFIGS)


def bench_engine(engine, images: np.ndarray, runs: int, use_detect: bool):
    fn = engine.detect_batch if use_detect and hasattr(engine, "detect_batch") else engine.run_batch
    fn(images)  # warmup / compile
    t0 = time.perf_counter()
    for _ in range(runs):
        fn(images)
    dt = (time.perf_counter() - t0) / runs
    return dt


def main(argv=None):
    p = argparse.ArgumentParser(description="TPU CNN benchmark")
    p.add_argument("--artifacts", default=None)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--runs", type=int, default=20)
    p.add_argument("--modes", default="xla,pallas",
                   help="comma list of: xla, pallas, hybrid, cpu")
    p.add_argument("--detect", action="store_true",
                   help="benchmark the fused detect pipeline (default: features)")
    args = p.parse_args(argv)
    from tpu_cnn.utils.paths import default_artifacts

    args.artifacts = args.artifacts or default_artifacts()

    print("=" * 64)
    print("  TPU CNN BENCHMARK")
    print("=" * 64)
    bundle = art.load_bundle(args.artifacts)
    model = FpgaCNN(bundle.kernels, bundle.fc_weight, bundle.fc_bias,
                    bundle.class_names, shifts=DEFAULT_SHIFTS)

    total_macs = macs_per_image()
    for i, (ic, oc, size) in enumerate(LAYER_CONFIGS):
        m = size * size * oc * ic * 9
        print(f"  Layer {i} ({ic:2d}->{oc:2d}ch {size}x{size}): {m / 1e6:6.1f}M MACs")
    print(f"  Total: {total_macs / 1e6:.1f}M MACs/image")

    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, size=(args.batch, 128, 128)).astype(np.uint8)

    from tpu_cnn.apps.infer import make_engine

    results = {}
    for mode in args.modes.split(","):
        mode = mode.strip()
        try:
            engine = make_engine(model, mode)
            dt = bench_engine(engine, images, args.runs, args.detect)
        except Exception as e:
            print(f"\n  {mode}: FAILED ({e})")
            continue
        fps = args.batch / dt
        results[mode] = fps
        print(f"\n  {mode:8s}: {dt * 1e3:9.3f} ms/batch{args.batch}  "
              f"{fps:12,.0f} FPS  {fps * total_macs / 1e12:8.2f} TMAC/s")
        print(f"  {'':8s}  vs FPGA 22 FPS end-to-end: {fps / FPGA_FPS:10,.0f}x")

    if results:
        best = max(results, key=results.get)
        print("\n" + "=" * 64)
        print(f"  BEST: {best} at {results[best]:,.0f} FPS "
              f"({results[best] / FPGA_FPS:,.0f}x the reference FPGA)")
        print("=" * 64)
    return results


if __name__ == "__main__":
    main()
