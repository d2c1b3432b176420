"""Virtual-mesh batch-scaling probe — the closest available stand-in for a
real ICI scaling curve until >1-chip hardware exists.

Runs MeshEngine fused detect over 1/2/4/8 virtual CPU devices at a fixed
global batch and reports throughput per device count. The XLA backend is the
honest compiled datapath on CPU (the megakernel only interprets off-TPU, so
timing it would measure Python); the structural guarantees for the mega
backend — one shard per device, B/n each, bit-parity with the single-device
path — are asserted by tests/test_parallel.py.

Usage: python scripts/probe_mesh_scaling.py [batch]
"""
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from tpu_cnn.apps.common import load_model
    from tpu_cnn.parallel.mesh import MeshEngine, make_mesh
    from tpu_cnn.utils.paths import default_artifacts

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    runs = 6
    model = load_model(default_artifacts())
    imgs = np.random.RandomState(0).randint(
        0, 256, (batch, 128, 128)
    ).astype(np.uint8)

    print(f"  global batch {batch}, {runs} async rounds, xla backend "
          f"(compiled CPU datapath)")
    base = None
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n, model_axis=1, devices=jax.devices()[:n])
        eng = MeshEngine(model, mesh, backend="xla")
        staged = eng.stage_batch(imgs)
        eng.detect_resolve(eng.detect_batch_async(staged))  # compile
        t0 = time.perf_counter()
        handles = [eng.detect_batch_async(staged) for _ in range(runs)]
        for h in handles:
            eng.detect_resolve(h)
        dt = (time.perf_counter() - t0) / runs
        fps = batch / dt
        base = base or fps
        print(f"  devices {n}: {dt * 1e3:8.2f} ms/batch  {fps:10,.0f} FPS  "
              f"(x{fps / base:.2f} vs 1 device)")

    # ── pipe and space axes: same flat-curve evidence (1 host core) ──
    import jax.numpy as jnp

    from tpu_cnn.parallel.pipeline import make_pipeline_mesh, pipelined_forward
    from tpu_cnn.parallel.spatial import (
        check_spatial_split, make_spatial_mesh, spatial_forward,
    )

    kernels = [jnp.asarray(k) for k in model.kernels]
    shifts = jnp.asarray(model.shifts, jnp.int32)
    imgs_j = jnp.asarray(imgs)

    def bench(f, label):
        out = f(imgs_j, shifts)  # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(runs):
            jax.block_until_ready(f(imgs_j, shifts))
        dt = (time.perf_counter() - t0) / runs
        print(f"  {label}: {dt * 1e3:8.2f} ms/batch  {batch / dt:10,.0f} FPS")

    print("  pipeline axis (GPipe forward, microbatch 8):")
    for n in range(1, len(kernels) + 1):
        bench(pipelined_forward(make_pipeline_mesh(n), kernels, microbatch=8),
              f"stages  {n}")
    print("  spatial axis (row shards + halo exchange):")
    for n in (1, 2, 4, 8):
        try:
            check_spatial_split(imgs.shape[1], len(kernels), n)
        except ValueError:
            continue
        bench(spatial_forward(make_spatial_mesh(n), kernels), f"shards  {n}")


if __name__ == "__main__":
    main()
