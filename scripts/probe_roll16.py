"""Probe: int16 tap rolls in the polyphase megakernel (round-2 verdict's
open lever). The roll source halves from i32 to i16, so tap-staging VMEM
traffic — the kernel's dominant cost — drops ~2x on paper IF Mosaic compiles
16-bit rolls correctly (8-bit rolls are known-miscompiled on this build).

Checks (on the real chip): (1) bit-parity of both variants vs the numpy
oracle on real test images + noise; (2) interleaved best-of-N forward
timing, one process (CLAUDE.md perf discipline).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpu_cnn.engine.cpu_ref import numpy_cnn_forward
    from tpu_cnn.models.cnn import DEFAULT_SHIFTS
    from tpu_cnn.ops import pallas_poly
    from tpu_cnn.utils import artifacts as art
    from tpu_cnn.utils.paths import default_artifacts

    bundle = art.load_bundle(default_artifacts())
    kernels = [jnp.asarray(k) for k in bundle.kernels]
    shifts = jnp.asarray(DEFAULT_SHIFTS, jnp.int32)

    # ── parity on real images + noise ──
    import glob
    import os

    rs = np.random.RandomState(0)
    imgs = [
        np.fromfile(p, np.uint8)[: 128 * 128].reshape(128, 128)
        for p in sorted(
            glob.glob(os.path.join(default_artifacts(), "test_image_*.bin"))
        )[:12]
    ]
    imgs += [rs.randint(0, 256, (128, 128)).astype(np.uint8) for _ in range(4)]
    gate = np.stack(imgs)
    want = np.stack([numpy_cnn_forward(im, bundle.kernels) for im in gate])

    fwd = {}
    for rd in ("int32", "int16"):
        fwd[rd] = jax.jit(
            lambda x, rd=rd: pallas_poly.cnn_forward_polyphase_pallas(
                x, kernels, shifts, roll_dtype=rd
            )
        )
        got = np.asarray(fwd[rd](jnp.asarray(gate)))
        ok = np.array_equal(got, want)
        print(f"  roll_dtype={rd}: parity {'BIT-EXACT' if ok else 'MISMATCH'}"
              + ("" if ok else f" ({(got != want).sum()} wrong values)"))
        if not ok:
            if rd == "int16":
                print("  -> int16 rolls MISCOMPILE on this build; lever closed")
                return
            raise SystemExit("baseline int32 parity broke?!")

    # ── interleaved timing ──
    batch = 1536
    pools = [
        jnp.asarray(rs.randint(0, 256, (batch, 128, 128), dtype=np.uint8))
        for _ in range(2)
    ]
    jax.block_until_ready(pools)
    for rd in ("int32", "int16"):
        jax.block_until_ready(fwd[rd](pools[0]))
    rounds = 30

    def measure(rd):
        # fetch only a tiny dependent slice per round (the full (B, 64, 256)
        # feature map through the ~30 MB/s relay would measure the tunnel)
        t0 = time.perf_counter()
        probes = []
        for i in range(rounds):
            o = fwd[rd](pools[i % 2])
            p = o[0, 0, :8]
            p.copy_to_host_async()
            probes.append(p)
        res = [np.asarray(p) for p in probes]
        dt = time.perf_counter() - t0
        assert len(res) == rounds
        return rounds * batch / dt

    best = {"int32": 0.0, "int16": 0.0}
    for _ in range(4):
        for rd in ("int32", "int16"):
            best[rd] = max(best[rd], measure(rd))
    for rd, fps in best.items():
        print(f"  roll_dtype={rd}: {fps:12,.0f} FPS forward "
              f"({1e6 / fps:.3f} us/img)")


if __name__ == "__main__":
    main()
