"""Forward-only megakernel timing (async-pipelined, HBM-staged).

Usage: python scripts/time_forward.py [--with-bins] [--rounds 30]
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from tpu_cnn.models.cnn import DEFAULT_SHIFTS
from tpu_cnn.ops import pallas_poly
from tpu_cnn.utils import artifacts as art
from tpu_cnn.utils.paths import default_artifacts


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--with-bins", action="store_true")
    p.add_argument("--with-twin", action="store_true")
    p.add_argument("--rounds", type=int, default=30)
    p.add_argument("--batch", type=int, default=2048)
    args = p.parse_args()

    bundle = art.load_bundle(default_artifacts())
    kernels = [jnp.asarray(k) for k in bundle.kernels]
    shifts = jnp.asarray(DEFAULT_SHIFTS, jnp.int32)
    rs = np.random.RandomState(0)

    @jax.jit
    def fwd(images):
        out = pallas_poly.cnn_forward_polyphase_pallas(
            images, kernels, shifts,
            with_bins=args.with_bins, with_twin=args.with_twin,
        )
        if isinstance(out, tuple):
            # return only tiny reductions to keep HBM outputs small
            return tuple(o.sum() for o in out)
        return out.sum()

    pools = [
        jnp.asarray(rs.randint(0, 256, (args.batch, 128, 128)).astype(np.uint8))
        for _ in range(4)
    ]
    jax.block_until_ready(pools)
    jax.block_until_ready(fwd(pools[0]))

    def measure():
        t0 = time.perf_counter()
        outs = [fwd(pools[i % 4]) for i in range(args.rounds)]
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        return dt / (args.rounds * args.batch) * 1e6

    us = min(measure() for _ in range(2))
    print(f"forward {'with bins ' if args.with_bins else ''}"
          f"{'with f32 ' if args.with_twin else ''}"
          f"{us:.3f} us/img ({1e6 / us:,.0f} FPS)")


if __name__ == "__main__":
    main()
