"""On-device preprocess timing (async-pipelined, HBM-staged raw frames)."""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from tpu_cnn.ops.preprocess import preprocess_frames


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rounds", type=int, default=30)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--res", default="640x480")
    args = p.parse_args()
    w, h = (int(v) for v in args.res.split("x"))
    rs = np.random.RandomState(0)

    @jax.jit
    def pp(frames):
        return preprocess_frames(frames, 128).sum()

    batches = [
        jnp.asarray(rs.randint(0, 256, (args.batch, h, w, 3)).astype(np.uint8))
        for _ in range(4)
    ]
    jax.block_until_ready(batches)
    jax.block_until_ready(pp(batches[0]))

    def measure():
        t0 = time.perf_counter()
        outs = [pp(batches[i % 4]) for i in range(args.rounds)]
        jax.block_until_ready(outs)
        return (time.perf_counter() - t0) / (args.rounds * args.batch) * 1e6

    us = min(measure() for _ in range(2))
    print(f"preprocess {args.res} -> 128^2: {us:.3f} us/img ({1e6 / us:,.0f} FPS)")


if __name__ == "__main__":
    main()
