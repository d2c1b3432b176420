"""Stage-by-stage timing of the on-device preprocess at camera resolutions,
plus the preprocess x detect composition A/B. Findings (v5e, 2048 x 480x640
packed-BGRX, async-pipelined, per-image checksum fetch as the sync):

  gray only (full frame)        2.7 us/img
  crop(static) then gray        2.1
  + one-hot bf16 resize         2.1   (resize is free)
  old gray -> dynamic_slice    13.9   (constant-index lax.dynamic_slice still
                                       lowers as a dynamic op: full-frame gray
                                       materialised, fusion blocked)
  fused pp+detect (one jit)    14.5   (XLA schedules the combined program
                                       badly; optimization_barrier no help)
  two chained jits              5.3   (= pp 2.1 + detect 3.4, pipelined)

NOTE do not time with a scalar .sum() output: that version measured
0.009 us/img — the work was optimised away / never synced. Fetch a per-image
checksum vector via copy_to_host_async like the production pipeline.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpu_cnn.ops.preprocess import bt601_gray_packed, preprocess_frames

    batch, rounds = 2048, 30
    h, w, out_size = 480, 640, 128
    s = min(h, w)
    y0, x0 = (h - s) // 2, (w - s) // 2

    def stage_gray(words):
        return bt601_gray_packed(words).astype(jnp.uint32).sum(axis=(1, 2))

    def stage_crop_gray(words):
        cw = jax.lax.slice(words, (0, y0, x0), (words.shape[0], y0 + s, x0 + s))
        return bt601_gray_packed(cw).astype(jnp.uint32).sum(axis=(1, 2))

    def stage_full(words):
        return preprocess_frames(words, out_size).astype(jnp.uint32).sum(
            axis=(1, 2)
        )

    rs = np.random.RandomState(0)
    pools = [
        jnp.asarray(rs.randint(0, 2**32, (batch, h, w), dtype=np.uint32))
        for _ in range(2)
    ]
    jax.block_until_ready(pools)

    stages = {
        "gray only": stage_gray,
        "crop then gray": stage_crop_gray,
        "full preprocess_frames": stage_full,
    }
    for name, fn in stages.items():
        f = jax.jit(fn)
        t0 = time.time()
        np.asarray(f(pools[0]))
        print(f"  {name} compiled {time.time() - t0:.0f}s", flush=True)

        def measure():
            t0 = time.perf_counter()
            outs = []
            for i in range(rounds):
                o = f(pools[i % 2])
                o.copy_to_host_async()
                outs.append(o)
            res = [np.asarray(o) for o in outs]
            dt = time.perf_counter() - t0
            assert len(res) == rounds
            return dt / (rounds * batch) * 1e6

        us = min(measure() for _ in range(2))
        print(f"  {name:24s}: {us:7.3f} us/img", flush=True)


if __name__ == "__main__":
    main()
