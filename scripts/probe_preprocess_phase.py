"""A/B the two nearest-resize preprocess formulations on the chip.

`ops.preprocess.preprocess_frames` picks between a phase-strided row
selection (luma touches only the kept rows) and the dense two-matmul
formulation by the measured `q <= 8 and W % 128 != 0` gate (W = staged
row pitch). This probe measures BOTH formulations interleaved (best-of-N,
per-image checksum fetch, pools generated on device) at any geometry so
the gate can be re-validated when the toolchain moves.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_preprocess_phase.py [HxW ...]

Measured 2026-08-18 (v5e, batch 2048 packed-BGRX, us/img, best of 3x30):

    geometry   q  stride  W%128   dense   phase
    480x640    4    15      0      2.03    4.47   <- dense (aligned pitch)
    240x384    8    15      0      0.95    1.78   <- dense (aligned pitch)
    416x512    4    13      0      1.55    3.56   <- dense (aligned pitch)
    448x640    4    15      0      2.04    4.30   <- dense (aligned pitch)
    200x300   16    25     44      1.46    3.81   <- dense (q > 8)
    240x320    8    15     64      1.81    0.80   <- phase (2.3x)
    288x352    4     9     96     ~1.2     1.02   <- phase
    352x480    4    11     96      3.02    0.81   <- phase (3.7x)
    560x720    8     7     80      6.93    0.95   <- phase (7.3x)
    480x656    4    15     16      5.08    0.83   <- phase (pad-width 480p)

An earlier `s*stride <= 4096` gate was falsified at the 448x640 /
560x720 boundary; a jnp.take row-gather formulation loses everywhere
(2.4-29.5 us/img). The 480x656 row is the pad-width staging trick:
640-wide camera rows staged at a 656-word pitch un-align the layout and
make 480p preprocess 2.4x faster than the 640-pitch dense path.
"""
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = 128


def main():
    import jax
    import jax.numpy as jnp

    from tpu_cnn.ops.preprocess import bt601_gray_packed

    batch, rounds = 2048, 30
    geoms = [tuple(map(int, a.split("x"))) for a in sys.argv[1:]] or [
        (480, 640), (240, 320)
    ]

    def run(f, pools):
        t0 = time.perf_counter()
        outs = []
        for i in range(rounds):
            o = f(pools[i % 2])
            o.copy_to_host_async()
            outs.append(o)
        _ = [np.asarray(o) for o in outs]
        return (time.perf_counter() - t0) / (rounds * batch) * 1e6

    for h, w in geoms:
        s = min(h, w)
        if s % OUT == 0:
            print(f"{h}x{w}: area path (s % {OUT} == 0), no nearest A/B")
            continue
        y0, x0 = (h - s) // 2, (w - s) // 2
        g = math.gcd(s, OUT)
        q = OUT // g
        stride = s // g
        col_idx = (np.arange(OUT) * s // OUT).clip(0, s - 1)
        sel = jnp.asarray(
            (np.arange(s)[:, None] == col_idx[None, :]).astype(np.float32)
        ).astype(jnp.bfloat16)

        @jax.jit
        def dense(x):
            b = x.shape[0]
            cw = jax.lax.slice(x, (0, y0, x0), (b, y0 + s, x0 + s))
            crop = bt601_gray_packed(cw)
            rows = jax.lax.dot_general(
                crop.astype(jnp.bfloat16), sel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            small = jax.lax.dot_general(
                rows, sel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return small.astype(jnp.uint8).astype(jnp.uint32).sum(axis=(1, 2))

        @jax.jit
        def phase(x):
            b = x.shape[0]
            parts = []
            for r in range(q):
                off = r * s // OUT
                sl = jax.lax.slice(
                    x, (0, y0 + off, x0),
                    (b, y0 + off + (g - 1) * stride + 1, x0 + s),
                    (1, stride, 1),
                )
                gray = bt601_gray_packed(sl)
                parts.append(jax.lax.dot_general(
                    gray.astype(jnp.bfloat16), sel, (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ))
            small = jnp.stack(parts, axis=2).reshape(b, OUT, OUT)
            return small.astype(jnp.uint8).astype(jnp.uint32).sum(axis=(1, 2))

        @jax.jit
        def mkpool(key):
            return jax.random.bits(key, (batch, h, w), jnp.uint32)

        pools = [mkpool(jax.random.PRNGKey(i)) for i in range(2)]
        jax.block_until_ready(pools)
        np.testing.assert_array_equal(
            np.asarray(dense(pools[0])), np.asarray(phase(pools[0]))
        )
        best = {"dense": 1e9, "phase": 1e9}
        for f, n in ((dense, "dense"), (phase, "phase")):
            run(f, pools)  # warm
        for _ in range(3):
            for f, n in ((dense, "dense"), (phase, "phase")):
                best[n] = min(best[n], run(f, pools))
        pick = "phase" if q <= 8 and w % 128 != 0 else "dense"
        ok = best[pick] <= best["dense" if pick == "phase" else "phase"]
        print(f"{h}x{w} (q={q}, stride={stride}, W%128={w % 128}): "
              f"dense {best['dense']:.2f}  phase {best['phase']:.2f} us/img"
              f"  gate picks {pick} [{'OK' if ok else 'WRONG'}]")


if __name__ == "__main__":
    main()
