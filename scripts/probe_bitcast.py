"""Hardware probes for Mosaic width-changing bitcasts (packed-roll design).

Q1: pltpu.bitcast((R, L) i32 -> int8): resulting shape + which byte of each
    i32 lands in which row.
Q2: pltpu.bitcast((4R, L) u8/i8 -> i32): inverse packing.
Q3: packed roll: does an i32 lane roll move 4 packed bytes together
    (trivially yes, but confirm end-to-end through a kernel).

Run ON HARDWARE (interpret mode may differ from Mosaic's layout choice):
  python scripts/probe_bitcast.py
"""
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, L = 8, 256


def k_narrow(x_ref, o_ref):
    o_ref[:] = pltpu.bitcast(x_ref[:], jnp.int8)


def k_widen(x_ref, o_ref):
    o_ref[:] = pltpu.bitcast(x_ref[:], jnp.int32)


def k_packed_roll(x_ref, o_ref):
    o_ref[:] = pltpu.roll(x_ref[:], 3, axis=1)


def run(kern, x, out_shape):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(*out_shape),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=False,
    )(x)


def main():
    print("platform:", jax.devices()[0].platform)
    rs = np.random.RandomState(0)

    # Q1: narrow i32 -> i8
    x = rs.randint(-2**31, 2**31, size=(R, L)).astype(np.int32)
    try:
        y = np.asarray(run(k_narrow, jnp.asarray(x), ((4 * R, L), jnp.int8)))
        print("Q1 narrow OK, shape", y.shape)
        # locate byte b of word (r, l): check against little-endian bytes
        bytes_le = x.view(np.uint8).reshape(R, L, 4)  # (r, l, byte)
        pat = None
        for layout, got in (
            ("r*4+b (word-major rows)", lambda r, b: y[r * 4 + b].astype(np.uint8)),
            ("b*R+r (byte-plane rows)", lambda r, b: y[b * R + r].astype(np.uint8)),
        ):
            ok = all(
                np.array_equal(got(r, b), bytes_le[r, :, b])
                for r in range(R) for b in range(4)
            )
            print(f"  layout {layout}: {'MATCH' if ok else 'no'}")
            if ok:
                pat = layout
        if pat is None:
            print("  sample y[:6, :4]:", y[:6, :4].tolist())
            print("  sample bytes_le[0, :4]:", bytes_le[0, :4].tolist())
    except Exception as e:
        print("Q1 narrow FAILED:", type(e).__name__, str(e)[:300])

    # Q2: widen u8 -> i32
    x8 = rs.randint(0, 256, size=(4 * R, L)).astype(np.uint8)
    try:
        y = np.asarray(run(k_widen, jnp.asarray(x8), ((R, L), jnp.int32)))
        print("Q2 widen OK, shape", y.shape)
        for layout, src in (
            ("r*4+b", lambda r, b: x8[r * 4 + b]),
            ("b*R+r", lambda r, b: x8[b * R + r]),
        ):
            want = np.zeros((R, L), np.uint32)
            for r in range(R):
                for b in range(4):
                    want[r] |= src(r, b).astype(np.uint32) << (8 * b)
            ok = np.array_equal(y.view(np.uint32), want)
            print(f"  layout {layout}: {'MATCH' if ok else 'no'}")
    except Exception as e:
        print("Q2 widen FAILED:", type(e).__name__, str(e)[:300])

    # Q3: packed roll (sanity)
    try:
        y = np.asarray(run(k_packed_roll, jnp.asarray(x), ((R, L), jnp.int32)))
        ok = np.array_equal(y, np.roll(x, 3, axis=1))
        print("Q3 packed i32 roll:", "MATCH" if ok else "MISMATCH")
    except Exception as e:
        print("Q3 FAILED:", type(e).__name__, str(e)[:300])


if __name__ == "__main__":
    main()
