"""lyr4-wide layer-0 formulation shootout (the measured bottleneck).

probe_lyr4_roofline.py: L0 — 4% of the MACs — costs 24.9 of the 29.6
us/img. Its current formulation is the XLA reroute
(quant.fixed_point_conv_layer: NCHW->NHWC transpose, f32
conv_general_dilated, shift/clip/pool epilogue, transpose back), forced
because Mosaic miscompiles int8 staging below 4 sublane rows (tb=1,
ic=1) and the padded-channel megakernel OOMs scoped VMEM
(probe_lyr4_padded.py). This probe shoots XLA-level reformulations that
keep the exact integer contract:

  f32      the production reroute (baseline)
  bf16     conv inputs in bf16 (u8<=255 and i8 kernels exact in bf16's
           8-bit significand), f32 accumulation — exact, and the MXU's
           native rate is 2x f32
  nchw     f32 conv directly in NCHW dimension numbers (skips the two
           transposes)
  im2col   SAME pad + 9 static slices stacked -> (B*H*W, 9) bf16 matmul
           against (9, oc) — hand-lowered conv as ONE big MXU dot
  s2d      space-to-depth: the 256 map as 4 half-res channels, the
           3x3 conv+2x2 maxpool pair fused into FOUR 2x2-kernel convs
           at 128 whose elementwise max IS the pool (output never
           materialises at 256)

Every variant is parity-gated bit-exact against the production L0
before timing (integer contract: u8 out). Interleaved best-of-4 x 20.

Results: docs/DESIGN.md "Roofline — lyr4-wide chained plan".
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

VARIANTS = ("f32", "bf16", "nchw", "im2col", "s2d")


def main():
    global VARIANTS
    if len(sys.argv) > 1:
        VARIANTS = tuple(sys.argv[1].split(","))
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpu_cnn.apps.common import load_model
    from tpu_cnn.ops import quant

    model = load_model("/root/repo/artifacts/pretrained-lyr4", "lyr4-wide")
    k0 = jnp.asarray(model.kernels[0])  # (16, 1, 3, 3) int8
    shift0 = jnp.asarray(model.shifts[0], jnp.int32)
    oc = int(k0.shape[0])
    s = model.config.img_size

    batch = 256
    rs = np.random.RandomState(0)
    pools = [
        jnp.asarray(rs.randint(0, 256, (batch, s, s), dtype=np.uint8))
        for _ in range(2)
    ]
    jax.block_until_ready(pools)

    def f32(images):  # the production reroute, NCHW contract
        nhwc = images[:, :, :, None]
        out = quant.fixed_point_conv_layer(nhwc, k0, shift0)
        return jnp.transpose(out, (0, 3, 1, 2))

    def bf16(images):
        nhwc = images[:, :, :, None]
        out = quant.fixed_point_conv_layer(nhwc, k0, shift0,
                                           compute_dtype="bfloat16")
        return jnp.transpose(out, (0, 3, 1, 2))

    def nchw(images):
        x = images[:, None, :, :].astype(jnp.float32)
        rhs = k0.astype(jnp.float32)  # (oc, ic, 3, 3) = OIHW
        conv = lax.conv_general_dilated(
            x, rhs, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32)
        act = jnp.clip(
            jnp.right_shift(conv.astype(jnp.int32), shift0), 0, 255)
        return -lax.reduce_window(
            -act, 0, lax.min, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
        ).astype(jnp.uint8)

    def im2col(images):
        b = images.shape[0]
        xp = jnp.pad(images, ((0, 0), (1, 1), (1, 1))).astype(jnp.bfloat16)
        taps = [xp[:, dy:dy + s, dx:dx + s]
                for dy in range(3) for dx in range(3)]
        patches = jnp.stack(taps, axis=-1).reshape(b * s * s, 9)
        w = k0.astype(jnp.bfloat16).reshape(oc, 9).T  # (9, oc)
        conv = jnp.dot(patches, w, preferred_element_type=jnp.float32)
        act = jnp.clip(
            jnp.right_shift(conv.astype(jnp.int32), shift0), 0, 255)
        act = act.reshape(b, s, s, oc)
        pooled = jnp.max(
            act.reshape(b, s // 2, 2, s // 2, 2, oc), axis=(2, 4))
        return jnp.transpose(pooled, (0, 3, 1, 2)).astype(jnp.uint8)

    def s2d(images):
        # Space-to-depth: plane[dy*2+dx][m, n] = x[2m+dy, 2n+dx]. The conv
        # output the pool reads at (2i+py, 2j+px) is
        #   y = sum_{u,v} w[u,v] * x[2i + (py+u-1), 2j + (px+v-1)]
        # and each full-res offset a = py+u-1 decomposes as a = 2*sy + dy,
        # so each (py, px) pool slot is a 2x2-KERNEL conv over the 4
        # half-res planes. shift/clip and max are both monotonic, so the
        # 2x2 maxpool is the elementwise max of the four variants' raw
        # accumulators — the full-res activation never materialises.
        b = images.shape[0]
        h = s // 2
        planes = jnp.stack(
            [images[:, dy::2, dx::2] for dy in range(2) for dx in range(2)],
            axis=-1).astype(jnp.bfloat16)  # (B, h, h, 4)
        planes = jnp.pad(planes, ((0, 0), (1, 1), (1, 1), (0, 0)))
        kf = np.asarray(k0, np.float32)[:, 0]  # (oc, 3, 3)
        acc = None
        for py in range(2):
            for px in range(2):
                w = np.zeros((2, 2, 4, oc), np.float32)  # HWIO
                min_sy = -1 if py == 0 else 0
                min_sx = -1 if px == 0 else 0
                for u in range(3):
                    for v in range(3):
                        a, c = py + u - 1, px + v - 1
                        sy, dy = a // 2, a % 2
                        sx, dx = c // 2, c % 2
                        w[sy - min_sy, sx - min_sx, dy * 2 + dx] += kf[:, u, v]
                view = planes[:, 1 + min_sy:1 + min_sy + h + 1,
                              1 + min_sx:1 + min_sx + h + 1]
                conv = lax.conv_general_dilated(
                    view, jnp.asarray(w, jnp.bfloat16),
                    window_strides=(1, 1), padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)
                acc = conv if acc is None else jnp.maximum(acc, conv)
        act = jnp.clip(
            jnp.right_shift(acc.astype(jnp.int32), shift0), 0, 255)
        return jnp.transpose(act, (0, 3, 1, 2)).astype(jnp.uint8)

    fns = {"f32": f32, "bf16": bf16, "nchw": nchw, "im2col": im2col,
           "s2d": s2d}

    gate = jnp.asarray(rs.randint(0, 256, (8, s, s), dtype=np.uint8))
    want = np.asarray(jax.jit(f32)(gate))

    jfns = {}
    for v in VARIANTS:
        if v not in fns:
            print(f"  {v}: skipped (not built)", flush=True)
            continue
        try:
            jfns[v] = jax.jit(fns[v])
            jax.block_until_ready(jfns[v](pools[0]))
        except Exception as e:
            print(f"  {v}: COMPILE/RUN FAILED — {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
            continue
        got = np.asarray(jfns[v](gate))
        ok = np.array_equal(got, want)
        print(f"  compiled {v} — parity "
              f"{'BIT-EXACT' if ok else 'MISMATCH ' + str((got != want).sum())}",
              flush=True)

    rounds = 20

    def measure(v):
        fn = jfns[v]
        t0 = time.perf_counter()
        probes = []
        for i in range(rounds):
            o = fn(pools[i % 2])
            p = o.reshape(-1)[:8]
            p.copy_to_host_async()
            probes.append(p)
        res = [np.asarray(p) for p in probes]
        dt = time.perf_counter() - t0
        assert len(res) == rounds
        return dt / rounds / batch * 1e6

    live = [v for v in VARIANTS if v in jfns]
    best = {v: 1e9 for v in live}
    for _ in range(4):
        for v in live:
            best[v] = min(best[v], measure(v))
    print(f"\n  {'variant':8s} {'us/img':>8s}")
    for v in live:
        print(f"  {v:8s} {best[v]:8.3f}")


if __name__ == "__main__":
    main()
