"""Batch-size sweep of the exact bench.py measured program (async-pipelined
detect on the megakernel production path) — does a larger batch amortize
per-dispatch overhead through the relay?"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpu_cnn.models.cnn import DEFAULT_SHIFTS
    from tpu_cnn.ops import detect_head, pallas_poly
    from tpu_cnn.utils import artifacts as art
    from tpu_cnn.utils.paths import default_artifacts

    bundle = art.load_bundle(default_artifacts())
    kernels = [jnp.asarray(k) for k in bundle.kernels]
    fc_w = jnp.asarray(bundle.fc_weight)
    fc_b = jnp.asarray(bundle.fc_bias)
    shifts = jnp.asarray(DEFAULT_SHIFTS, jnp.int32)

    @jax.jit
    def detect(images):
        feats, pooled, feats_twin = pallas_poly.cnn_forward_polyphase_pallas(
            images, kernels, shifts, with_bins=True, with_twin=True
        )
        pred, conf, probs, bbox = detect_head.detect_with_pooled(
            feats, pooled, fc_w, fc_b, 128, features_twin=feats_twin
        )
        return pred, conf, bbox

    rs = np.random.RandomState(0)
    # full sweep (the bench.py batch choice cites this script); narrow to
    # e.g. (1024, 1536, 2048) for a quick re-check around the optimum
    for batch in (256, 512, 1024, 1536, 2048, 4096, 8192):
        n_pools = 4 if batch <= 4096 else 2
        pools = [
            jnp.asarray(rs.randint(0, 256, (batch, 128, 128), dtype=np.uint8))
            for _ in range(n_pools)
        ]
        jax.block_until_ready(pools)
        jax.block_until_ready(detect(pools[0]))
        rounds = max(8, (40 * 2048) // batch)

        def measure():
            t0 = time.perf_counter()
            outs = []
            for i in range(rounds):
                out = detect(pools[i % n_pools])
                for a in out:
                    a.copy_to_host_async()
                outs.append(out)
            res = [(np.asarray(p), np.asarray(b)) for p, c, b in outs]
            dt = time.perf_counter() - t0
            assert len(res) == rounds
            return rounds * batch / dt

        fps = max(measure() for _ in range(2))
        print(f"  batch {batch:5d}: {fps:12,.0f} FPS  ({1e6 / fps:.3f} us/img)")


if __name__ == "__main__":
    main()
