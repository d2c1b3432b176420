"""E2E A/B of the compact device->host multi-result encoding.

probe_instance_ablate.py showed instances-mode COMPUTE is +1.27 us/img
over plain multi, while the e2e benchmark sat at ~12-14 us/img — the
gap is int32 box readback through the ~30 MB/s relay. This probe runs
the production async pipeline (stage_batch + dispatch + resolve — the
exact bench_engine discipline) for compact (u8/i16 wire dtypes) vs
padded (int32) engines INTERLEAVED in one process, plain-multi and
instances=2, and value-checks the two engines' results for equality.

Run on a healthy-relay session: PYTHONPATH=/root/repo python
scripts/probe_compact_readback.py

Results are recorded in docs/ROADMAP.md (r4 section) after measurement.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    from tpu_cnn.apps.common import load_model
    from tpu_cnn.engine.tpu import TPUEngine
    from tpu_cnn.utils.paths import default_artifacts

    model = load_model(default_artifacts())
    batch, rounds = 1536, 30
    rs = np.random.RandomState(0)
    images = rs.randint(0, 256, (batch, 128, 128), dtype=np.uint8)

    engines = {
        "compact": TPUEngine(model, backend="mega", compact_multi=True),
        "padded": TPUEngine(model, backend="mega", compact_multi=False),
    }

    # value equality gate: compact must change bytes on the wire only
    small = images[:8]
    for inst in (1, 2):
        a = engines["compact"].detect_multi_batch(small, instances=inst)
        b = engines["padded"].detect_multi_batch(small, instances=inst)
        assert np.array_equal(a.boxes, b.boxes) and a.boxes.dtype == np.int32
        if inst > 1:
            assert np.array_equal(a.inst_boxes, b.inst_boxes)
            assert np.array_equal(a.inst_counts, b.inst_counts)
    print("  value parity: OK (i32-identical results)", flush=True)

    def measure(eng, inst):
        pools = [eng.stage_batch(images) for _ in range(2)]
        import functools

        dispatch = functools.partial(eng.detect_multi_batch_async,
                                     instances=inst)
        eng.detect_multi_resolve(dispatch(pools[0]))  # warm
        t0 = time.perf_counter()
        handles = [dispatch(pools[i % 2]) for i in range(rounds)]
        for h in handles:
            eng.detect_multi_resolve(h)
        return (time.perf_counter() - t0) / rounds / batch * 1e6

    cases = [(n, i) for i in (1, 2) for n in ("compact", "padded")]
    best = {c: 1e9 for c in cases}
    for _ in range(4):
        for n, i in cases:
            best[(n, i)] = min(best[(n, i)], measure(engines[n], i))
    print(f"\n  {'case':22s} {'us/img':>8s} {'FPS':>10s}")
    for (n, i), v in best.items():
        print(f"  {n}, instances={i:<6d} {v:8.3f} {1e6 / v:>10,.0f}")


if __name__ == "__main__":
    main()
