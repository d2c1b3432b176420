"""Environment + artifact self-check — first-line triage for deployments.

The reference's analogue is scattered: the PYNQ overlay probe and
``wait_done`` stuck-layer diagnostics (``pynq_inference.py:236-251``) and
the camera watchdog. This CLI concentrates the checks a production host
needs BEFORE serving traffic:

  1. runtime: platform, device list, process topology;
  2. artifacts: every shipped bundle loads (codec, head shapes, shifts);
  3. numerics: the host oracles agree bit-for-bit on a stimulus batch
     (numpy vs native C++ — catches a broken toolchain/build);
  4. device (when not --host-only): one tiny dispatch with a bounded
     wait, reporting round-trip latency — catches a wedged transport
     without hanging (the failure mode this harness's relay exhibits).

Exit code 0 = all checks pass; 1 = something needs attention.

Usage:
  python -m tpu_cnn.apps.doctor [--host-only] [--artifacts DIR ...]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

_DEFAULT_BUNDLES = (
    ("artifacts/pretrained", "lyr3-std"),
    ("artifacts/pretrained-lyr2", "lyr2-small"),
    ("artifacts/pretrained-lyr4", "lyr4-wide"),
    ("artifacts/realphoto/bundle-qat", "lyr3-std"),
)


def _bounded(fn, timeout: float):
    """Run ``fn`` on a DAEMON thread with a deadline: a wedged transport
    blocks jax calls (including first-touch backend init) indefinitely,
    and a non-daemon worker would then also block interpreter exit —
    triage must terminate either way (both hangs were reproduced against
    a wedged relay)."""
    import threading as _t

    out: dict = {}

    def run():
        try:
            out["value"] = fn()
        except Exception as e:  # noqa: BLE001 — surfaced to the caller
            out["error"] = e

    th = _t.Thread(target=run, daemon=True)
    th.start()
    th.join(timeout)
    if th.is_alive():
        raise TimeoutError(
            f"did not complete in {timeout:.0f}s — transport wedged or "
            "device unreachable"
        )
    if "error" in out:
        raise out["error"]
    return out.get("value")


def _check(name: str, fn, failures: list) -> None:
    t0 = time.perf_counter()
    try:
        detail = fn()
        dt = (time.perf_counter() - t0) * 1e3
        print(f"  [ok]   {name:34s} {detail or ''}  ({dt:.0f} ms)")
    except Exception as e:  # noqa: BLE001 — triage tool reports, not raises
        failures.append(name)
        print(f"  [FAIL] {name:34s} {type(e).__name__}: {e}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="tpu_cnn environment doctor")
    p.add_argument("--host-only", action="store_true",
                   help="skip the device dispatch check (no TPU contact)")
    p.add_argument("--artifacts", action="append", default=None,
                   metavar="DIR[:VARIANT]",
                   help="bundle dir(s) to audit (default: every shipped "
                        "bundle present in the repo)")
    p.add_argument("--device-timeout", type=float, default=60.0,
                   help="seconds to wait for the tiny device dispatch "
                        "before declaring the transport wedged")
    args = p.parse_args(argv)
    failures: list = []

    print("=" * 64)
    print("  TPU CNN DOCTOR")
    print("=" * 64)

    # 1. runtime — bounded: the FIRST jax.devices() call initialises the
    # backend, which is itself a transport touch that can wedge
    def runtime():
        def probe():
            import jax

            plat = jax.devices()[0].platform
            return (f"platform={plat} devices={jax.device_count()} "
                    f"processes={jax.process_count()}")

        return _bounded(probe, args.device_timeout)

    _check("runtime", runtime, failures)
    runtime_ok = not failures

    # 2. artifacts
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if args.artifacts:
        bundles = []
        for spec in args.artifacts:
            d, _, v = spec.partition(":")
            bundles.append((d, v or "lyr3-std"))
    else:
        bundles = [(os.path.join(repo, d), v) for d, v in _DEFAULT_BUNDLES
                   if os.path.isdir(os.path.join(repo, d))]

    from tpu_cnn.apps.common import load_model

    for d, variant in bundles:
        def audit(d=d, variant=variant):
            m = load_model(d, variant)
            return (f"{variant} head{tuple(m.fc_weight.shape)} "
                    f"shifts={list(map(int, m.shifts))}")

        _check(f"bundle {os.path.basename(d) or d}", audit, failures)

    # 3. host numerics: the two independent oracles must agree exactly
    def oracles():
        from tpu_cnn.engine.cpu_ref import CPURefEngine
        from tpu_cnn.models.cnn import LAYER_CONFIGS

        rs = np.random.RandomState(0)
        kernels = [rs.randint(-128, 128, (oc, ic, 3, 3)).astype(np.int8)
                   for ic, oc, _ in LAYER_CONFIGS]
        imgs = rs.randint(0, 256, (2, 128, 128)).astype(np.uint8)
        a = CPURefEngine(kernels, use_native=False).run_batch(imgs)
        native = CPURefEngine(kernels, use_native=True)
        if native.backend != "native-c++":
            return "numpy ok (native oracle unavailable — skipped)"
        b = native.run_batch(imgs)
        np.testing.assert_array_equal(a, b)
        return "numpy == native C++ (bit-exact)"

    _check("host oracles", oracles, failures)

    # 4. device transport (bounded — a wedged relay must not hang triage)
    if not args.host_only:
        def device():
            def tiny():
                import jax
                import jax.numpy as jnp

                t0 = time.perf_counter()
                v = float(jnp.asarray(np.ones((8, 8), np.float32)).sum())
                assert v == 64.0
                ms = (time.perf_counter() - t0) * 1e3
                return f"{jax.devices()[0].platform} round-trip {ms:.0f} ms"

            return _bounded(tiny, args.device_timeout)

        if runtime_ok:
            _check("device dispatch", device, failures)
        else:
            print("  [skip] device dispatch                 "
                  "(runtime probe already failed)")

    print("-" * 64)
    if failures:
        print(f"  {len(failures)} check(s) FAILED: {', '.join(failures)}")
        return 1
    print("  all checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
