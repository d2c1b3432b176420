"""Compile-on-demand for the native oracle, mirroring the reference's
self-compiling ctypes pattern (``software/realtime_detect.py:369-392``):
rebuild when the source is newer than the shared object, try the fast flag
set first, fall back to plain -O3.
"""

from __future__ import annotations

import os
import subprocess

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_THIS_DIR, "cnn_oracle.cpp")
SRCS = [SRC,
        os.path.join(_THIS_DIR, "frame_ring.cpp"),
        os.path.join(_THIS_DIR, "http_front.cpp")]


def _build_dir() -> str:
    d = os.environ.get(
        "TPU_CNN_BUILD_DIR", os.path.join(_THIS_DIR, "_build")
    )
    os.makedirs(d, exist_ok=True)
    return d


def shared_object_path() -> str:
    return os.path.join(_build_dir(), "cnn_oracle.so")


def ensure_built(verbose: bool = False) -> str:
    """Compile cnn_oracle.cpp if stale; return the .so path."""
    so = shared_object_path()
    if os.path.exists(so) and all(
        os.path.getmtime(so) >= os.path.getmtime(s) for s in SRCS
    ):
        return so

    extra = os.environ.get("TPU_CNN_EXTRA_CXXFLAGS", "").split()
    flag_sets = [
        ["-O3", "-march=native", "-fopenmp", "-pthread", *extra],
        ["-O3", "-fopenmp", "-pthread", *extra],
        ["-O3", "-pthread", *extra],
    ]
    last_err = ""
    for flags in flag_sets:
        cmd = ["g++", "-std=c++17", "-shared", "-fPIC", *flags, "-o", so,
               *SRCS]
        r = subprocess.run(cmd, capture_output=True, text=True)
        if r.returncode == 0:
            if verbose:
                print(f"built native oracle: {' '.join(flags)}")
            return so
        last_err = r.stderr
    raise RuntimeError(f"native oracle build failed:\n{last_err}")
