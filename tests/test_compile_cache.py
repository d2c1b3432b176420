"""Persistent XLA compile cache — env contract + idempotency.

The reference loads a prebuilt bitstream in ~1 s
(``software/pynq_inference.py:95-110``); our analogue is JAX's persistent
compilation cache (utils/compile_cache.py). These tests pin the opt-out env
contract and the first-caller-wins idempotency without touching the real
process-global jax config (monkeypatched recorder).
"""

import os

import pytest

from tpu_cnn.utils import compile_cache


@pytest.fixture()
def fresh(monkeypatch):
    """Reset module state and capture jax.config.update calls."""
    import jax

    monkeypatch.setattr(compile_cache, "_enabled_dir", None)
    calls = []
    monkeypatch.setattr(
        jax.config, "update", lambda k, v: calls.append((k, v))
    )
    return calls


@pytest.mark.parametrize("off", ["0", "off", "FALSE", "no"])
def test_env_opt_out(fresh, monkeypatch, off):
    monkeypatch.setenv("TPU_CNN_COMPILE_CACHE", off)
    assert compile_cache.enable_persistent_cache() is None
    assert fresh == []  # jax config untouched when disabled


def test_env_dir_override(fresh, monkeypatch, tmp_path):
    cache = tmp_path / "xla_cache"
    monkeypatch.setenv("TPU_CNN_COMPILE_CACHE", str(cache))
    got = compile_cache.enable_persistent_cache()
    assert got == str(cache)
    assert os.path.isdir(cache)
    keys = dict(fresh)
    assert keys["jax_compilation_cache_dir"] == str(cache)
    assert keys["jax_persistent_cache_min_compile_time_secs"] == 0
    assert keys["jax_persistent_cache_min_entry_size_bytes"] == 0


def test_explicit_path_beats_default(fresh, monkeypatch, tmp_path):
    monkeypatch.setenv("TPU_CNN_COMPILE_CACHE", "1")  # "on" -> default dir
    got = compile_cache.enable_persistent_cache(str(tmp_path / "d"))
    assert got == str(tmp_path / "d")


def test_idempotent_first_caller_wins(fresh, monkeypatch, tmp_path):
    monkeypatch.delenv("TPU_CNN_COMPILE_CACHE", raising=False)
    first = compile_cache.enable_persistent_cache(str(tmp_path / "a"))
    n_calls = len(fresh)
    second = compile_cache.enable_persistent_cache(str(tmp_path / "b"))
    assert second == first  # jax config is process-global: no re-point
    assert len(fresh) == n_calls


def test_cache_round_trip_in_subprocesses(tmp_path):
    """Functional: a second process reuses the first's serialized executable.

    Two fresh CPU-only interpreters jit the same program against one cache
    dir; the first populates it, the second must report a cache hit (the
    task-local JAX logger records 'Persistent compilation cache hit').
    """
    import subprocess
    import sys

    cache = tmp_path / "xla"
    child = (
        "import os, logging\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "logging.basicConfig(level=logging.DEBUG)\n"
        "import jax, jax.numpy as jnp\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from tpu_cnn.utils.compile_cache import enable_persistent_cache\n"
        "assert enable_persistent_cache() is not None\n"
        "print(jax.jit(lambda x: x * 2 + 1)(jnp.arange(8.0)))\n"
    )
    env = dict(
        os.environ,
        TPU_CNN_COMPILE_CACHE=str(cache),
        PYTHONPATH=os.path.dirname(os.path.dirname(__file__)),
    )
    first = subprocess.run([sys.executable, "-c", child], env=env,
                           capture_output=True, text=True)
    assert first.returncode == 0, first.stderr
    entries = os.listdir(cache)
    assert entries, "first process must populate the cache dir"
    second = subprocess.run([sys.executable, "-c", child], env=env,
                            capture_output=True, text=True)
    assert second.returncode == 0, second.stderr
    assert os.listdir(cache) == entries  # no recompile-and-rewrite
    assert "cache hit" in second.stderr.lower(), second.stderr[-2000:]


def test_engine_ctor_respects_opt_out(monkeypatch, stock_kernels, rng):
    """TPUEngine construction with the conftest's opt-out must not enable."""
    import numpy as np

    from tpu_cnn.engine.tpu import TPUEngine
    from tpu_cnn.models.cnn import FpgaCNN

    assert os.environ.get("TPU_CNN_COMPILE_CACHE") == "0"
    monkeypatch.setattr(compile_cache, "_enabled_dir", None)
    model = FpgaCNN(stock_kernels,
                    rng.randn(6, 1024).astype(np.float32),
                    np.zeros(6, np.float32))
    TPUEngine(model, backend="xla")
    assert compile_cache._enabled_dir is None
