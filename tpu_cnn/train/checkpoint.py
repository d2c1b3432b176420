"""Training checkpoint/resume.

The reference keeps only a best-val state in RAM and a durable export bundle
(``training/train_cnn.py:296-301,336-354``) — no mid-run resume. Here every
epoch can snapshot params + optimizer state + RNG + progress to an .npz and
resume exactly, in addition to the same durable export bundle.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

import numpy as np

import jax


def _flatten(tree: Any, prefix: str, out: dict) -> None:
    leaves, treedef = jax.tree.flatten(tree)
    out[f"{prefix}__treedef"] = str(treedef)
    for i, leaf in enumerate(leaves):
        out[f"{prefix}__{i}"] = np.asarray(leaf)


def save_checkpoint(
    path: str,
    params: Any,
    opt_state: Any,
    epoch: int,
    best_acc: float,
    best_params: Any,
    extra: dict | None = None,
) -> None:
    """Atomic .npz snapshot (write-temp + rename)."""
    arrays: dict[str, np.ndarray] = {}
    _flatten(params, "params", arrays)
    _flatten(opt_state, "opt", arrays)
    _flatten(best_params, "best", arrays)
    meta = {"epoch": int(epoch), "best_acc": float(best_acc), **(extra or {})}
    arrays["__meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    os.close(fd)
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(path: str, params_like: Any, opt_state_like: Any):
    """Restore (params, opt_state, epoch, best_acc, best_params) using
    template pytrees for structure."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(data["__meta"]).decode())

    def unflatten(prefix, like):
        leaves, treedef = jax.tree.flatten(like)
        saved_treedef = str(data[f"{prefix}__treedef"])
        if saved_treedef != str(treedef):
            raise ValueError(
                f"checkpoint {path!r} [{prefix}] structure mismatch: a "
                f"template with the same leaf count but different pytree "
                f"structure would silently misassign arrays.\n"
                f"  saved:    {saved_treedef}\n  template: {treedef}"
            )
        restored = [
            np.asarray(data[f"{prefix}__{i}"]) for i in range(len(leaves))
        ]
        for i, (r, leaf) in enumerate(zip(restored, leaves)):
            want = np.shape(leaf)
            if r.shape != tuple(want):
                raise ValueError(
                    f"checkpoint {path!r} [{prefix} leaf {i}] shape "
                    f"mismatch: saved {r.shape}, template {tuple(want)} — "
                    f"layer_configs changed since this checkpoint was saved?"
                )
        return jax.tree.unflatten(treedef, restored)

    params = unflatten("params", params_like)
    opt_state = unflatten("opt", opt_state_like)
    best_params = unflatten("best", params_like)
    return params, opt_state, meta["epoch"], meta["best_acc"], best_params
