"""Distributed (sharded) training checkpoints — orbax-backed.

The .npz path (``train/checkpoint.py``) gathers every leaf to one host
array, which is correct but defeats sharded training state: a ZeRO-1
optimizer shard (``train_cnn --zero1``) or model-sharded params would be
all-gathered on every save and re-sharded on restore. This module is the
production-shape alternative: ``orbax.checkpoint.CheckpointManager`` writes
each device's shards directly (TensorStore), asynchronously (training
continues while the previous epoch serialises), with retention
(``max_to_keep``) and atomic finalisation. Restore takes the live state as
template, so every leaf comes back with the template's sharding — sharded
state round-trips WITHOUT ever materialising the full array on one host.

Selected by the trainer when ``--checkpoint`` does not end in ``.npz``
(a directory path); the .npz format stays the default for single-host use.
The reference has no mid-run resume at all (its durable state is the export
bundle, ``training/train_cnn.py:336-354``) — both formats are beyond-
reference capability.
"""

from __future__ import annotations

from typing import Any


class ShardedCheckpointer:
    """Epoch-step checkpoint manager over a directory. Async saves, keeps
    the last ``max_to_keep`` epochs, restores with the template's
    shardings."""

    def __init__(self, path: str, *, max_to_keep: int = 2):
        import os

        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(path),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, epoch: int, params: Any, opt_state: Any,
             best_acc: float, best_params: Any) -> None:
        state = {
            "params": params,
            "opt": opt_state,
            "best": best_params,
            "meta": {"epoch": int(epoch), "best_acc": float(best_acc)},
        }
        self._mgr.save(int(epoch), args=self._ocp.args.StandardSave(state))

    def latest(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, params_like: Any, opt_state_like: Any):
        """(params, opt_state, epoch, best_acc, best_params) from the latest
        step; each leaf restored with the template leaf's sharding."""
        step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint steps in manager dir")
        tpl = {
            "params": params_like,
            "opt": opt_state_like,
            "best": params_like,
            "meta": {"epoch": 0, "best_acc": 0.0},
        }
        r = self._mgr.restore(step, args=self._ocp.args.StandardRestore(tpl))
        return (r["params"], r["opt"], r["meta"]["epoch"],
                r["meta"]["best_acc"], r["best"])

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
