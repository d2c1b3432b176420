"""Default artifact resolution.

Preference order: an explicit path > the repo's own pretrained bundle
(``artifacts/pretrained``) > the mounted upstream reference bundle (used for
parity testing when present). Keeps every CLI usable in a standalone checkout.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
PRETRAINED_DIR = os.path.join(_REPO_ROOT, "artifacts", "pretrained")
REFERENCE_DIR = "/root/reference/weights"


def default_artifacts() -> str:
    env = os.environ.get("TPU_CNN_ARTIFACTS")
    if env:
        return env
    for d in (PRETRAINED_DIR, REFERENCE_DIR):
        if os.path.exists(os.path.join(d, "weights.bin")):
            return d
    raise FileNotFoundError(
        "no artifact bundle found; run scripts/build_pretrained.py or set "
        "TPU_CNN_ARTIFACTS"
    )


def reference_weights() -> str | None:
    """The upstream weights.bin if mounted (parity tests), else None."""
    p = os.path.join(REFERENCE_DIR, "weights.bin")
    return p if os.path.exists(p) else None
