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


def default_artifacts(variant: str = "lyr3-std") -> str:
    """Resolve the default bundle dir, variant-aware: a non-flagship
    ``--variant`` (e.g. ``lyr4-wide``) prefers its own shipped bundle
    ``artifacts/pretrained-<family>`` when present, so CLIs work without
    an explicit ``--artifacts`` for every registry geometry (the
    reference's scripts likewise resolve their one weights dir
    implicitly, ``software/pynq_inference.py:24-31``)."""
    env = os.environ.get("TPU_CNN_ARTIFACTS")
    if env:
        return env
    dirs = []
    if variant and variant != "lyr3-std":
        dirs.append(os.path.join(_REPO_ROOT, "artifacts",
                                 "pretrained-" + variant.split("-")[0]))
    dirs += [PRETRAINED_DIR, REFERENCE_DIR]
    for d in dirs:
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
