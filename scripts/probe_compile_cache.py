"""Measure the persistent-compile-cache win on the bench-scale megakernel.

The reference loads its prebuilt bitstream in ~1 s
(``software/pynq_inference.py:95-110``); our analogue is JAX's persistent
compilation cache (``tpu_cnn/utils/compile_cache.py``). This probe times the
first dispatch of the EXACT bench.py program (batch-1536 megakernel + fused
head) in a subprocess, twice against the same cache dir: the first run
compiles and populates, the second loads the serialized executable.

Run on the real TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_compile_cache.py

Measured 2026-08-18 on the v5e through the relay:
    cold (compile): 137.7 s      warm (cache hit): 1.6 s
"""

import os
import subprocess
import sys
import tempfile

CHILD = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
from tpu_cnn.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

import jax, jax.numpy as jnp
import numpy as np
from tpu_cnn.models.cnn import DEFAULT_SHIFTS
from tpu_cnn.ops import detect_head, pallas_poly
from tpu_cnn.utils import artifacts as art
from tpu_cnn.utils.paths import default_artifacts

bundle = art.load_bundle(default_artifacts())
kernels = [jnp.asarray(k) for k in bundle.kernels]
fc_w, fc_b = jnp.asarray(bundle.fc_weight), jnp.asarray(bundle.fc_bias)
shifts = jnp.asarray(DEFAULT_SHIFTS, jnp.int32)

@jax.jit
def detect(images):  # same program bench.py measures
    feats, pooled, feats_twin = pallas_poly.cnn_forward_polyphase_pallas(
        images, kernels, shifts, with_bins=True, with_twin=True
    )
    _, _, pred, conf, _, bbox = (feats, pooled) + detect_head.detect_with_pooled(
        feats, pooled, fc_w, fc_b, 128, features_twin=feats_twin
    )
    return pred, conf, bbox

x = jnp.zeros((1536, 128, 128), jnp.uint8)
jax.block_until_ready(x)
t0 = time.perf_counter()
jax.block_until_ready(detect(x))
print(f"first dispatch: {{time.perf_counter() - t0:.1f}} s")
"""


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory(prefix="tcnn_cache_probe") as cache:
        env = dict(os.environ, TPU_CNN_COMPILE_CACHE=cache)
        code = CHILD.format(repo=repo)
        for label in ("cold", "warm"):
            print(f"=== {label} (fresh process, cache dir {cache}) ===")
            subprocess.run([sys.executable, "-c", code], env=env, check=True)


if __name__ == "__main__":
    main()
