"""bench.py's parity gate must gate the path it measures.

Round-1 verdict finding: the old gate validated the XLA path while the
benchmark measured the megakernel — a silent Mosaic miscompile in the
measured path would have published a wrong-answer FPS. These tests prove the
rebuilt gate (a) passes on the clean production path and (b) trips on a
deliberate corruption of the megakernel output, the fused bin pooling, and
the head."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench


@pytest.fixture(scope="module")
def setup():
    import jax.numpy as jnp

    from tpu_cnn.models.cnn import DEFAULT_SHIFTS
    from tpu_cnn.ops import detect_head, pallas_poly
    from tpu_cnn.utils import artifacts as art
    from tpu_cnn.utils.paths import default_artifacts

    art_dir = default_artifacts()
    bundle = art.load_bundle(art_dir)
    kernels = [jnp.asarray(k) for k in bundle.kernels]
    fc_w = jnp.asarray(bundle.fc_weight)
    fc_b = jnp.asarray(bundle.fc_bias)
    shifts = jnp.asarray(DEFAULT_SHIFTS, jnp.int32)

    def production_path(images):
        feats, pooled = pallas_poly.cnn_forward_polyphase_pallas(
            images, kernels, shifts, with_bins=True
        )
        pred, conf, probs, bbox = detect_head.detect_with_pooled(
            feats, pooled, fc_w, fc_b, 128
        )
        return feats, pooled, pred, conf, probs, bbox

    gate = jnp.asarray(bench.load_gate_images(art_dir, n_real=2, n_noise=2))
    return production_path, bundle, gate


def test_gate_passes_clean(setup):
    production_path, bundle, gate = setup
    assert bench.run_parity_gate(production_path, bundle, gate) is None


def test_gate_trips_on_feature_corruption(setup):
    production_path, bundle, gate = setup

    def corrupted(images):
        feats, pooled, pred, conf, probs, bbox = production_path(images)
        feats = feats.at[0, 0, 0].set(feats[0, 0, 0] ^ 1)  # one flipped bit
        return feats, pooled, pred, conf, probs, bbox

    err = bench.run_parity_gate(corrupted, bundle, gate)
    assert err is not None and "features" in err


def test_gate_trips_on_bin_corruption(setup):
    production_path, bundle, gate = setup

    def corrupted(images):
        feats, pooled, pred, conf, probs, bbox = production_path(images)
        # smallest real corruption: one bin off by one feature count
        pooled = pooled.at[0, 0].add(1.0 / 4080.0)
        return feats, pooled, pred, conf, probs, bbox

    err = bench.run_parity_gate(corrupted, bundle, gate)
    assert err is not None and "bin pooling" in err


def test_gate_trips_on_head_corruption(setup):
    production_path, bundle, gate = setup

    def corrupted(images):
        feats, pooled, pred, conf, probs, bbox = production_path(images)
        return feats, pooled, (pred + 1) % 6, conf, probs, bbox

    err = bench.run_parity_gate(corrupted, bundle, gate)
    assert err is not None and "predictions" in err


def test_gate_trips_on_bbox_corruption(setup):
    production_path, bundle, gate = setup

    def corrupted(images):
        feats, pooled, pred, conf, probs, bbox = production_path(images)
        return feats, pooled, pred, conf, probs, bbox + 8

    err = bench.run_parity_gate(corrupted, bundle, gate)
    assert err is not None and "bbox" in err
