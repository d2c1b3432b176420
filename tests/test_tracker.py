"""Tracker tests: SORT-style greedy IoU association for the streaming
surface (``head.tracker``) — identity stability, confirmation/age-out
lifecycle, class gating, same-class multi-object identity, and the
realtime --track integration."""

import numpy as np
import pytest

from tpu_cnn.head.tracker import Track, Tracker, _iou
from tpu_cnn.models.cnn import CLASS_NAMES
from tpu_cnn.utils import artifacts as art


@pytest.fixture(scope="module")
def artifact_dir(tmp_path_factory, stock_kernels):
    d = tmp_path_factory.mktemp("bundle")
    rs = np.random.RandomState(3)
    bundle = art.ArtifactBundle(
        kernels=stock_kernels,
        fc_weight=rs.randn(6, 1024).astype(np.float32) * 0.05,
        fc_bias=np.zeros(6, np.float32),
        class_names=list(CLASS_NAMES),
    )
    art.save_bundle(d, bundle)
    return str(d)


def test_iou_basic():
    assert _iou((0, 0, 10, 10), (0, 0, 10, 10)) == pytest.approx(1.0)
    assert _iou((0, 0, 10, 10), (20, 20, 30, 30)) == 0.0


def test_stable_id_across_jitter():
    tr = Tracker(min_hits=1)
    ids = []
    for i in range(6):
        # box drifts 2 px/frame with +-1 px jitter
        j = (-1) ** i
        box = (10 + 2 * i + j, 20 + j, 60 + 2 * i + j, 70 + j)
        tracks = tr.update([(3, 0.8, box)])
        assert len(tracks) == 1
        ids.append(tracks[0].id)
    assert set(ids) == {1}
    # smoothed box tracks the drift direction
    assert tr.tracks[0].box[0] > 10


def test_confirmation_suppresses_flicker():
    """min_hits=2: a single-frame detection is never shown."""
    tr = Tracker(min_hits=2)
    assert tr.update([(0, 0.9, (10, 10, 50, 50))]) == []  # tentative
    shown = tr.update([(0, 0.9, (11, 11, 51, 51))])
    assert len(shown) == 1 and shown[0].confirmed
    # a one-frame blip elsewhere: never confirmed, never shown
    out = tr.update([(0, 0.9, (12, 12, 52, 52)), (5, 0.4, (100, 0, 120, 20))])
    assert [t.cls for t in out] == [0]


def test_age_out_and_new_identity():
    tr = Tracker(min_hits=1, max_age=2)
    t0 = tr.update([(1, 0.9, (10, 10, 50, 50))])[0]
    for _ in range(3):  # unseen past max_age
        tr.update([])
    assert tr.tracks == []
    t1 = tr.update([(1, 0.9, (10, 10, 50, 50))])[0]
    assert t1.id != t0.id


def test_reappearance_within_max_age_keeps_id():
    tr = Tracker(min_hits=1, max_age=3)
    t0 = tr.update([(1, 0.9, (10, 10, 50, 50))])[0]
    tr.update([])  # missed one frame
    out = tr.update([(1, 0.9, (12, 12, 52, 52))])
    assert [t.id for t in out] == [t0.id]


def test_class_gating():
    """Same box, different class: a new identity, never a continuation."""
    tr = Tracker(min_hits=1)
    a = tr.update([(0, 0.9, (10, 10, 50, 50))])[0]
    out = tr.update([(1, 0.9, (10, 10, 50, 50))])
    assert {t.id for t in out} == {a.id + 1} or len(out) == 1
    assert all(t.cls == 1 for t in out if t.id != a.id)


def test_same_class_two_objects_keep_ids():
    """Two same-class objects (the --instances regime): greedy best-IoU
    keeps each identity on its own object, even as both move."""
    tr = Tracker(min_hits=1)
    left = (10, 10, 40, 40)
    right = (80, 10, 110, 40)
    first = tr.update([(2, 0.8, left), (2, 0.7, right)])
    id_left = next(t.id for t in first if t.box[0] < 50)
    id_right = next(t.id for t in first if t.box[0] > 50)
    for i in range(1, 5):
        d = 3 * i
        out = tr.update([
            (2, 0.8, (10 + d, 10, 40 + d, 40)),
            (2, 0.7, (80 - d, 10, 110 - d, 40)),
        ])
        assert len(out) == 2
        assert next(t.id for t in out if t.box[0] < 50) == id_left
        assert next(t.id for t in out if t.box[0] > 50) == id_right


def test_smoothing_math():
    tr = Tracker(min_hits=1, smooth=0.5)
    tr.update([(0, 1.0, (0, 0, 10, 10))])
    out = tr.update([(0, 0.0, (2, 2, 12, 12))])  # IoU 0.47, matches
    assert out[0].box == (1.0, 1.0, 11.0, 11.0)
    assert out[0].prob == pytest.approx(0.5)


def test_smooth_validation():
    with pytest.raises(ValueError):
        Tracker(smooth=0.0)


def test_track_ibox_rounds():
    t = Track(1, 0, (1.4, 1.6, 10.5, 10.49), 0.5)
    assert t.ibox() == (1, 2, 10, 10)  # banker's-free round-half-up-ish
    # (python round: 10.5 -> 10; the assertion pins the behaviour)


def test_realtime_track_smoke(artifact_dir, capsys):
    from tpu_cnn.apps import realtime

    realtime.main([
        "--artifacts", artifact_dir, "--mode", "cpu",
        "--source", "synthetic", "--frames", "10", "--no-serve",
        "--multi", "--track",
    ])
    out = capsys.readouterr().out
    assert "Done. 10 frames." in out


def test_realtime_track_requires_multi(artifact_dir):
    from tpu_cnn.apps import realtime

    with pytest.raises(SystemExit):
        realtime.main([
            "--artifacts", artifact_dir, "--mode", "cpu",
            "--source", "synthetic", "--frames", "2", "--no-serve",
            "--track",
        ])


def test_realtime_track_velocity_smoke(artifact_dir, capsys):
    from tpu_cnn.apps import realtime

    realtime.main([
        "--artifacts", artifact_dir, "--mode", "cpu",
        "--source", "synthetic", "--frames", "6", "--no-serve",
        "--multi", "--track", "--track-velocity",
    ])
    assert "Done. 6 frames." in capsys.readouterr().out


def test_realtime_track_velocity_requires_track(artifact_dir):
    from tpu_cnn.apps import realtime

    with pytest.raises(SystemExit):
        realtime.main([
            "--artifacts", artifact_dir, "--mode", "cpu",
            "--source", "synthetic", "--frames", "2", "--no-serve",
            "--multi", "--track-velocity",
        ])
