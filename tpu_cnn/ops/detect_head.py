"""On-device detection head: spatial-bin classifier + CAM bounding box.

In the reference the head runs on the ARM CPU after an 18 ms MMIO feature
readback (``software/pynq_inference.py:292-408``, vectorised variants
``software/realtime_detect.py:68-116``). Here the whole head is fused into
the same XLA graph as the CNN, so only (pred, conf, probs, bbox) — a few
dozen bytes — ever crosses the device->host boundary. This is the TPU-native
answer to the reference's dominant bottleneck (readback ~18 ms vs conv 6.8 ms,
``README.md:202``).

All functions are batched and jittable.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

SATURATION_MEAN = 250.0  # channels with mean > 250 carry no spatial info
CAM_THRESHOLD_FLOOR = 0.25  # software/realtime_detect.py:109
CAM_PERCENTILE = 70.0
# Centroid box profile (box_mode="centroid"): box = CAM mass centroid
# +- K * mass stddev. Calibrated on a synthetic calibration split
# (scripts/probe_boxes.py, seed 77) and validated held-out: mean IoU 0.407
# vs 0.355 for the reference threshold box (full-frame trivial 0.308).
# The host twin (head/cam.py) owns the constant.
from tpu_cnn.head.cam import CAM_CENTROID_K  # noqa: E402


def _fc_logits(pooled: jax.Array, fc_weight: jax.Array, fc_bias: jax.Array):
    """Classifier logits in true f32. TPU f32 matmuls default to bf16 MXU
    passes (~1e-3 drift vs the host head twin, enough to flip near-tie
    predictions); precision='highest' keeps this tiny (B, D) x (D, C)
    matmul bit-stable against the numpy oracle at negligible cost."""
    return (
        jnp.dot(pooled, fc_weight.T, precision=jax.lax.Precision.HIGHEST)
        + fc_bias
    )


def bin_pool(features: jax.Array, grid: int = 4) -> jax.Array:
    """(B, C, S*S) uint8 -> (B, C*grid*grid) float32 spatial-bin means / 255.

    Mirrors ``software/realtime_detect.py:68-82`` / ``retrain_classifier.py:188-207``:
    4x4 grid of bin means over the 16x16 map, flattened (ch-major), /255.
    """
    b, c, ss = features.shape
    s = int(round(ss**0.5))
    npx = s // grid
    fm = features.astype(jnp.float32).reshape(b, c, grid, npx, grid, npx)
    pooled = fm.mean(axis=(3, 5))  # (B, C, grid, grid)
    return pooled.reshape(b, c * grid * grid) / 255.0


def gap_pool(features: jax.Array) -> jax.Array:
    """(B, C, S*S) uint8 -> (B, C) global average pool, [0, 255] scale.

    Matches the shipped (C, 64) head's training-time features
    (``training/train_cnn.py:164``: adaptive_avg_pool of [0,255] maps, no /255).
    """
    return features.astype(jnp.float32).mean(axis=2)


def _classify_pooled(
    pooled: jax.Array, fc_weight: jax.Array, fc_bias: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Classifier epilogue on pooled features — the single definition the
    single-box, multi-box, and feature-path heads all share."""
    logits = _fc_logits(pooled, fc_weight, fc_bias)
    probs = jax.nn.softmax(logits, axis=-1)
    pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    conf = jnp.take_along_axis(probs, pred[:, None], axis=1)[:, 0]
    return pred, conf, probs


def classify(
    features: jax.Array,  # (B, C, S*S) uint8
    fc_weight: jax.Array,  # (num_classes, D) float32
    fc_bias: jax.Array,  # (num_classes,) float32
    head_mode: str = "bins",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (pred (B,) int32, conf (B,) f32, probs (B, num_classes) f32)."""
    pooled = bin_pool(features) if head_mode == "bins" else gap_pool(features)
    return _classify_pooled(pooled, fc_weight, fc_bias)


def cam_bbox(
    features: jax.Array,  # (B, C, S*S) uint8
    class_idx: jax.Array,  # (B,) int32
    fc_weight: jax.Array,  # (num_classes, C*16) float32 — bins head only
    img_size: int = 128,
    box_mode: str = "ref",
) -> jax.Array:
    """Batched CAM bounding boxes, (B, 4) int32 as (x1, y1, x2, y2) in image px.

    box_mode="ref" matches the vectorised reference head
    ``software/realtime_detect.py:85-116``: per-bin class weights broadcast
    over each 4x4 bin, saturated channels (mean > 250) masked out, ReLU +
    max-normalise, threshold at max(percentile70, 0.25), extremal rows/cols
    scaled by S->img_size. box_mode="centroid" is the tuned profile
    (see CAM_CENTROID_K).
    """
    return cam_bbox_f32(
        features.astype(jnp.float32), class_idx, fc_weight, img_size,
        box_mode=box_mode,
    )


def cam_bbox_f32(
    features: jax.Array,  # (B, C, S*S) float32 (integer-valued, 0..255)
    class_idx: jax.Array,  # (B,) int32
    fc_weight: jax.Array,  # (num_classes, C*16) float32 — bins head only
    img_size: int = 128,
    box_mode: str = "ref",
) -> jax.Array:
    """CAM bbox core on f32 features — the PRODUCTION formulation.

    Two TPU-specific choices, each measured on hardware
    (scripts/profile_head.py, scripts/probe_cam.py):

    * The channel reduction runs as a batched MXU matmul producing one CAM
      per BIN column — ``camfull[b, j, p] = sum_c w[b, c, j] * fm[b, c, p]``
      — then a constant per-lane bin mask selects ``j = bin(p)``. An XLA
      middle-axis reduce of (B, 64, 256) costs ~0.8 us/img on the VPU;
      the matmul form costs ~0.09 (234k -> 287k FPS end-to-end).
    * The features arrive as the megakernel's in-kernel feature twin
      (``with_twin``, bf16 — exact for 0..255, upcast to f32 by the
      caller), sparing the u8->f32 feature relayout.

    Same products, same reduction set as the reference CAM
    (``software/realtime_detect.py:85-116``) — only the evaluation order
    differs (f32 round-off at ulp scale; bbox-parity vs the host twin is
    asserted on real test images by bench.py's gate)."""
    b, _, ss = features.shape
    s = int(round(ss**0.5))
    cam = _normalized_cam_f32(features, class_idx, fc_weight)
    if box_mode == "centroid":
        return _bbox_from_cam_centroid(cam.reshape(b, s, s), img_size)
    return _bbox_from_cam(cam.reshape(b, s, s), img_size)


def _normalized_cam_f32(
    features: jax.Array,  # (B, C, S*S) float32
    class_idx: jax.Array,  # (B,) int32
    fc_weight: jax.Array,  # (num_classes, C*16) float32
) -> jax.Array:
    """The normalised (B, S*S) CAM — the shared core of the single- and
    multi-class box heads (see :func:`cam_bbox_f32` for the formulation
    rationale and hardware measurements)."""
    b, c, ss = features.shape
    s = int(round(ss**0.5))
    grid = 4
    npx = s // grid

    valid = (features.mean(axis=2) <= SATURATION_MEAN).astype(jnp.float32)
    w = fc_weight[class_idx].reshape(b, c, grid * grid) * valid[:, :, None]
    wT = jnp.transpose(w, (0, 2, 1))  # (B, J, C)
    camfull = jax.lax.dot_general(
        wT, features, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, J, S*S)
    p = jnp.arange(ss)
    binof = (p // s // npx) * grid + (p % s) // npx  # (S*S,)
    sel = (binof[None, :] == jnp.arange(grid * grid)[:, None]).astype(
        jnp.float32
    )  # (J, S*S)
    cam = (camfull * sel[None]).sum(axis=1)  # (B, S*S)
    cam = jnp.maximum(cam, 0.0)
    cam_max = cam.max(axis=1, keepdims=True)
    return jnp.where(cam_max > 0, cam / jnp.maximum(cam_max, 1e-30), cam)


def _multi_cam_stack(
    features: jax.Array,  # (B, C, S*S) float32
    fc_weight: jax.Array,  # (num_classes, C*16) float32
) -> jax.Array:
    """Every class's normalised CAM, stacked: (B*K, s, s).

    The single shared producer for the multi-box AND instance heads —
    computing it twice was the measured dominant cost of instance mode
    (the K f32 CAM matmuls, ~0.7 us/img each pass, docs/DESIGN.md). Each
    class row keeps the exact single-path dot shapes of
    :func:`_normalized_cam_f32`, so per-class box parity with the host
    twin is unchanged."""
    b, _, ss = features.shape
    s = int(round(ss**0.5))
    num_classes = fc_weight.shape[0]
    cams = jnp.stack([
        _normalized_cam_f32(features, jnp.full((b,), k, jnp.int32), fc_weight)
        for k in range(num_classes)
    ], axis=1)  # (B, K, S*S)
    return cams.reshape(b * num_classes, s, s)


def _cam_threshold(flat: jax.Array) -> jax.Array:
    """(N, S*S) normalised CAMs -> (N,) box threshold: percentile-70 with
    the 0.25 floor (``software/realtime_detect.py:104-109``). The single
    shared threshold the mask-box and instance heads both consume."""
    return jnp.maximum(
        _percentile_topk(flat, CAM_PERCENTILE), CAM_THRESHOLD_FLOOR
    )


def _percentile_topk(x: jax.Array, q_pct: float) -> jax.Array:
    """Linear-interpolated percentile via the two order statistics it needs,
    from ``lax.top_k`` instead of a full sort. For the CAM's (B, 256) rows
    on TPU this is measurably cheaper than ``jnp.percentile`` (+2.7%
    end-to-end, scripts/probe_percentile.py) and uses the SAME lerp
    ``a + (b - a)·frac`` as the jnp.percentile call it replaced. The
    interpolation fraction here is host f64 (exactly 0.5 for a 256-element
    row) while jnp.percentile derived it on device in f32 (~0.4999969), so
    thresholds may differ by a few ulp from the old device path — in ties a
    ``cam > thr`` comparison could flip. The equivalence to the HOST twin
    (np.percentile, which this actually matches more closely) is
    gate-verified, not bit-mathematical: bench.py's parity gate and the
    ``-m tpu`` hardware lane assert box equality on real images for every
    production geometry."""
    n = x.shape[-1]
    q = q_pct / 100.0 * (n - 1)
    lo, hi = math.floor(q), math.ceil(q)
    tk = jax.lax.top_k(x, n - lo)[0]  # descending top (n - lo) values
    a_lo = tk[..., n - 1 - lo]  # ascending order statistic [lo]
    if hi == lo:
        return a_lo
    a_hi = tk[..., n - 1 - hi]
    return a_lo + (a_hi - a_lo) * jnp.float32(q - lo)


def _bbox_from_cam(
    cam: jax.Array, img_size: int, thr: jax.Array | None = None
) -> jax.Array:
    """(B, s, s) normalised CAM -> (B, 4) int32 boxes: percentile-70
    threshold with the 0.25 floor, extremal rows/cols, grid->image scaling
    (``software/realtime_detect.py:104-116``). Pass a precomputed ``thr``
    (:func:`_cam_threshold`) to share it with the instance head."""
    b, s, _ = cam.shape
    ss = s * s
    scale = img_size // s
    if thr is None:
        thr = _cam_threshold(cam.reshape(b, ss))  # (B,)
    mask = cam > thr[:, None, None]  # (B, s, s)

    rows = mask.any(axis=2)  # (B, s)
    cols = mask.any(axis=1)  # (B, s)
    any_mask = rows.any(axis=1)

    def first_true(m):  # (B, s) -> (B,)
        return jnp.argmax(m, axis=1).astype(jnp.int32)

    def last_true(m):
        return (m.shape[1] - 1 - jnp.argmax(m[:, ::-1], axis=1)).astype(jnp.int32)

    r1, r2 = first_true(rows), last_true(rows)
    c1, c2 = first_true(cols), last_true(cols)

    x1 = c1 * scale
    y1 = r1 * scale
    x2 = jnp.minimum(img_size - 1, (c2 + 1) * scale)
    y2 = jnp.minimum(img_size - 1, (r2 + 1) * scale)
    bbox = jnp.stack([x1, y1, x2, y2], axis=1)
    full = jnp.array([0, 0, img_size - 1, img_size - 1], dtype=jnp.int32)
    return jnp.where(any_mask[:, None], bbox, full[None, :]).astype(jnp.int32)


def _bbox_from_cam_centroid(
    cam: jax.Array, img_size: int, k: float = CAM_CENTROID_K
) -> jax.Array:
    """(B, s, s) CAM -> (B, 4) int32 boxes as mass centroid +- k*stddev.

    Sort-free alternative to the percentile threshold: treat the ReLU'd CAM
    as a mass distribution, box = [centroid - k*sigma, centroid + k*sigma]
    per axis, scaled to image pixels. Scale-invariant in the CAM, so it
    shares the normalised CAM with the reference path. Falls back to the
    full frame when the CAM is all-zero (the reference's no-mask fallback,
    ``software/realtime_detect.py:106-107``).
    """
    b, s, _ = cam.shape
    scale = img_size // s
    coords = jnp.arange(s, dtype=jnp.float32)
    tot = cam.sum(axis=(1, 2))  # (B,)
    safe_tot = jnp.maximum(tot, 1e-9)
    row_mass = cam.sum(axis=2)  # (B, s) — mass per y
    col_mass = cam.sum(axis=1)  # (B, s) — mass per x
    cy = (row_mass * coords).sum(axis=1) / safe_tot
    cx = (col_mass * coords).sum(axis=1) / safe_tot
    vy = (row_mass * (coords[None, :] - cy[:, None]) ** 2).sum(axis=1) / safe_tot
    vx = (col_mass * (coords[None, :] - cx[:, None]) ** 2).sum(axis=1) / safe_tot
    sy, sx = jnp.sqrt(vy), jnp.sqrt(vx)

    eps = 1e-6
    x1 = jnp.floor(jnp.maximum(0.0, cx - k * sx) * scale)
    y1 = jnp.floor(jnp.maximum(0.0, cy - k * sy) * scale)
    x2 = jnp.floor(jnp.minimum(s - eps, cx + k * sx + 1.0) * scale)
    y2 = jnp.floor(jnp.minimum(s - eps, cy + k * sy + 1.0) * scale)
    x2 = jnp.minimum(img_size - 1, x2)
    y2 = jnp.minimum(img_size - 1, y2)
    bbox = jnp.stack([x1, y1, x2, y2], axis=1).astype(jnp.int32)
    full = jnp.array([0, 0, img_size - 1, img_size - 1], dtype=jnp.int32)
    return jnp.where((tot > 0)[:, None], bbox, full[None, :])


def cam_bbox_multi_f32(
    features: jax.Array,  # (B, C, S*S) float32 (integer-valued, 0..255)
    fc_weight: jax.Array,  # (num_classes, C*16) float32 — bins head only
    img_size: int = 128,
    box_mode: str = "ref",
) -> jax.Array:
    """Per-class CAM boxes for EVERY class: (B, num_classes, 4) int32.

    The reference head only ever boxes the argmax class
    (``software/realtime_detect.py:85-116``); this is the multi-object
    extension — each class's own CAM, thresholded with the same box
    profile, so one frame can report several objects. Implemented as a
    static unroll over the (small, static) class count reusing the exact
    production single-class formulation, so row ``k`` of the output is
    the same computation :func:`cam_bbox_f32` runs when the argmax is
    ``k`` — box parity with the host twin holds per class for free.

    The per-class CAMs keep the single-path dot shapes (bit-identical
    values), but the percentile/box tail runs ONCE over the stacked
    (B*K, s, s) CAMs instead of K times (box values identical by direct
    comparison; one top_k over 6x rows replaces six top_k dispatches).
    Measured on chip at batch 1536: the whole multi head adds ~0.6-0.7
    us/img to single-box detect (3.9-4.0 -> 4.6 us/img), dominated by
    the K f32 CAM matmuls — the tail share is neutral-to-small within
    the relay's variance band.
    """
    b = features.shape[0]
    num_classes = fc_weight.shape[0]
    stacked = _multi_cam_stack(features, fc_weight)
    if box_mode == "centroid":
        boxes = _bbox_from_cam_centroid(stacked, img_size)
    else:
        boxes = _bbox_from_cam(stacked, img_size)
    return boxes.reshape(b, num_classes, 4)


def _multi_head_shared(
    f32: jax.Array,  # (B, C, S*S) float32 features
    cam_w: jax.Array,  # (num_classes, C*16) float32
    img_size: int,
    box_mode: str,
    instances: int,
):
    """Multi-box + instance outputs from ONE shared CAM stack and ONE
    shared percentile threshold. ``detect_multi_with_pooled`` previously
    called :func:`cam_bbox_multi_f32` and :func:`cam_instances_f32` back
    to back, each rebuilding the identical (B*K) normalised CAM stack (the
    measured dominant cost of the multi head — the K f32 CAM matmuls) and
    recomputing the identical percentile-70 threshold. Here both heads
    consume the same ``stacked``/``thr``, so instance mode pays the CAM
    matmuls and the top_k percentile exactly once. Outputs are bit-equal
    to the two-call formulation (same dot shapes, same threshold values).

    Returns ``boxes (B, K, 4)`` and, when ``instances > 1``, additionally
    ``(inst_boxes (B, K, I, 4), inst_counts (B, K, I))``.
    """
    b = f32.shape[0]
    num_classes = cam_w.shape[0]
    stacked = _multi_cam_stack(f32, cam_w)  # (B*K, s, s)
    n, s, _ = stacked.shape
    thr = _cam_threshold(stacked.reshape(n, s * s))  # (B*K,)
    if box_mode == "centroid":
        boxes = _bbox_from_cam_centroid(stacked, img_size)
    else:
        boxes = _bbox_from_cam(stacked, img_size, thr)
    boxes = boxes.reshape(b, num_classes, 4)
    if instances <= 1:
        return (boxes,)
    inst_boxes, inst_counts = _instances_from_cam(
        stacked, img_size, instances, thr
    )
    return (
        boxes,
        inst_boxes.reshape(b, num_classes, instances, 4),
        inst_counts.reshape(b, num_classes, instances),
    )


def _connected_labels(mask: jax.Array) -> jax.Array:
    """4-connected component labels of (N, s, s) boolean masks.

    Each masked pixel's label converges to the MINIMUM flat index of its
    component (row-major); background pixels carry the sentinel ``s*s``.
    Pure XLA min-label propagation: a ``lax.while_loop`` to the global
    fixed point (bounded by the longest in-component path; CAM threshold
    masks are compact blobs, so convergence takes O(blob diameter)
    iterations of 4 shifted ``min`` ops on the whole batch). Deterministic
    by construction — the host twin (``head.cam.connected_labels_np``)
    produces identical integer labels from an identical mask, which is
    what makes instance selection exactly reproducible across device and
    host (the same property the threshold-box parity relies on).
    """
    n, s, _ = mask.shape
    sent = jnp.int32(s * s)
    init = jnp.where(
        mask, jnp.arange(s * s, dtype=jnp.int32).reshape(1, s, s), sent
    )

    def _step(lab):
        pad = [(0, 0), (0, 0), (0, 0)]

        def shift(arr, axis, direction):
            p = list(pad)
            sl = [slice(None)] * 3
            if direction > 0:
                p[axis] = (1, 0)
                sl[axis] = slice(0, s)
            else:
                p[axis] = (0, 1)
                sl[axis] = slice(1, s + 1)
            return jnp.pad(arr, p, constant_values=s * s)[tuple(sl)]

        m = jnp.minimum(
            jnp.minimum(shift(lab, 1, 1), shift(lab, 1, -1)),
            jnp.minimum(shift(lab, 2, 1), shift(lab, 2, -1)),
        )
        return jnp.where(mask, jnp.minimum(lab, m), sent)

    def _cond(carry):
        return carry[1]

    def _body(carry):
        lab, _ = carry
        new = _step(lab)
        return new, jnp.any(new != lab)

    labels, _ = jax.lax.while_loop(_cond, _body, (init, jnp.bool_(True)))
    return labels


def _grow_labels(labels: jax.Array, mask: jax.Array) -> jax.Array:
    """Layer-synchronous marker growth (the assignment step of a
    marker-based watershed): unlabeled ``mask`` pixels adopt the minimum
    label among their labeled 4-neighbours, one BFS layer per iteration,
    until no pixel changes. Labeled pixels are frozen, so each marker
    region grows outward at unit speed and a contested pixel (equidistant
    from two markers) deterministically takes the smaller label — the
    host twin (``head.cam``) applies the identical layer rule, which is
    what keeps instance assignment exactly reproducible."""
    n, s, _ = labels.shape
    sent = jnp.int32(s * s)

    def _step(lab):
        p = jnp.pad(lab, ((0, 0), (1, 1), (1, 1)), constant_values=s * s)
        nmin = jnp.minimum(
            jnp.minimum(p[:, :-2, 1:-1], p[:, 2:, 1:-1]),
            jnp.minimum(p[:, 1:-1, :-2], p[:, 1:-1, 2:]),
        )
        grow = mask & (lab == sent) & (nmin != sent)
        return jnp.where(grow, nmin, lab)

    def _cond(carry):
        return carry[1]

    def _body(carry):
        lab, _ = carry
        new = _step(lab)
        return new, jnp.any(new != lab)

    out, _ = jax.lax.while_loop(_cond, _body, (labels, jnp.bool_(True)))
    return out


# Core percentile for instance splitting: markers are the connected
# components of cam > percentile-88 (calibrated on same-class composite
# scenes, seed 77 — scripts/probe_instances.py: recall@0.3 0.50 vs 0.34
# for plain connected components, false boxes/frame 0.20 vs 1.77).
CAM_CORE_PERCENTILE = 88.0
# Components below this pixel count are noise, not instances — the default
# floor for instance_detections/eval (same calibration).
INSTANCE_MIN_PIXELS = 6
# Relative floor: an instance must be at least this fraction of the class's
# LARGEST instance. Suppresses over-splitting of single objects (a second
# CAM peak on one object is much smaller than the object's main region)
# while keeping genuine same-size pairs (scripts/probe_instances.py).
INSTANCE_MIN_FRAC = 0.25


def _component_stats(
    labels: jax.Array,  # (N, P) int32 component labels, background = P
    max_instances: int,
) -> tuple[jax.Array, jax.Array]:
    """Top-``max_instances`` component labels and pixel counts per row,
    ranked by the exact integer key ``count * 1024 + (1023 - label)``
    (size-desc, then top-left-first). Returns (labels (N, I) int32 — -1 for
    absent slots, counts (N, I) int32 — 0 for absent).

    Counts come from run lengths of the per-row SORTED labels (first/last
    occurrence via forward cummax / reverse cummin over the run-boundary
    positions) — O(P log P) work per row instead of the O(P * L) one-hot
    count reduce; background-sentinel runs are excluded at the key. The key
    stays exact in int32 (count <= 256, label <= 1023), so the selection is
    bitwise-identical to the host twin's sorted-by-key ranking
    (``head.cam._instances_from_cam_np``)."""
    n, p = labels.shape
    if p > 1024:
        # the int32 packing key encodes the label as (1023 - label):
        # a CAM larger than 32x32 would silently corrupt labels here
        raise ValueError(
            f"_component_stats key packing supports at most 1024 pixels "
            f"(CAM <= 32x32); got {p}"
        )
    sent = jnp.int32(p)
    r = jnp.sort(labels, axis=1)  # ascending; background sorts last
    pos = jnp.arange(p, dtype=jnp.int32)[None, :]
    prev = jnp.concatenate(
        [jnp.full((n, 1), -1, jnp.int32), r[:, :-1]], axis=1
    )
    nxt = jnp.concatenate(
        [r[:, 1:], jnp.full((n, 1), -1, jnp.int32)], axis=1
    )
    first = jax.lax.cummax(jnp.where(r != prev, pos, -1), axis=1)
    last = jax.lax.cummin(jnp.where(r != nxt, pos, p), axis=1, reverse=True)
    runlen = last - first + 1
    key = jnp.where(
        (r != prev) & (r != sent), runlen * 1024 + (1023 - r), 0
    )
    keyvals, _ = jax.lax.top_k(key, max_instances)  # (N, I)
    cnt = keyvals // 1024
    lab = jnp.where(cnt > 0, 1023 - (keyvals % 1024), -1)
    return lab, cnt


def _instances_from_cam(
    cam: jax.Array,  # (N, s, s) normalised CAM
    img_size: int,
    max_instances: int,
    thr: jax.Array | None = None,  # precomputed _cam_threshold (N,)
) -> tuple[jax.Array, jax.Array]:
    """Marker-based watershed instance boxes from the SAME threshold mask
    the single-box head uses: (N, I, 4) int32 boxes + (N, I) int32 pixel
    counts, instances ordered by size (desc) with a smallest-min-index
    tie-break. ``counts[i] == 0`` marks an absent instance (its box slot
    holds the full-frame fallback, mirroring the empty-mask behaviour of
    :func:`_bbox_from_cam`).

    Two objects of the same class usually merge into ONE component of the
    percentile-70 mask (the 16x16 CAM is coarse), so plain connected
    components under-split; markers from the higher
    ``CAM_CORE_PERCENTILE`` core mask recover each object's CAM peak and
    :func:`_grow_labels` assigns the rest of the mask to the nearest
    marker. Component ranking uses run-length counts over the sorted
    labels (:func:`_component_stats`) and the exact integer key
    ``count * 1024 + (1023 - label)``, so the selection (unlike an f32
    mass ranking) is bitwise-deterministic and identical to the host
    twin's; box extents are masked reduces over only the selected
    instances (O(I*P))."""
    n, s, _ = cam.shape
    ss = s * s
    scale = img_size // s
    flat = cam.reshape(n, ss)
    if thr is None:
        thr = _cam_threshold(flat)
    mask = cam > thr[:, None, None]
    core_thr = jnp.maximum(_percentile_topk(flat, CAM_CORE_PERCENTILE), thr)
    cores = cam > core_thr[:, None, None]
    # A plateau CAM (constant over a large active region) can push the
    # core threshold to the maximum, leaving no cores at all — degrade
    # those samples to plain connected components of the mask.
    no_core = ~jnp.any(cores, axis=(1, 2), keepdims=True)
    cores = jnp.where(no_core, mask, cores)

    labels = _grow_labels(_connected_labels(cores), mask).reshape(n, ss)
    lab_i, cnt_i = _component_stats(labels, max_instances)  # (N, I) each
    # Per-SELECTED-instance masked reduces — O(I*P), vs the O(P*L) virtual
    # one-hot this replaced (measured 2x on the full instances path; exact
    # same ranking key, so outputs are bit-identical).
    sel = labels[:, None, :] == lab_i[:, :, None]  # (N, I, P)
    pix = jnp.arange(ss, dtype=jnp.int32)
    rows = (pix // s)[None, None, :]
    cols = (pix % s)[None, None, :]
    big = jnp.int32(s)
    rmin = jnp.min(jnp.where(sel, rows, big), axis=2)
    rmax = jnp.max(jnp.where(sel, rows, -1), axis=2)
    cmin = jnp.min(jnp.where(sel, cols, big), axis=2)
    cmax = jnp.max(jnp.where(sel, cols, -1), axis=2)

    x1 = cmin * scale
    y1 = rmin * scale
    x2 = jnp.minimum(img_size - 1, (cmax + 1) * scale)
    y2 = jnp.minimum(img_size - 1, (rmax + 1) * scale)
    boxes = jnp.stack([x1, y1, x2, y2], axis=2).astype(jnp.int32)
    full = jnp.array([0, 0, img_size - 1, img_size - 1], dtype=jnp.int32)
    boxes = jnp.where((cnt_i > 0)[:, :, None], boxes, full[None, None, :])
    return boxes, cnt_i


def cam_instances_f32(
    features: jax.Array,  # (B, C, S*S) float32 (integer-valued, 0..255)
    fc_weight: jax.Array,  # (num_classes, C*16) float32 — bins head only
    img_size: int = 128,
    max_instances: int = 2,
) -> tuple[jax.Array, jax.Array]:
    """Multi-INSTANCE boxes: up to ``max_instances`` connected components
    per class CAM. Returns (boxes (B, K, I, 4) int32, counts (B, K, I)
    int32; count 0 = absent).

    Beyond both the reference head (one argmax box,
    ``software/realtime_detect.py:85-116``) and the per-class ``--multi``
    mode: two objects of the SAME class in one frame become two separate
    components of that class's CAM threshold mask, and this head boxes
    each component — ``cam_bbox_multi_f32`` by construction merges them
    into one spanning box. Uses the identical normalised CAM and threshold
    as the single-box path, so instance 0 of the argmax class is always
    contained in (and usually equals) the production single box."""
    b = features.shape[0]
    num_classes = fc_weight.shape[0]
    stacked = _multi_cam_stack(features, fc_weight)
    boxes, counts = _instances_from_cam(stacked, img_size, max_instances)
    return (
        boxes.reshape(b, num_classes, max_instances, 4),
        counts.reshape(b, num_classes, max_instances),
    )


def multi_scores(
    pooled: jax.Array,  # (B, D) — the SAME pooled features the fc reads
    mw: jax.Array,  # (num_classes, D) float32 multi-label head weight
    mb: jax.Array,  # (num_classes,) float32 multi-label head bias
) -> jax.Array:
    """Per-class MULTI-LABEL presence scores: independent sigmoids over a
    learned (K, D) head on the classifier's own pooled features.

    Softmax probabilities sum to 1, so two confident objects structurally
    suppress each other — the measured cap on multi-object detection F1
    (scripts/probe_multilabel.py: flagship held-out F1 0.650 with
    calibrated softmax floors). Sigmoid scores don't compete; the head is
    fit by ``apps.calibrate_multi --fit-head`` on composite-scene dumps
    (the reference's adapt-the-head-to-real-features loop,
    ``software/retrain_classifier.py:24-124``, applied to the multi-object
    task) and ships as ``multi_head.npz``. One fused (D, K) matmul —
    epsilon beside the CAM stack. ``pred/conf/probs`` stay softmax: only
    the presence FILTER consumes these scores."""
    z = (
        jnp.dot(pooled, mw.T, precision=jax.lax.Precision.HIGHEST) + mb
    )
    return jax.nn.sigmoid(z)


def detect_multi_with_pooled(
    pooled: jax.Array,  # (B, C*16) f32 — kernel-fused bin pooling
    features_twin: jax.Array,  # kernel feature twin (bf16/f32)
    fc_weight: jax.Array,
    fc_bias: jax.Array,
    img_size: int = 128,
    box_mode: str = "ref",
    instances: int = 1,
    multi_head: tuple[jax.Array, jax.Array] | None = None,
):
    """Multi-object head on kernel-fused bins: classify + a CAM box per
    class. Returns (pred, conf, probs, boxes (B, K, 4)); with
    ``instances > 1`` additionally (inst_boxes (B, K, I, 4), inst_counts
    (B, K, I)) — per-component boxes from :func:`cam_instances_f32`; with
    ``multi_head`` additionally :func:`multi_scores` as the LAST output."""
    pred, conf, probs = _classify_pooled(pooled, fc_weight, fc_bias)
    f32 = features_twin.astype(jnp.float32)
    out = (pred, conf, probs) + _multi_head_shared(
        f32, fc_weight, img_size, box_mode, instances
    )
    if multi_head is not None:
        out += (multi_scores(pooled, *multi_head),)
    return out


def detect_multi(
    features: jax.Array,
    fc_weight: jax.Array,
    fc_bias: jax.Array,
    head_mode: str = "bins",
    img_size: int = 128,
    box_mode: str = "ref",
    instances: int = 1,
    multi_head: tuple[jax.Array, jax.Array] | None = None,
):
    """Multi-object fused classify + per-class boxes from u8 features.

    Returns (pred, conf, probs, boxes (B, K, 4)); with ``instances > 1``
    additionally (inst_boxes, inst_counts) like
    :func:`detect_multi_with_pooled`, and with ``multi_head`` the
    :func:`multi_scores` as the LAST output. With the 64-d GAP head the
    CAM has no spatial weights, so every class shares the unweighted
    activation-map box (same fallback as :func:`detect`).
    """
    pred, conf, probs = classify(features, fc_weight, fc_bias, head_mode)
    f32 = features.astype(jnp.float32)
    if head_mode == "bins":
        cam_w = fc_weight
    else:
        c = features.shape[1]
        cam_w = jnp.ones((fc_weight.shape[0], c * 16), dtype=jnp.float32)
    out = (pred, conf, probs) + _multi_head_shared(
        f32, cam_w, img_size, box_mode, instances
    )
    if multi_head is not None:
        pooled = bin_pool(features) if head_mode == "bins" else gap_pool(
            features)
        out += (multi_scores(pooled, *multi_head),)
    return out


def bbox_regress(
    pooled: jax.Array,  # (B, D) spatial-bin features (bin_pool scale)
    bbox_weight: jax.Array,  # (D+1, 4) — last row is the bias
    img_size: int = 128,
) -> jax.Array:
    """Learned box-regression head (box_mode="reg") — one fused (D, 4)
    matmul on the SAME pooled features the classifier reads. Host twin:
    ``head.bbox.bbox_regress_np``; trained by ``apps.train_bbox``
    (closed-form ridge). Held-out synthetic eval: mean IoU 0.71 vs 0.355
    for the reference CAM threshold box."""
    raw = (
        jnp.dot(pooled, bbox_weight[:-1], precision=jax.lax.Precision.HIGHEST)
        + bbox_weight[-1]
    )
    raw = jnp.clip(raw, 0.0, 1.0) * float(img_size - 1)
    x1 = jnp.minimum(raw[:, 0], raw[:, 2])
    x2 = jnp.maximum(raw[:, 0], raw[:, 2])
    y1 = jnp.minimum(raw[:, 1], raw[:, 3])
    y2 = jnp.maximum(raw[:, 1], raw[:, 3])
    return jnp.floor(jnp.stack([x1, y1, x2, y2], axis=1)).astype(jnp.int32)


def detect_with_pooled(
    features: jax.Array | None,  # (B, C, S*S) uint8 (CAM fallback); may be
    #                              None when features_twin is given or reg box
    pooled: jax.Array,  # (B, C*16) f32 — kernel-fused bin pooling
    fc_weight: jax.Array,
    fc_bias: jax.Array,
    img_size: int = 128,
    features_twin: jax.Array | None = None,  # kernel-emitted feature twin
    #                              (bf16 in production, f32 accepted)
    box_mode: str = "ref",
    bbox_weight: jax.Array | None = None,  # required for box_mode="reg"
):
    """Fused classify + bbox when the bin pooling already happened inside
    the conv megakernel (``pallas_poly`` with_bins). Pass the kernel's
    feature twin (``with_twin``, bf16) to skip the u8->f32 relayout in the
    CAM — it is upcast to f32 here, exactly (twin values are 0..255
    integers, exact in bf16), so the CAM math is unchanged; the u8
    ``features`` may then be omitted entirely (the megakernel's
    ``with_feats=False`` detect mode)."""
    pred, conf, probs = _classify_pooled(pooled, fc_weight, fc_bias)
    if box_mode == "reg":
        bbox = bbox_regress(pooled, bbox_weight, img_size)
    elif features_twin is not None:
        bbox = cam_bbox_f32(features_twin.astype(jnp.float32), pred,
                            fc_weight, img_size, box_mode=box_mode)
    elif features is not None:
        bbox = cam_bbox(features, pred, fc_weight, img_size,
                        box_mode=box_mode)
    else:
        raise ValueError("CAM box modes need features or features_twin")
    return pred, conf, probs, bbox


def detect(
    features: jax.Array,
    fc_weight: jax.Array,
    fc_bias: jax.Array,
    head_mode: str = "bins",
    img_size: int = 128,
    box_mode: str = "ref",
    bbox_weight: jax.Array | None = None,  # required for box_mode="reg"
):
    """Fused classify + bbox. Returns (pred, conf, probs, bbox)."""
    pred, conf, probs = classify(features, fc_weight, fc_bias, head_mode)
    if box_mode == "reg":
        bbox = bbox_regress(bin_pool(features), bbox_weight, img_size)
    elif head_mode == "bins":
        bbox = cam_bbox(features, pred, fc_weight, img_size,
                        box_mode=box_mode)
    else:
        # The 64-d GAP head has no spatial weights; CAM falls back to the
        # unweighted activation map (valid-channel mean).
        b = features.shape[0]
        c = features.shape[1]
        uniform_w = jnp.ones((fc_weight.shape[0], c * 16), dtype=jnp.float32)
        bbox = cam_bbox(features, pred, uniform_w, img_size,
                        box_mode=box_mode)
    return pred, conf, probs, bbox
