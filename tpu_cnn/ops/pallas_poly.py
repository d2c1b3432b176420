"""Polyphase megakernel: the ENTIRE network in one Pallas kernel, for real.

Port of the validated numpy blueprint in ``ops.polyphase_ref`` (see its
docstring for the derivation; tests/test_polyphase.py proves the algebra
bit-exact). The image lives as a 2^L x 2^L phase-blocked flat row with whole
256-lane phase blocks, which makes every constituent expressible in
Mosaic-legal primitives — all individually verified on hardware:

  taps      global lane rolls (one per (sy, sx) block-carry) + iota masks
  conv      one block-diagonal int8 MXU matmul per layer per batch tile
            (zero-point-shifted taps + exact int32 correction)
  pool      per-target-block 4-slice elementwise max
  layers    chained through VMEM scratch; activations never touch HBM

HBM per image: 16 KB in + 16 KB out. The phase split/merge are free XLA
transposes outside the kernel.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_cnn.ops.pallas_int8 import _interpret_default


# Batch tile. 4 is both the floor (Mosaic miscompiles int8 staging for
# tiles with < 4 sublane rows — docs/DESIGN.md) and the measured best
# (tb=8 probed 3.54 us/img vs 3.28 at tb=4 on v5e, docs/ROADMAP.md).
POLY_TB = 4

# Per-core VMEM is ~16 MiB; leave headroom for Mosaic's own temporaries.
POLY_VMEM_BUDGET = 14 * 1024 * 1024


def _poly_layer_params(layer_configs):
    """((ic, oc, in_size), ...) -> (layer_params [(ic, oc, g)], t)."""
    n_layers = len(layer_configs)
    s = layer_configs[0][2]
    g = 2**n_layers
    t = s // g
    params = []
    for ic, oc, _ in layer_configs:
        params.append((ic, oc, g))
        g //= 2
    return params, t


def poly_vmem_estimate(layer_params, t, tb: int = POLY_TB,
                       with_bins: bool = False,
                       with_twin: bool = False,
                       with_feats: bool = True) -> int:
    """Peak-VMEM model (bytes) for the megakernel at batch tile ``tb``.

    Persistent across the kernel body: the per-layer int8 tap scratches,
    the inter-layer activation rows, the (double-buffered) grid input and
    output blocks, and the packed weight matrices. Transients (widened
    input, int32 accumulator, pool temporaries) are live one layer at a
    time, so only the worst layer counts. The same budgeting discipline as
    ``pallas_int8._conv_mxu`` — the reference's per-layer geometry mux
    (``rtl/core/cnn_acc_top.v:45-54``) sized its BRAMs per layer the same
    way."""
    m = t * t
    xs = sum(9 * tb * ic * g * g * m for ic, oc, g in layer_params)
    refs = sum(tb * oc * (g // 2) ** 2 * m for ic, oc, g in layer_params[:-1])
    in_blk = 2 * tb * layer_params[0][0] * layer_params[0][2] ** 2 * m
    oc_last = layer_params[-1][1]
    out_blk = 2 * ((tb * oc_last * m if with_feats else 0)
                   + (tb * oc_last * 16 * 4 if with_bins else 0)
                   # bf16 feature twin (the twinf32 ablation doubles this;
                   # budget for production)
                   + (tb * oc_last * m * 2 if with_twin else 0))
    kmats = sum(tb * oc * 9 * tb * ic + 4 * tb * oc for ic, oc, g in layer_params)
    # transient peak: widened i32 input + i32 accumulator + one i32 pool temp
    peak = max(
        4 * tb * ic * g * g * m + 2 * 4 * tb * oc * g * g * m
        for ic, oc, g in layer_params
    )
    return xs + refs + in_blk + out_blk + kmats + peak


def poly_vmem_traffic(layer_configs, tb: int = POLY_TB):
    """Per-layer VMEM bytes MOVED per image by the megakernel — the traffic
    side of the roofline (``benchmark --roofline``; docs/DESIGN.md
    "Roofline"). Optimistic model: elementwise chains (widen, roll, select,
    cvt) are assumed register-fused, so each tap costs one 4B source read +
    one 1B int8 store; the MXU re-reads the staged int8 taps and writes the
    int32 accumulator; the pool re-reads the accumulator once and stores
    u8/4. Corrective boundary stores (~2/g of lanes) are ignored. Returns
    [{'layer', 'stage_bytes', 'mxu_bytes', 'pool_bytes', 'total'}] per
    image (tile totals / tb)."""
    layer_params, t = _poly_layer_params(layer_configs)
    m = t * t
    out = []
    for li, (ic, oc, g) in enumerate(layer_params):
        lanes = g * g * m
        rows_in = tb * ic
        rows_out = tb * oc
        widen = rows_in * lanes * (1 + 4)  # u8 read + i32 write, once
        stage = widen + 9 * rows_in * lanes * (4 + 1)  # roll read + i8 store
        mxu = 9 * rows_in * lanes * 1 + rows_out * lanes * 4
        pool = rows_out * lanes * 4 + rows_out * lanes // 4
        out.append({
            "layer": li, "ic": ic, "oc": oc, "g": g,
            "stage_bytes": stage // tb, "mxu_bytes": mxu // tb,
            "pool_bytes": pool // tb,
            "total": (stage + mxu + pool) // tb,
        })
    return out


def polyphase_supported(layer_configs, with_bins: bool = True,
                        with_twin: bool = False,
                        with_feats: bool = True,
                        tb: int = POLY_TB) -> bool:
    """True when the megakernel's working set fits VMEM for this geometry
    (e.g. lyr4-wide's tap scratches alone exceed it -> use hybrid). Pass
    the SAME with_bins/with_twin/with_feats the production call will use —
    the bf16 feature twin is a double-buffered output block the model must
    count (and a dropped u8 feature output frees one)."""
    layer_params, t = _poly_layer_params(layer_configs)
    if t < 2 or (with_bins and t % 4):
        return False
    if tb * layer_params[0][0] < 4:
        # Mosaic miscompiles int8 staging for tiles with < 4 sublane rows
        return False
    est = poly_vmem_estimate(layer_params, t, tb, with_bins, with_twin,
                             with_feats)
    return est <= POLY_VMEM_BUDGET


def polyphase_plan(layer_configs, with_bins: bool = False,
                   with_twin: bool = False, with_feats: bool = True):
    """Production megakernel plan for a geometry: ``(n_head, tb)`` where the
    first ``n_head`` layers run per-layer (``pallas_int8.fused_conv_layer``
    with its own tiling/reroute rules) and the remaining tail runs in ONE
    polyphase megakernel with batch tile ``tb``. Prefers the whole net in
    one kernel at the stock tile (n_head=0, tb=4 — the flagship plan), then
    trades batch tile down, then peels head layers (the analogue of the
    reference's layer-0 4-tile spatial split, ``layer_fsm.v:206-213`` —
    capacity forces the big early layers to tile). None when no tail of
    >= 2 layers fits (use hybrid)."""
    n = len(layer_configs)
    for n_head in range(0, n - 1):
        tail = layer_configs[n_head:]
        for tb in (POLY_TB, 2, 1):
            if polyphase_supported(tail, with_bins, with_twin, with_feats,
                                   tb=tb):
                return n_head, tb
    return None


def _roll(v, k, lanes):
    """out[l] = v[l + k] (matching np.roll(v, -k)); pltpu.roll needs a
    non-negative left shift."""
    return pltpu.roll(v, (lanes - k) % lanes, axis=1)


def _tap_variants(g: int, ay: int, ax: int):
    """Static (roll_amount, sy, sx) list for a tap's block-carry cases."""
    out = []
    for sy in sorted({(ry + ay) // g for ry in range(g)}):
        for sx in sorted({(rx + ax) // g for rx in range(g)}):
            out.append((sy, sx))
    return out


def _variant_runs(g: int, ay: int, ax: int, sy: int, sx: int):
    """Maximal contiguous runs (start_block, n_blocks) of the target phase
    blocks whose carries are exactly (sy, sx). Static."""
    targets = [
        ry * g + rx
        for ry in range(g)
        for rx in range(g)
        if (ry + ay) // g == sy and (rx + ax) // g == sx
    ]
    runs = []
    for b in targets:
        if runs and runs[-1][0] + runs[-1][1] == b:
            runs[-1][1] += 1
        else:
            runs.append([b, 1])
    return [(s, n) for s, n in runs]


def _stage_taps(x_i32, xs_ref, rows, g, t, lanes, ablate: str = "",
                fold: int = 1):
    """Stage the 9 zero-point-shifted taps of x_i32 (rows, lanes; uint8
    values widened — this Mosaic build miscompiles 8-bit rolls AND refuses
    16-bit rotates outright: "not implemented: Rotate with non-32-bit
    data", scripts/probe_roll16.py) into xs_ref int8 rows, (tap, row)-major.
    Invalid positions stage a=0, which the XOR-0x80 shift turns into -128.
    Masks come from in-kernel iota (Pallas forbids captured constants).

    ``fold`` > 1 stages the SAME bytes M-FOLDED: the lane range is split
    into ``fold`` contiguous quarter groups and tap values for quarter q
    land at row group (tap*fold + q) of a (9*fold*rows, lanes/fold)
    scratch, so the conv dot can run quarters block-diagonally in the MXU's
    M dimension (see ``_layer_folds``). Identical staged bytes and VPU
    work (rolls/masks stay full-width; only the stores split) — the fold
    exists purely to raise MXU 128x128-tile utilisation.

    ``ablate`` is a MEASUREMENT HOOK (scripts/probe_mega_ablate.py), never
    set in production: "noroll" replaces every roll with the unrolled
    source (wrong values, same traffic minus the rotate op), "nocorr"
    skips the corrective boundary-run stores, "notaps" stages only tap 0."""
    m = t * t
    lq = lanes // fold
    p = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    blk = p // m
    ry, rx = blk // g, blk % g
    inb = p % m
    Y, X = inb // t, inb % t

    def cvt(v_i32):
        return pltpu.bitcast(v_i32.astype(jnp.uint8) ^ jnp.uint8(0x80), jnp.int8)

    taps = [(a, b) for a in range(3) for b in range(3)]
    if ablate == "notaps":
        taps = taps[:1]
    for i, (dy, dx) in enumerate(taps):
        ay, ax = dy - 1, dx - 1
        yy = g * Y + ry + ay
        xx = g * X + rx + ax
        valid = (yy >= 0) & (yy < g * t) & (xx >= 0) & (xx < g * t)

        # base (carry-free) variant: one full roll + one full store.
        # Blocks belonging to other variants get overwritten below.
        # (Probed and REJECTED on hardware, docs/ROADMAP.md: (a) replacing
        # the roll with two vreg-aligned slice stores — wrapped lanes are
        # provably overwritten by the corrective stores — 3.52 vs 3.30
        # us/img; (b) skipping the roll+select for the center tap, 3.44
        # vs 3.30. Mosaic lowers this uniform roll+select+store shape
        # better than either "optimisation".)
        r0 = ay * g * m + ax * m
        rolled = x_i32 if ablate == "noroll" else _roll(x_i32, r0, lanes)
        base = jnp.where(valid, rolled, 0)
        if fold == 1:
            xs_ref[i * rows : (i + 1) * rows, :] = cvt(base)
        else:
            b8 = cvt(base)
            for q in range(fold):
                xs_ref[(i * fold + q) * rows : (i * fold + q + 1) * rows,
                       :] = jax.lax.slice(b8, (0, q * lq),
                                          (rows, (q + 1) * lq))
        if ablate == "nocorr":
            continue

        # corrective variants: contiguous boundary-block runs only, each a
        # static slice of the source (no roll) + masked store — far less
        # traffic than a full roll per variant.
        for sy, sx in _tap_variants(g, ay, ax):
            if sy == 0 and sx == 0:
                continue
            r = (ay - g * sy) * g * m + (ax - g * sx) * m + sy * t + sx
            for b0, nb in _variant_runs(g, ay, ax, sy, sx):
                lo, ln = b0 * m, nb * m
                rolled_r = None
                # folded: the run splits at quarter boundaries, each piece
                # stored to its quarter's row group (static Python)
                for q in range(lo // lq, (lo + ln - 1) // lq + 1):
                    plo, phi = max(lo, q * lq), min(lo + ln, (q + 1) * lq)
                    if 0 <= plo + r and phi + r <= lanes:
                        src = jax.lax.slice(x_i32, (0, plo + r),
                                            (rows, phi + r))
                    elif ablate == "noroll":
                        src = jax.lax.slice(x_i32, (0, plo), (rows, phi))
                    else:  # source wraps the array: fall back to a full roll
                        if rolled_r is None:
                            rolled_r = _roll(x_i32, r, lanes)
                        src = jax.lax.slice(rolled_r, (0, plo), (rows, phi))
                    lvalid = jax.lax.slice(valid, (0, plo), (1, phi))
                    xs_ref[(i * fold + q) * rows : (i * fold + q + 1) * rows,
                           plo - q * lq : phi - q * lq] = cvt(
                        jnp.where(lvalid, src, 0)
                    )


def _pool_blocks(act, g, t, rows, fold: int = 1):
    """(rows, g*g*m) activation (i32 in production; any max-able dtype —
    the poolbf16 ablation routes bf16 through here) -> pooled blocks
    (list of (rows, m) values to
    store). The 2x2 pool of phase block (2ry, 2rx) is the elementwise max
    of its 4 neighbour blocks — computed as 4 static lane slices + max per
    target block. This replaces the earlier 3 full-width rolls + max +
    compaction-copy formulation: less VMEM traffic (rolls were i32 at full
    lane width; 8-bit rolls miscompile on this Mosaic build, so they could
    not narrow). Measured 3.44 -> 3.33 us/img forward on v5e.

    ``fold`` > 1: ``act`` is the M-folded (fold*rows, g*g*m/fold)
    accumulator (see ``_stage_taps``); a source block lives in quarter
    q = block // (g*g/fold) at row group q — reached by a 2D static slice.
    A target's 4 sources always share one quarter (fold <= g/2 keeps
    whole block-row PAIRS per quarter), so outputs are plain (rows, m)
    blocks in the standard order either way."""
    m = t * t
    blocks = []
    g2 = g // 2
    bpg = g * g // fold  # blocks per quarter group
    for ry2 in range(g2):
        for rx2 in range(g2):
            vals = []
            for src in ((2 * ry2 + by) * g + (2 * rx2 + bx)
                        for by in (0, 1) for bx in (0, 1)):
                q, loc = divmod(src, bpg)
                vals.append(jax.lax.slice(
                    act, (q * rows, loc * m), ((q + 1) * rows, (loc + 1) * m)))
            blocks.append(jnp.maximum(jnp.maximum(vals[0], vals[1]),
                                      jnp.maximum(vals[2], vals[3])))
    return blocks


def _layer_folds(layer_params, tb: int) -> tuple[int, ...]:
    """Per-layer M-fold factors for the megakernel's conv dots.

    At tb=1 (the lyr4-wide chained tail) the block-diag dot runs M=oc of
    128 MXU rows — e.g. its L1 is (32, 144)x(144, 16384) = 256 128^3
    tiles/img with M 25 % full AND K padded 144->256. Folding ``f`` lane
    quarters block-diagonally into M (same staged bytes, reshaped scratch)
    fills the array: L1 at f=4 is (128, 576)x(576, 4096) = 160 tiles/img,
    L2 at f=2 80 (vs 96), L3 40 — 392 -> 280 tiles/img, the packing lever
    the round-5 tail ablation isolated (docs/DESIGN.md "Tail-internal
    ablation"). The reference never underfills its 16-core array
    (``rtl/core/cnn_acc_top.v:221-240``); this is the MXU analogue.

    Constraints: f*tb*oc <= 128 (M at most one tile), f <= g/2 (a quarter
    group holds whole block-row PAIRS, so pooling stays quarter-local —
    see ``_pool_blocks``). Folding is only wired for tb=1 (quarter-major
    block-diag order; the tb=4 flagship measures at its packing floor
    already, docs/DESIGN.md:242-247).

    MEASURED AND REJECTED for production (`scripts/probe_lyr4_fold.py`,
    bit-exact on chip first): the lyr4 tail runs 7.68 -> 8.39 us/img
    with the full (4, 2, 1) fold — the 128^3 tile-count model does NOT
    govern this Mosaic's dot cost at these shapes; the kernel stays at
    fold=1 and this policy is the probe's A/B arm (fold=0)."""
    if tb != 1:
        return tuple(1 for _ in layer_params)
    folds = []
    for ic, oc, g in layer_params:
        f = 1
        while 2 * f * tb * oc <= 128 and 2 * f <= g // 2:
            f *= 2
        folds.append(f)
    return tuple(folds)


def _mega_body(shift_ref, x_ref, *rest, layer_params, tb, t, with_bins,
               with_twin=False, with_feats=True, roll_dtype=jnp.int32,
               ablate="", folds=None):
    n_layers = len(layer_params)
    k_refs = rest[:n_layers]
    corr_refs = rest[n_layers : 2 * n_layers]
    off = 2 * n_layers
    out_ref = bins_ref = twin_ref = None
    if with_feats:
        out_ref = rest[off]
        off += 1
    if with_bins:
        bins_ref = rest[off]
        off += 1
    if with_twin:
        twin_ref = rest[off]
        off += 1
    xs_refs = rest[off : off + n_layers]
    act_refs = rest[off + n_layers :]  # inter-layer phase rows (u8)

    m = t * t
    ic0, _, g0 = layer_params[0]
    if folds is None:
        folds = tuple(1 for _ in layer_params)
    # (tb, ic0, lanes0) block -> (img, ic)-major rows, the layout every
    # stage expects (ic0 == 1 for raw images; > 1 when a chained head
    # already ran the early layers)
    x_u8 = x_ref[:].reshape(tb * ic0, g0 * g0 * m)

    for li, (ic, oc, g) in enumerate(layer_params):
        lanes = g * g * m
        rows = tb * ic
        fold = folds[li]
        cur_u8 = x_u8 if li == 0 else act_refs[li - 1][:]
        x_i32 = cur_u8.astype(roll_dtype)
        if ablate == "slicedot":
            # TIMING-ONLY shape probe for the roll-free formulation: stage
            # the zero-point-shifted input ONCE into a lane-padded buffer,
            # then contract each tap as its own MXU dot on an m-aligned
            # static slice (values are WRONG at phase-carry boundaries —
            # no masks, no corrective stores; scripts/probe_mega_ablate.py
            # uses this to decide whether the redesign is worth the
            # correction machinery).
            pad = (g + 1) * m
            xp_ref = xs_refs[li]  # (rows, lanes + 2*pad) int8 in this mode
            xp_ref[:, pad : pad + lanes] = pltpu.bitcast(
                cur_u8 ^ jnp.uint8(0x80), jnp.int8
            )
            acc = None
            for tap in range(9):
                ay, ax = tap // 3 - 1, tap % 3 - 1
                r0 = ay * g * m + ax * m
                sl = xp_ref[:, pad + r0 : pad + r0 + lanes]
                kt = k_refs[li][:, tap * tb * ic : (tap + 1) * tb * ic]
                d = jnp.dot(kt, sl, preferred_element_type=jnp.int32)
                acc = d if acc is None else acc + d
            acc = acc + corr_refs[li][:]
        elif ablate == "mm1tap":
            # full staging, 1/9th of the matmul (first tap block only) —
            # full-minus-this isolates ~8/9 of the MXU time. (A no-matmul
            # variant is not compilable: Mosaic's layout pass aborts on any
            # (N, 1) corr broadcast outside a dot epilogue.)
            _stage_taps(x_i32, xs_refs[li], rows, g, t, lanes)
            acc = jnp.dot(k_refs[li][:, : tb * ic],
                          xs_refs[li][: tb * ic, :],
                          preferred_element_type=jnp.int32)
            acc = acc + corr_refs[li][:]
        else:
            _stage_taps(x_i32, xs_refs[li], rows, g, t, lanes, ablate=ablate,
                        fold=fold)
            acc = jnp.dot(k_refs[li][:], xs_refs[li][:],
                          preferred_element_type=jnp.int32)
            acc = acc + corr_refs[li][:]
        act = jnp.clip(jnp.right_shift(acc, shift_ref[li]), 0, 255)
        if ablate == "pool8":
            # narrow to u8 IN the dot epilogue so the (tb*oc, lanes) i32
            # activation never materialises in VMEM; pool slices/maxes u8.
            # (REJECTED: Mosaic has no 8-bit vector maxui on this build.)
            act = act.astype(jnp.uint8)
        elif ablate == "pool16":
            # same idea at i16 width (halves the act spill + pool reads)
            act = act.astype(jnp.int16)
        elif ablate == "poolbf16":
            # bf16 pooling — the one narrowing that COMPILES (float max at
            # 16-bit width legalizes where integer i8/i16 max does not;
            # 0..255 is exact in bf16, bit-exact + hardware-parity-gated).
            # PROBED AND REJECTED for production: on a healthy relay
            # session it measures SLOWER than i32 in both configs
            # (forward 3.945 vs 3.575 us/img, detect e2e 3.803 vs 3.676 —
            # interleaved best-of-N, scripts/probe_mega_ablate.py
            # full,poolbf16 / scripts/probe_detect_pool_ab.py): the
            # cvt-to-bf16 chain plus the i32 re-widen at the u8 store
            # costs more than the halved pool-read width saves. (An
            # earlier degraded-relay session measured the OPPOSITE sign,
            # -0.84 us/img — which is why this stays a one-flag re-probe
            # for future toolchains rather than a deleted idea.)
            act = act.astype(jnp.bfloat16)
        blocks = _pool_blocks(act, g, t, tb * oc, fold=fold)
        # In detect mode (with_feats=False) the u8 feature map is dead —
        # the CAM reads the f32 twin and the classifier the fused bins —
        # so the final layer's u8 store (16 KB/img of HBM writes + a
        # double-buffered VMEM output block) is skipped entirely.
        target = (out_ref if li == n_layers - 1 else act_refs[li])
        if target is not None:
            for d, b in enumerate(blocks):
                if b.dtype == jnp.bfloat16:  # poolbf16: hop via i32
                    b = b.astype(jnp.int32)
                target[:, d * m : (d + 1) * m] = b.astype(jnp.uint8)
        if with_twin and li == n_layers - 1:
            # feature twin of the final features (bf16 in production,
            # f32 under the twinf32 ablation), written while they are
            # still i32 in VMEM: spares the head's CAM the (slow) XLA
            # u8->f32 relayout of the feature map
            blk0 = blocks[0]
            if blk0.dtype == jnp.uint8:  # pool8: u8->f32 must hop via i32
                blk0 = blk0.astype(jnp.int32)
            # i32 -> bf16/f32: exact for 0..255 either way
            twin_ref[:] = blk0.astype(twin_ref.dtype)
        if with_bins and li == n_layers - 1:
            # fused head pooling: 4x4 spatial-bin means of the final 16x16
            # map, via a selection matmul (exact integer sums, then the same
            # /16 and /255 as detect_head.bin_pool)
            s = int(round(m**0.5))
            npx = s // 4
            p_i = jax.lax.broadcasted_iota(jnp.int32, (m, 16), 0)
            b_i = jax.lax.broadcasted_iota(jnp.int32, (m, 16), 1)
            sel = ((p_i // s // npx) * 4 + (p_i % s) // npx) == b_i
            mb = sel.astype(jnp.float32)
            blk0f = blocks[0]
            if blk0f.dtype == jnp.uint8:  # pool8: u8->f32 hops via i32
                blk0f = blk0f.astype(jnp.int32)
            sums = jnp.dot(blk0f.astype(jnp.float32), mb,
                           preferred_element_type=jnp.float32)
            bins_ref[:] = sums / (npx * npx) / 255.0


def _pack_blockdiag_poly(kernel: jax.Array, tb: int):
    """(oc, ic, 3, 3) int8 -> block-diag (tb*oc, 9*tb*ic) int8 + (tb*oc, 1)
    int32 zero-point correction. Staged rows are (tap, img, ic)-major.
    Traceable (jnp) so it folds to a constant under jit."""
    oc, ic = kernel.shape[:2]
    k_toc = jnp.transpose(kernel.astype(jnp.float32), (0, 2, 3, 1)).reshape(oc, 9, ic)
    w = jnp.zeros((tb, oc, 9, tb, ic), jnp.float32)
    idx = jnp.arange(tb)
    w = w.at[idx, :, :, idx, :].set(jnp.broadcast_to(k_toc, (tb, oc, 9, ic)))
    w2d = w.reshape(tb * oc, 9 * tb * ic)
    corr = (128.0 * w2d.sum(axis=1, keepdims=True)).astype(jnp.int32)
    return w2d.astype(jnp.int8), corr


def phase_split_batch(images: jax.Array, g: int) -> jax.Array:
    """(B, S, S) u8 -> (B, 1, g*g*(S/g)^2) phase-blocked rows (XLA side)."""
    b, s, _ = images.shape
    t = s // g
    v = images.reshape(b, t, g, t, g).transpose(0, 2, 4, 1, 3)
    return v.reshape(b, 1, g * g * t * t)


def phase_split_nchw(x: jax.Array, g: int) -> jax.Array:
    """(B, C, S, S) u8 -> (B, C, g*g*(S/g)^2) phase-blocked rows per channel
    (the multi-channel entry for a chained-tail megakernel)."""
    b, c, s, _ = x.shape
    t = s // g
    v = x.reshape(b, c, t, g, t, g).transpose(0, 1, 3, 5, 2, 4)
    return v.reshape(b, c, g * g * t * t)


@partial(jax.jit,
         static_argnames=("interpret", "with_bins", "with_twin", "with_feats",
                          "roll_dtype", "ablate", "tb", "pre_split", "fold"))
def cnn_forward_polyphase_pallas(
    images: jax.Array,  # (B, S, S) / (B, S, S, 1) u8; (B, ic0, S, S) if ic0>1
    kernels: Sequence[jax.Array],
    shifts: jax.Array,
    *,
    interpret: bool | None = None,
    with_bins: bool = False,
    with_twin: bool = False,
    with_feats: bool = True,
    roll_dtype: str = "int32",
    ablate: str = "",
    tb: int | None = None,
    pre_split: bool = False,
    # None/1 = off (PRODUCTION — the fold was built, proven bit-exact on
    # chip, and measured SLOWER: tail 7.68 -> 8.39 us/img, see
    # _layer_folds); 0 = the auto fold policy; tuple = explicit per-layer
    # factors (the probe's localisation arms)
    fold: int | tuple[int, ...] | None = None,
) -> jax.Array:
    """Full forward in ONE kernel. Returns (B, oc_last, (S/2^L)^2) uint8 —
    same layout contract as ``ops.quant.cnn_forward`` (the final single
    phase's flat (Y, X) order IS the feature layout). With ``with_bins``,
    additionally returns the fused-head spatial-bin pooling
    (B, oc_last*16) f32 (matching ``detect_head.bin_pool``). With
    ``with_twin``, additionally returns a bf16 twin of the features (same
    values — 0..255 is exact in bf16 — written in-kernel) so the head's
    CAM skips XLA's slow u8->f32 feature relayout; consumers upcast to
    f32 exactly (``detect_head.detect_with_pooled`` does it internally).
    ``with_feats=False`` drops the u8 feature output
    entirely (detect mode: the head consumes only bins/twin, and XLA
    cannot dead-code-eliminate a Pallas output buffer). Outputs come back
    in (feats, bins, twin) order, a bare array when only one is requested."""
    if not (with_feats or with_bins or with_twin):
        raise ValueError("at least one of with_feats/with_bins/with_twin "
                         "must be requested")
    ic0 = int(kernels[0].shape[1])
    if pre_split:
        # (B, ic0, S*S) rows already in the phase_split_nchw(x, g0) layout
        # (e.g. straight from conv_pool_layer_phase) — skips the XLA
        # phase-split transpose entirely.
        if ic0 == 1 or images.ndim != 3 or images.shape[1] != ic0:
            raise ValueError(
                f"pre_split megakernel input must be (B, {ic0}, S*S) rows "
                f"with ic0 > 1"
            )
        b = images.shape[0]
        s = int(round(images.shape[2] ** 0.5))
        if s * s != images.shape[2]:
            raise ValueError("pre_split rows must cover a square image")
    elif ic0 == 1:
        if images.ndim == 4:
            images = images[..., 0]
        b, s, _ = images.shape
    else:
        if images.ndim != 4 or images.shape[1] != ic0:
            raise ValueError(
                f"multi-channel megakernel input must be (B, {ic0}, S, S)"
            )
        b, _, s, _ = images.shape
    if interpret is None:
        interpret = _interpret_default()

    n_layers = len(kernels)
    g0 = 2**n_layers
    t = s // g0
    m = t * t

    layer_params = []  # (ic, oc, g at layer input)
    g = g0
    for k in kernels:
        oc, ic = np.asarray(k.shape[:2], int)
        layer_params.append((int(ic), int(oc), g))
        g //= 2
    oc_last = layer_params[-1][1]

    if tb is None:
        tb = POLY_TB
    if not interpret and tb * ic0 < 4:
        raise ValueError(
            f"batch tile {tb} x ic0 {ic0} gives < 4 sublane rows — Mosaic "
            f"miscompiles int8 staging below 4 rows on this build"
        )
    est = poly_vmem_estimate(layer_params, t, tb, with_bins, with_twin,
                             with_feats)
    if not interpret and est > POLY_VMEM_BUDGET:
        raise ValueError(
            f"polyphase megakernel working set ~{est / 2**20:.1f} MiB exceeds "
            f"the {POLY_VMEM_BUDGET / 2**20:.0f} MiB VMEM budget for this "
            f"geometry — use cnn_forward_mega (chained plan) or the hybrid "
            f"backend (TPUEngine falls back automatically)"
        )
    pb = b
    if b % tb:
        pb = ((b + tb - 1) // tb) * tb
        pad_shape = (
            (pb - b, ic0, s * s) if pre_split
            else (pb - b, s, s) if ic0 == 1
            else (pb - b, ic0, s, s))
        images = jnp.concatenate(
            [images, jnp.zeros(pad_shape, images.dtype)], axis=0
        )

    x_rows = (images if pre_split
              else phase_split_batch(images, g0) if ic0 == 1
              else phase_split_nchw(images, g0))

    # M-fold factors (lane-quarter block-diag packing of the conv dots —
    # see _layer_folds; fold=0 -> the auto policy, an int -> uniform
    # cap, a tuple -> explicit per-layer factors).
    if isinstance(fold, tuple):
        folds = fold
    elif fold == 0 and ablate != "slicedot":
        folds = _layer_folds(layer_params, tb)
    else:
        folds = tuple(1 for _ in layer_params)

    kmats, corrs = [], []
    for k, f, (ic, oc, g) in zip(kernels, folds, layer_params):
        km, co = _pack_blockdiag_poly(k, tb * f)
        kmats.append(km)
        corrs.append(co)

    scratch = [
        (pltpu.VMEM((tb * ic, g * g * m + 2 * (g + 1) * m), jnp.int8)
         if ablate == "slicedot"
         else pltpu.VMEM((9 * f * tb * ic, g * g * m // f), jnp.int8))
        for f, (ic, oc, g) in zip(folds, layer_params)
    ] + [
        # inter-layer activation rows (u8), sized at the layer's OUTPUT
        pltpu.VMEM((tb * oc, (g // 2) * (g // 2) * m), jnp.uint8)
        for ic, oc, g in layer_params[:-1]
    ]
    total_macs = sum(oc * 9 * ic * g * g * m for ic, oc, g in layer_params)

    out_shapes, out_specs = [], []
    if with_feats:
        out_shapes.append(jax.ShapeDtypeStruct((pb * oc_last, m), jnp.uint8))
        out_specs.append(
            pl.BlockSpec((tb * oc_last, m), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
        )
    if with_bins:
        out_shapes.append(jax.ShapeDtypeStruct((pb * oc_last, 16), jnp.float32))
        out_specs.append(
            pl.BlockSpec((tb * oc_last, 16), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
        )
    if with_twin:
        # PRODUCTION: the feature twin is bf16 — 0..255 is exact in bf16,
        # the consumer-side upcast to f32 is exact (and fuses into the
        # CAM matmul read), and halving the kernel's widest output
        # measured -0.09 us/img detect e2e (283.4k vs 275.8k FPS,
        # re-confirmed in a second process at -0.084 — healthy-session
        # interleaved A/Bs, scripts/probe_twin_bf16.py). ablate=twinf32
        # keeps the old full-width twin measurable.
        twin_dt = jnp.float32 if ablate == "twinf32" else jnp.bfloat16
        out_shapes.append(jax.ShapeDtypeStruct((pb * oc_last, m), twin_dt))
        out_specs.append(
            pl.BlockSpec((tb * oc_last, m), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)
        )

    multi = len(out_shapes) > 1
    res = pl.pallas_call(
        partial(_mega_body, layer_params=layer_params, tb=tb, t=t,
                with_bins=with_bins, with_twin=with_twin,
                with_feats=with_feats,
                roll_dtype=jnp.dtype(roll_dtype).type, ablate=ablate,
                folds=folds),
        out_shape=tuple(out_shapes) if multi else out_shapes[0],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # shifts vector in SMEM
            grid=(pb // tb,),
            in_specs=[
                pl.BlockSpec((tb, ic0, g0 * g0 * m), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(2 * n_layers)],
            ],
            out_specs=tuple(out_specs) if multi else out_specs[0],
            scratch_shapes=scratch,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * total_macs * pb,
            bytes_accessed=pb * (s * s + oc_last * m),
            transcendentals=0,
        ),
        interpret=interpret,
    )(shifts.astype(jnp.int32), x_rows, *kmats, *corrs)
    parts = list(res) if multi else [res]
    ret = []
    if with_feats:
        ret.append(parts.pop(0).reshape(pb, oc_last, m)[:b])
    if with_bins:
        ret.append(parts.pop(0).reshape(pb, oc_last * 16)[:b])
    if with_twin:
        ret.append(parts.pop(0).reshape(pb, oc_last, m)[:b])
    return tuple(ret) if multi else ret[0]


@partial(jax.jit,
         static_argnames=("interpret", "with_bins", "with_twin", "with_feats"))
def cnn_forward_mega(
    images: jax.Array,  # (B, S, S) or (B, S, S, 1) uint8
    kernels: Sequence[jax.Array],
    shifts: jax.Array,
    *,
    interpret: bool | None = None,
    with_bins: bool = False,
    with_twin: bool = False,
    with_feats: bool = True,
) -> jax.Array:
    """The general production mega entry: the WHOLE net in one polyphase
    megakernel when its working set fits VMEM (the flagship plan), else the
    ``polyphase_plan`` chain — each head layer through the chunked
    single-layer Pallas kernel (:func:`conv_pool_layer_poly`) when its
    geometry qualifies, else ``pallas_int8.fused_conv_layer`` (which itself
    reroutes sub-4-row geometries to the XLA conv), tail in one megakernel
    at the planned batch tile. Bit-exact every way; same output
    contract/options as :func:`cnn_forward_polyphase_pallas`. Raises when no
    plan exists (``polyphase_plan`` returned None — use hybrid)."""
    if images.ndim == 4:
        images = images[..., 0]
    b, s, _ = images.shape
    sizes = [s // 2**i for i in range(len(kernels))]
    layer_configs = tuple(
        (int(k.shape[1]), int(k.shape[0]), sz) for k, sz in zip(kernels, sizes)
    )
    plan = polyphase_plan(layer_configs, with_bins, with_twin, with_feats)
    if plan is None:
        raise ValueError(
            f"no megakernel plan fits VMEM for {layer_configs} — use the "
            f"hybrid backend"
        )
    n_head, tb = plan
    if n_head == 0:
        return cnn_forward_polyphase_pallas(
            images, kernels, shifts, interpret=interpret, with_bins=with_bins,
            with_twin=with_twin, with_feats=with_feats, tb=tb,
        )
    from tpu_cnn.ops import pallas_int8

    x = images[:, None, :, :]  # NCHW
    h_tail = 2 ** (len(kernels) - n_head)
    pre_split = False
    for i in range(n_head):
        ic_i, oc_i, s_i = layer_configs[i]
        if (i == n_head - 1
                and phase_layer_plan(ic_i, oc_i, s_i, h_tail) is not None):
            # the last head layer in VMEM, phase-ALIGNED: its output rows
            # ARE the tail's phase-split input, skipping both the XLA
            # relayout (which degenerates to ~+14 us/img when composed
            # with a Pallas output reshape) and the memory-bound XLA conv
            # (19.1 vs 4.4 us/img real, scripts/probe_lyr4_floor.py)
            x = conv_pool_layer_phase(x, kernels[i], shifts[i], h=h_tail,
                                      interpret=interpret)
            pre_split = True
        elif single_layer_supported(ic_i, oc_i, s_i):
            # mid-chain big layer in VMEM at the g=2 layout (NCHW out)
            x = conv_pool_layer_poly(x, kernels[i], shifts[i],
                                     interpret=interpret)
        else:
            kmat = pallas_int8.pack_kernel_matrix(kernels[i])
            x = pallas_int8.fused_conv_layer(x, kmat, shifts[i],
                                             interpret=interpret)
    return cnn_forward_polyphase_pallas(
        x, kernels[n_head:], shifts[n_head:], interpret=interpret,
        with_bins=with_bins, with_twin=with_twin, with_feats=with_feats, tb=tb,
        pre_split=pre_split,
    )


# ---------------------------------------------------------------------------
# Chunked single-layer kernel: the big-geometry head layer in Pallas.
#
# The polyphase megakernel cannot take lyr4-wide's 256^2 layer 0: the whole-
# net working set blows VMEM at any batch tile, tb=1 hits the <4-sublane-row
# int8 staging miscompile, and both padded-channel workarounds OOM Mosaic's
# scoped VMEM (25.8M > 16M, scripts/probe_lyr4_padded.py). The XLA conv
# reroute is CORRECT but memory-bound: its f32 conv output materialises in
# HBM (4.2 MB/img at 256^2 x 16ch) and the measured L0 stage costs 24.9 of
# the chain's 29.6 us/img while holding 4% of the MACs — and every XLA-level
# reformulation probed within 14% of it (bf16/NCHW/im2col/space-to-depth,
# scripts/probe_lyr4_l0.py: conv dtype is irrelevant, traffic is the wall).
#
# This kernel runs ONE conv3x3 -> >>shift -> clip -> 2x2-maxpool layer
# entirely in VMEM at the single-layer polyphase layout (g=2): the input
# image stays resident, activations never touch HBM, and the int32
# accumulator — the object that made the layer un-fusable (4 MB/img) — is
# CHUNKED: the kernel walks the 4 phase blocks x n_sub lane sub-chunks,
# staging taps and running the block-diag int8 MXU dot per chunk, folding
# the 2x2 pool as a running max across the 4 phase blocks (shift/clip and
# max are monotone, so pooling raw accumulators is exact). Chunking makes
# every tap a STATIC in-bounds lane slice — g=2 gives each (phase block,
# tap) exactly ONE carry variant (sy = -1 forces the source phase row to 1
# and vice versa), so the full kernel's roll + corrective-run machinery
# degenerates to 36 masked slice-stores with no rolls and no padding.
# The reference hits the same wall at the same layer and splits it 4-ways
# spatially in hardware (layer 0 capacity split, ``rtl/core/layer_fsm.v:
# 206-213``); this is that split, on the lane axis of one core.
# ---------------------------------------------------------------------------


def _single_layer_body(shift_ref, x_ref, k_ref, corr_ref, out_ref, xs_ref,
                       *, ic, oc, tb, t, n_sub):
    m = t * t
    lanes = 4 * m
    rows = tb * ic
    x_i32 = x_ref[:].reshape(rows, lanes).astype(jnp.int32)
    ln = m // n_sub

    def cvt(v_i32):
        return pltpu.bitcast(v_i32.astype(jnp.uint8) ^ jnp.uint8(0x80),
                             jnp.int8)

    for c in range(n_sub):
        off = c * ln
        masks = {}
        mx = None
        for blk in range(4):
            ry, rx = blk // 2, blk % 2
            for i, (dy, dx) in enumerate(
                    (a, b) for a in range(3) for b in range(3)):
                ay, ax = dy - 1, dx - 1
                sy, sx = (ry + ay) // 2, (rx + ax) // 2
                sb = (ry + ay - 2 * sy) * 2 + (rx + ax - 2 * sx)
                r = sb * m + sy * t + sx + off
                src = jax.lax.slice(x_i32, (0, r), (rows, r + ln))
                if sy or sx:
                    if (sy, sx) not in masks:
                        p = jax.lax.broadcasted_iota(
                            jnp.int32, (1, ln), 1) + off
                        yy, xx = p // t + sy, p % t + sx
                        masks[(sy, sx)] = ((yy >= 0) & (yy < t)
                                           & (xx >= 0) & (xx < t))
                    src = jnp.where(masks[(sy, sx)], src, 0)
                xs_ref[i * rows:(i + 1) * rows, :] = cvt(src)
            acc = jnp.dot(k_ref[:], xs_ref[:],
                          preferred_element_type=jnp.int32)
            acc = acc + corr_ref[:]
            mx = acc if mx is None else jnp.maximum(mx, acc)
        act = jnp.clip(jnp.right_shift(mx, shift_ref[0]), 0, 255)
        out_ref[:, off:off + ln] = act.astype(jnp.uint8)


def single_layer_vmem_estimate(ic: int, oc: int, s: int, tb: int,
                               n_sub: int) -> int:
    """Peak-VMEM model (bytes) for ``conv_pool_layer_poly``: double-buffered
    u8 in/out blocks, the widened i32 input (resident across chunks), the
    per-chunk int8 tap scratch, and two live i32 dot outputs (current max +
    incoming block)."""
    lanes = s * s
    m = lanes // 4
    ln = m // n_sub
    rows = tb * ic
    return (2 * tb * ic * lanes          # in block (u8, double-buffered)
            + 4 * rows * lanes           # widened i32 input (value)
            + 9 * rows * ln              # int8 tap scratch
            + 2 * 4 * tb * oc * ln       # running max + incoming acc (i32)
            + 2 * tb * oc * m            # out block (u8, double-buffered)
            + tb * oc * 9 * rows + 4 * tb * oc)  # packed weights + corr


def single_layer_plan(ic: int, oc: int, s: int,
                      tb: int = POLY_TB) -> int | None:
    """Smallest power-of-two sub-chunk count whose working set fits the VMEM
    budget, or None when the chunked single-layer kernel cannot handle this
    geometry: it needs a square even size with t = s/2 a multiple of the
    128-lane tile (static slices at sy*t offsets must stay layout-aligned),
    >= 4 staged sublane rows, and sub-chunks no finer than one lane tile."""
    t = s // 2
    m = t * t
    if s % 2 or t % 128 or tb * ic < 4:
        return None
    n_sub = 1
    while m % n_sub == 0 and m // n_sub >= 128:
        if single_layer_vmem_estimate(ic, oc, s, tb, n_sub) \
                <= POLY_VMEM_BUDGET:
            return n_sub
        n_sub *= 2
    return None


def single_layer_supported(ic: int, oc: int, s: int, tb: int = POLY_TB,
                           n_sub: int | None = None) -> bool:
    """True when ``conv_pool_layer_poly`` handles this geometry (at the
    given sub-chunk count, or at the auto-planned one when None)."""
    if n_sub is None:
        return single_layer_plan(ic, oc, s, tb) is not None
    t = s // 2
    m = t * t
    return (s % 2 == 0 and t % 128 == 0 and tb * ic >= 4
            and m % n_sub == 0
            and single_layer_vmem_estimate(ic, oc, s, tb, n_sub)
            <= POLY_VMEM_BUDGET)


@partial(jax.jit, static_argnames=("interpret", "tb", "n_sub"))
def conv_pool_layer_poly(
    x: jax.Array,  # (B, ic, S, S) uint8
    kernel: jax.Array,  # (oc, ic, 3, 3) int8
    shift: jax.Array,  # scalar int32
    *,
    interpret: bool | None = None,
    tb: int | None = None,
    n_sub: int | None = None,
) -> jax.Array:
    """One contract layer (conv3x3 -> >>shift -> clip -> 2x2 maxpool) as a
    chunked-accumulator Pallas kernel at the g=2 polyphase layout. Returns
    (B, oc, S/2, S/2) uint8 — bit-exact with ``quant.fixed_point_conv_layer``
    (the 1-channel 256^2 case is hardware-parity-gated in the tpu lane)."""
    b, ic, s, _ = x.shape
    oc = int(kernel.shape[0])
    if interpret is None:
        interpret = _interpret_default()
    if tb is None:
        tb = POLY_TB
    if n_sub is None:
        n_sub = single_layer_plan(ic, oc, s, tb)
    if n_sub is None or not single_layer_supported(ic, oc, s, tb, n_sub):
        raise ValueError(
            f"chunked single-layer kernel does not support ic={ic} oc={oc} "
            f"s={s} tb={tb} n_sub={n_sub} — use fused_conv_layer's XLA path"
        )
    t = s // 2
    m = t * t
    pb = b
    if b % tb:
        pb = ((b + tb - 1) // tb) * tb
        x = jnp.concatenate(
            [x, jnp.zeros((pb - b, ic, s, s), x.dtype)], axis=0
        )
    x_rows = phase_split_nchw(x, 2)  # (pb, ic, 4m)
    kmat, corr = _pack_blockdiag_poly(kernel, tb)
    out = pl.pallas_call(
        partial(_single_layer_body, ic=ic, oc=oc, tb=tb, t=t, n_sub=n_sub),
        out_shape=jax.ShapeDtypeStruct((pb * oc, m), jnp.uint8),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # shift scalar in SMEM
            grid=(pb // tb,),
            in_specs=[
                pl.BlockSpec((tb, ic, 4 * m), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tb * oc, m), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((9 * tb * ic, m // n_sub), jnp.int8),
            ],
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * ic * oc * s * s * pb,
            bytes_accessed=pb * (ic * s * s + oc * m),
            transcendentals=0,
        ),
        interpret=interpret,
    )(shift.reshape(1).astype(jnp.int32), x_rows, kmat, corr)
    return out.reshape(pb, oc, t, t)[:b]


# ---------------------------------------------------------------------------
# Phase-aligned chunked single-layer kernel: same contract layer as
# conv_pool_layer_poly, but the OUTPUT is written directly in the tail
# megakernel's phase-split rows layout (phase_split_nchw(pooled, h)).
#
# Why: probe_lyr4_floor measured the chunked L0 at 4.4 us/img real vs the
# XLA reroute's 19.1 — but chaining it through the tail gave ~zero,
# because XLA composes the kernel's (pb*oc, m) -> NCHW lane-split reshape
# with the tail's g=8 phase-split transpose into one degenerate
# byte-granular relayout (~+14 us/img, vs 2.2 for the standalone
# transpose). The fix is layout co-design, not a faster transpose: stage
# the INPUT sub-phase-major — lane = ((a*2+b)*h^2 + qy*h + qx)*M + ly*W
# + lx for input pixel (y, x) = (16*ly + 2*qy + a, ...) — and the conv
# output for pool sub-phase (a, b) lands at exactly the OUTPUT q-lane, so
# pooling is again a running max over the four sub-phase groups and the
# store order IS phase_split_nchw(out, h). Every tap is one contiguous
# slice at offset (dqy*h + dqx)*M, plus masked boundary-correction slices
# at -dqy*(h^2*M - W) / -dqx*(h*M - 1) for the wrap rows/columns (an
# m-lane zero pad on each side keeps all slices in bounds; out-of-image
# lanes are masked to zero, which the block-diag zero-point correction
# maps to an exact zero contribution). The reference pays the same
# capacity split in hardware (``rtl/core/layer_fsm.v:206-213``); here the
# split is chosen so the NEXT stage's layout falls out for free.
# ---------------------------------------------------------------------------


def phase_input_split(x: jax.Array, h: int) -> jax.Array:
    """(B, C, S, S) u8 -> (B, C, 4*h*h*W*W) sub-phase-major rows, W =
    S/(2h): groups (y%2, x%2) major, then the g=h phase split of each
    group's (S/2)^2 sub-image (block (qy, qx) = ((y//2)%h, (x//2)%h),
    local (ly, lx) = (y//(2h), x//(2h)))."""
    b, c, s, _ = x.shape
    w = s // (2 * h)
    v = x.reshape(b, c, w, h, 2, w, h, 2)
    v = v.transpose(0, 1, 4, 7, 3, 6, 2, 5)
    return v.reshape(b, c, 4 * h * h * w * w)


def _phase_layer_body(shift_ref, x_ref, k_ref, corr_ref, out_ref, xs_ref,
                      *, ic, oc, tb, h, w, n_sub):
    mm = w * w
    m = h * h * mm           # output lanes (= one sub-phase group's lanes)
    rows = tb * ic
    x_i32 = x_ref[:].reshape(rows, 4 * m).astype(jnp.int32)
    zpad = jnp.zeros((rows, m), jnp.int32)
    xp = jnp.concatenate([zpad, x_i32, zpad], axis=1)
    ln = m // n_sub
    yc = h * h * mm - w      # y-wrap source correction magnitude
    xc = h * mm - 1          # x-wrap source correction magnitude

    def cvt(v_i32):
        return pltpu.bitcast(v_i32.astype(jnp.uint8) ^ jnp.uint8(0x80),
                             jnp.int8)

    for c in range(n_sub):
        off = c * ln
        p = jax.lax.broadcasted_iota(jnp.int32, (1, ln), 1) + off
        qy, qx = (p // mm) // h, (p // mm) % h
        ly, lx = (p % mm) // w, p % w
        mx = None
        for a in range(2):
            for b2 in range(2):
                for i, (dy, dx) in enumerate(
                        (t0, t1) for t0 in range(3) for t1 in range(3)):
                    uy, ux = a + dy - 1, b2 + dx - 1
                    sa, sb = uy % 2, ux % 2
                    dqy, dqx = (uy - sa) // 2, (ux - sb) // 2
                    o0 = m + (sa * 2 + sb) * m + (dqy * h + dqx) * mm + off
                    src = jax.lax.slice(xp, (0, o0), (rows, o0 + ln))
                    if dqy:
                        sel = qy == (0 if dqy < 0 else h - 1)
                        ok = (ly >= 1) if dqy < 0 else (ly <= w - 2)
                        cs = jax.lax.slice(
                            xp, (0, o0 - dqy * yc), (rows, o0 - dqy * yc + ln))
                        src = jnp.where(sel, jnp.where(sel & ok, cs, 0), src)
                    if dqx:
                        sel = qx == (0 if dqx < 0 else h - 1)
                        ok = (lx >= 1) if dqx < 0 else (lx <= w - 2)
                        cs = jax.lax.slice(
                            xp, (0, o0 - dqx * xc), (rows, o0 - dqx * xc + ln))
                        src = jnp.where(sel, jnp.where(sel & ok, cs, 0), src)
                    if dqy and dqx:
                        sel = ((qy == (0 if dqy < 0 else h - 1))
                               & (qx == (0 if dqx < 0 else h - 1)))
                        oky = (ly >= 1) if dqy < 0 else (ly <= w - 2)
                        okx = (lx >= 1) if dqx < 0 else (lx <= w - 2)
                        o2 = o0 - dqy * yc - dqx * xc
                        cs = jax.lax.slice(xp, (0, o2), (rows, o2 + ln))
                        src = jnp.where(
                            sel, jnp.where(sel & oky & okx, cs, 0), src)
                    xs_ref[i * rows:(i + 1) * rows, :] = cvt(src)
                acc = jnp.dot(k_ref[:], xs_ref[:],
                              preferred_element_type=jnp.int32)
                acc = acc + corr_ref[:]
                mx = acc if mx is None else jnp.maximum(mx, acc)
        act = jnp.clip(jnp.right_shift(mx, shift_ref[0]), 0, 255)
        out_ref[:, off:off + ln] = act.astype(jnp.uint8)


def phase_layer_vmem_estimate(ic: int, oc: int, s: int, h: int, tb: int,
                              n_sub: int) -> int:
    """Peak-VMEM model (bytes) for ``conv_pool_layer_phase``: u8 in/out
    blocks (double-buffered), the widened i32 input plus its zero-padded
    concat value, per-chunk int8 tap scratch, two live i32 dot outputs."""
    m = (s // 2) ** 2
    ln = m // n_sub
    rows = tb * ic
    return (2 * tb * ic * 4 * m        # in block (u8, double-buffered)
            + 4 * rows * 4 * m         # widened i32 input
            + 4 * rows * 6 * m         # zero-padded concat value
            + 9 * rows * ln            # int8 tap scratch
            + 2 * 4 * tb * oc * ln     # running max + incoming acc (i32)
            + 2 * tb * oc * m          # out block (u8, double-buffered)
            + tb * oc * 9 * rows + 4 * tb * oc)


def phase_layer_plan(ic: int, oc: int, s: int, h: int,
                     tb: int = POLY_TB) -> int | None:
    """Smallest power-of-two sub-chunk count that fits VMEM, or None when
    the phase-aligned kernel cannot handle (ic, oc, s, h): needs an even
    size with W = s/(2h) >= 2, h >= 2, >= 4 staged sublane rows, and
    sub-chunks no finer than one lane tile."""
    if s % 2 or h < 2 or (s // 2) % h or s // 2 // h < 2 or tb * ic < 4:
        return None
    m = (s // 2) ** 2
    n_sub = 1
    while m % n_sub == 0 and m // n_sub >= 128:
        if phase_layer_vmem_estimate(ic, oc, s, h, tb, n_sub) \
                <= POLY_VMEM_BUDGET:
            return n_sub
        n_sub *= 2
    return None


@partial(jax.jit, static_argnames=("h", "interpret", "tb", "n_sub"))
def conv_pool_layer_phase(
    x: jax.Array,  # (B, ic, S, S) uint8
    kernel: jax.Array,  # (oc, ic, 3, 3) int8
    shift: jax.Array,  # scalar int32
    *,
    h: int,
    interpret: bool | None = None,
    tb: int | None = None,
    n_sub: int | None = None,
) -> jax.Array:
    """One contract layer (conv3x3 -> >>shift -> clip -> 2x2 maxpool),
    phase-aligned: returns (B, oc, (S/2)^2) uint8 rows equal to
    ``phase_split_nchw(nchw_out, h)`` — the exact input layout of an
    h = 2^n_tail_layers tail megakernel, with no XLA relayout between.
    Bit-exact with ``quant.fixed_point_conv_layer`` (hardware parity in
    the -m tpu lane)."""
    b, ic, s, _ = x.shape
    oc = int(kernel.shape[0])
    if interpret is None:
        interpret = _interpret_default()
    if tb is None:
        tb = POLY_TB
    if n_sub is None:
        n_sub = phase_layer_plan(ic, oc, s, h, tb)
    if n_sub is None or phase_layer_vmem_estimate(
            ic, oc, s, h, tb, n_sub) > POLY_VMEM_BUDGET:
        raise ValueError(
            f"phase-aligned single-layer kernel does not support ic={ic} "
            f"oc={oc} s={s} h={h} tb={tb} n_sub={n_sub}"
        )
    m = (s // 2) ** 2
    w = s // 2 // h
    pb = b
    if b % tb:
        pb = ((b + tb - 1) // tb) * tb
        x = jnp.concatenate(
            [x, jnp.zeros((pb - b, ic, s, s), x.dtype)], axis=0
        )
    x_rows = phase_input_split(x, h)  # (pb, ic, 4m)
    kmat, corr = _pack_blockdiag_poly(kernel, tb)
    out = pl.pallas_call(
        partial(_phase_layer_body, ic=ic, oc=oc, tb=tb, h=h, w=w,
                n_sub=n_sub),
        out_shape=jax.ShapeDtypeStruct((pb * oc, m), jnp.uint8),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(pb // tb,),
            in_specs=[
                pl.BlockSpec((tb, ic, 4 * m), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tb * oc, m), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((9 * tb * ic, m // n_sub), jnp.int8),
            ],
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * ic * oc * s * s * pb,
            bytes_accessed=pb * (ic * s * s + oc * m),
            transcendentals=0,
        ),
        interpret=interpret,
    )(shift.reshape(1).astype(jnp.int32), x_rows, kmat, corr)
    return out.reshape(pb, oc, m)[:b]
