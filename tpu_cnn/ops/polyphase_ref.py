"""Polyphase megakernel algebra — numpy reference for the round-2 kernel.

The full-net megakernel (activations never leave VMEM) is blocked on Mosaic's
lane-gather bug (docs/DESIGN.md): 2x2 pooling needs lane compaction, which is
inexpressible. This module works the problem around the compiler: decompose
the image into 2^L x 2^L phases (L = number of pooling stages ahead) laid out
as whole 256-lane blocks. Then, for every layer:

  * conv taps  = one global lane ROLL of the phase-blocked row (the tap's
    (dy, dx) becomes a cyclic shift of the phase grid) + per-wrapped-block
    corrective rolls/selects + static edge masks — all ops Mosaic supports;
  * 2x2 pool   = elementwise max over the 4 phase blocks whose lowest
    (ry, rx) bits differ, then compaction by ~n_phases/4 whole-block copies
    (static 256-lane block slices -> stores), not per-lane gathers.

Each pooling halves the phase grid; after the last layer exactly one phase
remains and its flat (Y, X) order IS the reference feature layout.

Everything here is plain numpy operating on the same 2D (rows, lanes) views
the kernel will use, restricted to kernel-legal primitives (roll, slice,
where, matmul, block store). Tests prove bit-parity against the oracle; the
Pallas port then only has to transcribe, not re-derive.
"""

from __future__ import annotations

import numpy as np

from tpu_cnn.models.cnn import DEFAULT_SHIFTS


def phase_split(img: np.ndarray, g: int) -> np.ndarray:
    """(S, S) -> (1, g*g*m) phase-blocked flat row, m = (S/g)^2.

    Block p = ry*g + rx holds img[gY+ry, gX+rx] at in-block lane Y*(S/g)+X.
    (The kernel receives this from a free XLA-side transpose.)
    """
    s = img.shape[0]
    t = s // g
    v = img.reshape(t, g, t, g).transpose(1, 3, 0, 2)  # (ry, rx, Y, X)
    return v.reshape(1, g * g * t * t)


def phase_merge(row: np.ndarray, g: int, channels: int) -> np.ndarray:
    """(C, g*g*m) phase-blocked -> (C, S, S) spatial (host-side inverse)."""
    c = channels
    m = row.shape[1] // (g * g)
    t = int(round(m**0.5))
    v = row.reshape(c, g, g, t, t).transpose(0, 3, 1, 4, 2)  # (c, Y, ry, X, rx)
    return v.reshape(c, t * g, t * g)


def _tap_fetch(x: np.ndarray, g: int, t: int, ay: int, ax: int) -> np.ndarray:
    """Kernel-legal tap staging: value of input at spatial offset (ay, ax)
    for every output phase/position, from the phase-blocked row x (C, g*g*m).

    Only ops a Mosaic kernel supports: global lane rolls + static masks +
    selects. Per (sy, sx) in {ceil-div combos} there is one corrective roll.
    """
    c, lanes = x.shape
    m = t * t
    n_ph = g * g
    assert lanes == n_ph * m

    # Which (sy, sx) block-carries each output phase needs:
    # source phase ry2 = (ry+ay) mod g with Y-carry sy = floor((ry+ay)/g).
    p = np.arange(lanes)
    blk = p // m
    ry, rx = blk // g, blk % g
    inb = p % m
    Y, X = inb // t, inb % t

    out = np.zeros((c, lanes), dtype=x.dtype)
    for sy in {(ry_ + ay) // g for ry_ in range(g)}:
        for sx in {(rx_ + ax) // g for rx_ in range(g)}:
            # phases whose carries are exactly (sy, sx)
            sel = ((ry + ay) // g == sy) & ((rx + ax) // g == sx)
            # one global roll: out[l] = x[l + R]
            # source flat index = ((ry+ay-g*sy)*g + rx+ax-g*sx)*m
            #                     + (Y+sy)*t + (X+sx)
            # delta vs l = (ay - g*sy)*g*m + (ax - g*sx)*m + sy*t + sx
            r = (ay - g * sy) * g * m + (ax - g * sx) * m + sy * t + sx
            rolled = np.roll(x, -r, axis=1)  # rolled[l] = x[l + r]
            out = np.where(sel[None, :], rolled, out)
    # zero the out-of-image positions: original coords (g*(Y+sy)+ry2, ...)
    # are invalid iff the ORIGINAL tap coordinate leaves [0, S):
    # orig y = g*Y + ry + ay  in [0, g*t)  (same formula pre-carry)
    yy = g * Y + ry + ay
    xx = g * X + rx + ax
    valid = (yy >= 0) & (yy < g * t) & (xx >= 0) & (xx < g * t)
    return np.where(valid[None, :], out, 0)


def conv_layer_polyphase(
    x: np.ndarray,  # (ic, g*g*m) uint8 phase-blocked
    kernel: np.ndarray,  # (oc, ic, 3, 3) int8
    shift: int,
    g: int,
    t: int,
) -> np.ndarray:
    """conv3x3 -> >>shift -> clip, staying in phase layout. (oc, g*g*m)."""
    oc, ic = kernel.shape[:2]
    lanes = x.shape[1]
    xs = np.zeros((9 * ic, lanes), dtype=np.int32)  # kernel: int8 scratch
    for i, (dy, dx) in enumerate((a, b) for a in range(3) for b in range(3)):
        xs[i * ic : (i + 1) * ic] = _tap_fetch(
            x.astype(np.int32), g, t, dy - 1, dx - 1
        )
    kmat = (
        kernel.astype(np.int32).transpose(0, 2, 3, 1).reshape(oc, 9 * ic)
    )  # tap-major/ic-minor, matching the staging order... see note below
    # staging order above is (tap, ic) rows; kmat columns must match:
    # kmat[o, tap*ic + c] = kernel[o, c, dy, dx] — build accordingly:
    kmat = np.transpose(kernel.astype(np.int32), (0, 2, 3, 1)).reshape(oc, 9 * ic)
    acc = kmat @ xs  # (oc, lanes) int32 — the MXU matmul
    return np.clip(acc >> shift, 0, 255).astype(np.uint8)


def pool_polyphase(act: np.ndarray, g: int, t: int) -> np.ndarray:
    """2x2 maxpool in phase layout: (C, g*g*m) -> (C, (g/2)^2*m).

    Pool group for output phase (ry', rx') = input phases
    (2ry'+by, 2rx'+bx), elementwise at the same in-block position. Kernel
    form: 3 global rolls + max, then (g/2)^2 whole-block copies (compaction
    by block slices, never per-lane gathers).
    """
    c, lanes = act.shape
    m = t * t
    g2 = g // 2
    # rolls aligning the (by, bx) siblings onto the (0, 0) block:
    # sibling (by, bx) sits at block offset by*g + bx -> lane offset (by*g+bx)*m
    u = act
    for by, bx in ((0, 1), (1, 0), (1, 1)):
        u = np.maximum(u, np.roll(act, -((by * g + bx) * m), axis=1))
    # valid at blocks with even ry and even rx; compact those blocks
    out = np.zeros((c, g2 * g2 * m), dtype=act.dtype)
    for ry2 in range(g2):
        for rx2 in range(g2):
            src = (2 * ry2) * g + (2 * rx2)
            dst = ry2 * g2 + rx2
            out[:, dst * m : (dst + 1) * m] = u[:, src * m : (src + 1) * m]
    return out


def cnn_forward_polyphase(
    image: np.ndarray,  # (S, S) uint8
    kernels,  # per-layer (oc, ic, 3, 3) int8
    shifts=DEFAULT_SHIFTS,
) -> np.ndarray:
    """Full forward entirely in phase space. Returns (oc_last, (S/2^L)^2) u8
    — identical layout to ``numpy_cnn_forward``."""
    n_layers = len(kernels)
    g = 2**n_layers
    s = image.shape[0]
    t = s // g  # in-block tile side, constant across all layers (16 for stock)
    x = phase_split(image, g)
    for li, k in enumerate(kernels):
        act = conv_layer_polyphase(x, k, int(shifts[li]), g, t)
        x = pool_polyphase(act, g, t)
        g //= 2
    # g == 1: single phase, flat (Y, X) row-major == the feature layout
    return x
