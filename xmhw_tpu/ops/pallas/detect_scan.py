"""Pallas TPU kernel: one-pass fused detection scans.

Replaces three XLA stages of the detection feature engine with a single
forward pass over time (VMEM carries across time blocks):

1. the 17-channel stacked SEGMENTED sums (counts / shifted sums /
   shifted sum-of-squares / category-flag counts, reset at event
   starts) — the value at an event's end row IS the event total, so the
   caller gathers boundaries ONCE (a prefix-sum formulation needed a
   (T+1,·,C) concat plus hi/lo gathers, and a Kahan-compensated carry to
   survive 14.6k-step prefixes; per-segment sums are short, so plain
   f32 is exact enough AND faster),
2. the 9-carrier segmented associative scan (running max / first-argmax /
   first- and last-finite indices, reset at run starts),
3. the channel stacking itself: everything lands in ONE (T, 32, C) int32
   output (float channels as bit patterns; channel 31 is the reset
   carrier, kept so the channel count is a power of two) so the
   downstream boundary gather is a single take_along_axis.

The derived columns (relSeas, severity, anom_plus/minus, ...) are
recomputed in VMEM from the raw series — cheaper than reading them from
HBM (the kernel is DMA-bound). The per-cell shift constants for the
numerically safe single-pass variances are computed in XLA (tiny column
reductions) and passed as a (4, C) input; the one value a forward
kernel cannot see — the NEXT block's first anom row, needed by the -1
day shift — arrives as a tiny (nb, C) input.

Output channels (order matches core/features_scan.py exactly):
  0-16  segmented sums (float32 bit patterns)
  17-19 relSeas max, severity max, cats max (float32 bit patterns)
  20-24 first argmax, first/last finite relSeas, first finite anom_plus,
        last finite anom_minus (int32 indices)
  25-30 VALUE payloads riding the positional carriers (float32 bit
        patterns): relSeas at first/last finite, anom_plus at first
        finite, anom_minus at last finite, relThresh and mabs at the
        argmax day — so the caller never gathers the (T, C) series at
        event positions at all; ONE boundary gather serves everything
  31    int32 reset carrier (padding to a power-of-two channel count)

Write reduction: ``sb`` emits only every sb-th state row (rows after an
event end are bit-identical for up to maxGap+2 rows, so the caller can
gather directly at e // sb), and ``latch`` stacks an END-AWARE fold on
top — one row per group of ``latch`` sub-blocks, picking the sub-block
that contains the group's (unique) event end. At the defaults the
kernel writes (Tp/8, 32, C) instead of (Tp, 32, C).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TB = 128
NP_ = 17  # segmented-sum channels
NS_ = 8   # segmented min/max/argmax channels
NV_ = 6   # value-payload channels
# +1: the reset carrier rides along as channel 31 so the channel count
# is 32 — callers can then view the (rows, 32, C) output as
# (rows/GRP, GRP*32, C) with a PURE reshape and fetch GRP rows per
# boundary-gather index (XLA's gather emitter runs ~2.3x faster on
# flat >=256 B contiguous fetches than on 31 C-strided words; measured
# 8.5 vs 19.3 ms per 4096-cell block, see features_scan.detect_kernel)
NT_ = NP_ + NS_ + NV_ + 1  # total output channels (32)


def _shift_rows(x, d, neutral):
    """Shift x down by d rows along axis 0, filling with ``neutral``."""
    pad_shape = (d,) + x.shape[1:]
    return jnp.concatenate(
        [jnp.full(pad_shape, neutral, x.dtype), x[:-d]], axis=0)


def _kernel(ts_ref, th_ref, se_ref, day_ref, isst_ref, anext_ref,
            shifts_ref, s_ref, pcarry, fcarry, icarry,
            rcarry, acarry, *, T, sb=0, latch=1):
    j = pl.program_id(1)
    dtf = jnp.float32
    nan = jnp.float32(jnp.nan)
    neg = jnp.float32(-jnp.inf)
    base = j * TB
    bigi = jnp.int32(4 * T + 64)

    @pl.when(j == 0)
    def _():
        pcarry[...] = jnp.zeros((NP_, LANES), dtf)
        fcarry[0:3, :] = jnp.full((3, LANES), neg, dtf)
        fcarry[3:9, :] = jnp.full((6, LANES), nan, dtf)
        icarry[0:1, :] = jnp.zeros((1, LANES), jnp.int32)
        icarry[1:2, :] = jnp.full((1, LANES), bigi)
        icarry[2:3, :] = jnp.full((1, LANES), -1)
        icarry[3:4, :] = jnp.full((1, LANES), bigi)
        icarry[4:5, :] = jnp.full((1, LANES), -1)
        rcarry[...] = jnp.zeros((1, LANES), jnp.int32)
        acarry[...] = jnp.full((1, LANES), nan, dtf)

    ts = ts_ref[:]
    th = th_ref[:]
    se = se_ref[:]
    # anom_plus/minus = (ts - seas) shifted +-1 day (reference:
    # features.py:44-46): derived IN KERNEL from the rows already in
    # VMEM instead of reading two more (T, C) float32 inputs from HBM
    # (the kernel is DMA-bound; this cuts its input traffic ~36%). The
    # +1 shift's block-boundary row rides a (1, LANES) carry; the -1
    # shift's comes from `anext` = next block's first anom row,
    # precomputed in XLA from a (nb, C) strided slice (tiny).
    anom = ts - se
    anom_plus = jnp.concatenate([acarry[0:1, :], anom[:-1]], axis=0)
    # anext holds ALL blocks' next-first-anom rows (tiny, (nb, LANES),
    # fetched once per lane tile — Mosaic rejects (1, LANES) blocks);
    # row j is this block's
    arow = anext_ref[pl.ds(j, 1), :]
    anom_minus = jnp.concatenate([anom[1:], arow], axis=0)
    acarry[...] = anom[TB - 1:TB, :]
    day = day_ref[:] != 0
    is_start = isst_ref[:] != 0
    a_rs = shifts_ref[0:1, :]
    a_rt = shifts_ref[1:2, :]
    a_sv = shifts_ref[2:3, :]
    a_ma = shifts_ref[3:4, :]
    idx = lax.broadcasted_iota(jnp.int32, (TB, LANES), 0) + base

    # ---- derived per-day columns (reference: features.py:44-68) ----------
    relSeas = jnp.where(day, ts - se, nan)
    relThresh = jnp.where(day, ts - th, nan)
    th_se = th - se
    relTN = jnp.where(day, relThresh / th_se, nan)
    severity = jnp.where(day, relSeas / -th_se, nan)
    cats = jnp.floor(1.0 + relTN)
    mabs = jnp.where(day, ts, nan)
    fin_rs = jnp.isfinite(relSeas)
    fin_rt = jnp.isfinite(relThresh)
    fin_sv = jnp.isfinite(severity)
    fin_ma = jnp.isfinite(mabs)
    fin_ct = jnp.isfinite(cats)

    def sh(fin, x, a):
        xs = jnp.where(fin, x - a, 0.0).astype(dtf)
        return xs

    xs_rs = sh(fin_rs, relSeas, a_rs)
    xs_rt = sh(fin_rt, relThresh, a_rt)
    xs_sv = sh(fin_sv, severity, a_sv)
    xs_ma = sh(fin_ma, mabs, a_ma)

    # NaN-masked derived columns already imply `day` (cats is NaN on
    # non-event days), so no boolean ANDs are needed — Mosaic mis-lays-out
    # i1 AND operands with mixed layouts. All carriers stay 2D
    # (TB, LANES): Mosaic also rejects i1/maskable 3D reshapes, so the
    # sums ride the SAME tuple-based segmented scan as the min/max
    # channels (shared reset channel) instead of a stacked 3D scan.
    sums = [
        fin_rs.astype(dtf), xs_rs, xs_rs * xs_rs,
        fin_rt.astype(dtf), xs_rt, xs_rt * xs_rt,
        fin_sv.astype(dtf), xs_sv, xs_sv * xs_sv,
        fin_ma.astype(dtf), xs_ma, xs_ma * xs_ma,
        jnp.where(cats == 1.0, 1.0, 0.0).astype(dtf),
        jnp.where(cats == 2.0, 1.0, 0.0).astype(dtf),
        jnp.where(cats == 3.0, 1.0, 0.0).astype(dtf),
        jnp.where(cats >= 4.0, 1.0, 0.0).astype(dtf),
        fin_ct.astype(dtf),
    ]

    # ---- ONE segmented scan: sums + max/argmax + first/last finite +
    #      value payloads ----------------------------------------------------
    def comb(a, b):
        # the reset channel rides as int32 (Mosaic cannot concatenate or
        # bitcast i1 vector registers)
        ar, br = a[-1], b[-1]
        brb = br != 0
        out_sums = tuple(jnp.where(brb, bv, av + bv)
                         for av, bv in zip(a[:NP_], b[:NP_]))
        (av, ai, aprt, apma, asv, act, aff, avff, alf, avlf, afa, avfa,
         ala, avla) = a[NP_:NP_ + 14]
        (bv, bi, bprt, bpma, bsv, bct, bff, bvff, blf, bvlf, bfa, bvfa,
         bla, bvla) = b[NP_:NP_ + 14]
        tb = brb | (bv > av)
        # first-finite payload follows the min-index choice; last-finite
        # follows the max-index choice; at-peak payloads follow tb
        a_first = aff <= bff
        a_first2 = afa <= bfa
        return out_sums + (
            jnp.where(tb, bv, av), jnp.where(tb, bi, ai),
            jnp.where(tb, bprt, aprt), jnp.where(tb, bpma, apma),
            jnp.where(brb, bsv, jnp.maximum(asv, bsv)),
            jnp.where(brb, bct, jnp.maximum(act, bct)),
            jnp.where(brb, bff, jnp.minimum(aff, bff)),
            jnp.where(brb, bvff, jnp.where(a_first, avff, bvff)),
            jnp.where(brb, blf, jnp.maximum(alf, blf)),
            jnp.where(brb, bvlf, jnp.where(blf >= alf, bvlf, avlf)),
            jnp.where(brb, bfa, jnp.minimum(afa, bfa)),
            jnp.where(brb, bvfa, jnp.where(a_first2, avfa, bvfa)),
            jnp.where(brb, bla, jnp.maximum(ala, bla)),
            jnp.where(brb, bvla, jnp.where(bla >= ala, bvla, avla)),
            ar | br,
        )

    apd = jnp.where(day, anom_plus, nan)
    amd = jnp.where(day, anom_minus, nan)
    state = tuple(sums) + (
        jnp.where(fin_rs, relSeas, neg),
        idx,
        relThresh,  # value at running argmax day
        mabs,       # value at running argmax day
        jnp.where(fin_sv, severity, neg),
        jnp.where(fin_ct, cats, neg),
        jnp.where(fin_rs, idx, bigi),
        relSeas,    # value at first finite relSeas
        jnp.where(fin_rs, idx, jnp.int32(-1)),
        relSeas,    # value at last finite relSeas
        jnp.where(jnp.isfinite(apd), idx, bigi),
        apd,        # value at first finite anom_plus
        jnp.where(jnp.isfinite(amd), idx, jnp.int32(-1)),
        amd,        # value at last finite anom_minus
        is_start.astype(jnp.int32),
    )
    neutrals = (jnp.float32(0.0),) * NP_ + (
        neg, jnp.int32(0), nan, nan, neg, neg, bigi, nan, jnp.int32(-1),
        nan, bigi, nan, jnp.int32(-1), nan, jnp.int32(0))

    # Hillis-Steele, with EARLY EXTRACTION under sb: only every sb-th
    # state row is emitted, and after the first log2(sb) rounds row r
    # already holds comb(x[r-sb+1 .. r]) — so rows sb-1::sb are the
    # per-group totals and the REMAINING rounds can run on the
    # (TB/sb, LANES) extracted arrays (1/sb the combine work; the scan
    # rounds are the kernel's compute bound). The extraction itself is
    # static single-row slices + one axis-0 concat per state channel
    # (Mosaic-safe; no strided slicing, no 3-D reshape).
    d = 1
    while d < min(sb or TB, TB):
        shifted = tuple(_shift_rows(x, d, n)
                        for x, n in zip(state, neutrals))
        state = comb(shifted, state)
        d *= 2
    R = TB // sb if sb else TB
    if sb:
        def rows_of(x):
            return jnp.concatenate(
                [x[r * sb + sb - 1: r * sb + sb, :]
                 for r in range(R)], axis=0)

        state = tuple(rows_of(x) for x in state)
        d = 1
        while d < R:
            shifted = tuple(_shift_rows(x, d, n)
                            for x, n in zip(state, neutrals))
            state = comb(shifted, state)
            d *= 2

    carry_tuple = tuple(pcarry[i:i + 1, :] for i in range(NP_)) + (
        fcarry[0:1, :], icarry[0:1, :], fcarry[3:4, :], fcarry[4:5, :],
        fcarry[1:2, :], fcarry[2:3, :], icarry[1:2, :], fcarry[5:6, :],
        icarry[2:3, :], fcarry[6:7, :], icarry[3:4, :], fcarry[7:8, :],
        icarry[4:5, :], fcarry[8:9, :], rcarry[0:1, :])
    out = comb(carry_tuple, state)
    msums = out[:NP_]
    (mv, mi, mprt, mpma, msv, mct, mff, mvff, mlf, mvlf, mfa, mvfa, mla,
     mvla, mr) = out[NP_:]

    def bc(x):
        return lax.bitcast_convert_type(x, jnp.int32)

    channels = ([bc(x) for x in msums]
                + [bc(mv), bc(msv), bc(mct), mi, mff, mlf, mfa, mla,
                   bc(mvff), bc(mvlf), bc(mvfa), bc(mvla), bc(mprt),
                   bc(mpma), mr])  # int32 reset carrier pads to 32 (NT_)

    if latch > 1:
        # END-AWARE LATCH: consecutive event ends are >= latch*sb rows
        # apart (caller guarantees it from minDuration/maxGap), so each
        # group of `latch` sub-blocks holds AT MOST ONE event end — emit
        # one row per group: the final state of the sub-block containing
        # the end (rows e..e+sb-1 after an end e are bit-identical, the
        # existing fold identity), defaulting to the group's last
        # sub-block when no end is detected (such rows are never
        # gathered; an end at the block's last row is undetectable
        # in-block but always lands in that default sub-block). Halves
        # (at latch=2) the kernel's dominant HBM write and the
        # downstream gather/relayout traffic.
        one = jnp.int32(1)
        di = day_ref[:].astype(jnp.int32)
        ie = di * (one - jnp.concatenate(
            [di[1:], jnp.zeros((1, LANES), jnp.int32)], axis=0))
        c = ie
        d2 = 1
        while d2 < sb:
            c = c + _shift_rows(c, d2, jnp.int32(0))
            d2 *= 2
        # per-sub-block end counts (row r*sb+sb-1 of c sums its sb rows)
        ef = jnp.concatenate(
            [c[r * sb + sb - 1: r * sb + sb, :] for r in range(R)],
            axis=0)  # (R, LANES)
        Rm = R // latch

        def grows(x, s):  # rows s, s+latch, ... of x -> (Rm, LANES)
            return jnp.concatenate(
                [x[g * latch + s: g * latch + s + 1, :]
                 for g in range(Rm)], axis=0)

        sel = []
        taken = jnp.zeros((Rm, LANES), jnp.int32)
        for s in range(latch):
            if s < latch - 1:
                here = jnp.where(grows(ef, s) > 0, one, jnp.int32(0)) \
                    * (one - taken)
            else:
                here = one - taken
            sel.append(here > 0)
            taken = taken + here

        def latched(x):
            acc = grows(x, latch - 1)
            for s in range(latch - 1):
                acc = jnp.where(sel[s], grows(x, s), acc)
            return acc

        channels = [latched(x) for x in channels]
    s_ref[:] = jnp.stack(channels, axis=1)

    for i in range(NP_):
        pcarry[i:i + 1, :] = msums[i][R - 1:R, :]
    for r, x in ((0, mv), (1, msv), (2, mct), (3, mprt), (4, mpma),
                 (5, mvff), (6, mvlf), (7, mvfa), (8, mvla)):
        fcarry[r:r + 1, :] = x[R - 1:R, :]
    for r, x in ((0, mi), (1, mff), (2, mlf), (3, mfa), (4, mla)):
        icarry[r:r + 1, :] = x[R - 1:R, :]
    rcarry[0:1, :] = mr[R - 1:R, :]


@functools.partial(jax.jit, static_argnames=("interpret", "sb", "latch"))
def fused_detect_scans(ts, thresh_t, seas_t, day,
                       is_start, shifts, interpret=False, sb=0, latch=1):
    """One-pass segmented sums + segmented min/max scans. Series inputs
    (T, C) float32; day/is_start (T, C) bool-like; shifts (4, C) float32
    per-cell shift constants (relSeas, relThresh, severity, mabs order).
    The anom_plus/anom_minus day-shifted series are derived in-kernel
    (one carried row + a (nb, C) next-block-row input). C % 128 == 0.

    Returns S (Tp, 32, C) int32 where Tp >= T is T padded to a TB
    multiple — callers gather at row positions < T, so the pad rows are
    never read and slicing them off here would only force XLA to copy
    the multi-GB buffer. Channels 0..30 per the module docstring;
    channel 31 is the int32 reset carrier, emitted so the channel count
    is a power of two (the caller's grouped boundary gather needs a
    pure-view reshape; see NT_).

    ``sb`` > 0 (a divisor of TB): emit only each sb-row sub-block's
    final scan state — (Tp/sb, 32, C), sb-times less HBM write traffic.
    Two consumers:

    * FOLD (default TPU path, features_scan.detect_kernel): with
      sb <= maxGap+2 the state rows e..e+sb-1 after an event end e are
      bit-identical (the combine is an identity on non-event rows and
      the next reset is > maxGap rows away), so sub-block-final rows
      can be gathered DIRECTLY at e // sb — no recombination.
    * CHECKPOINT (``pallas_sb``, measured slower, kept as blueprint):
      recombine the state at arbitrary rows from the checkpoints + the
      raw series (features_scan._ckpt_recombine).

    ``latch`` > 1 (sb must be > 0): emit ONE row per group of ``latch``
    sub-blocks — the final state of the sub-block holding the group's
    event end (see the END-AWARE LATCH comment in the kernel). Only
    valid when consecutive event ends are >= latch*sb rows apart
    (minDuration + maxGap + 1 at the defaults); the caller computes it.
    Output is (Tp/(sb*latch), 32, C); gather at e // (sb*latch).
    """
    T, C = ts.shape
    assert C % LANES == 0
    assert sb == 0 or TB % sb == 0
    assert latch == 1 or (sb > 0 and (TB // sb) % latch == 0)
    nb = -(-T // TB)
    Tp = nb * TB

    def padt(x, fill):
        if Tp == T:
            return x
        return jnp.concatenate(
            [x, jnp.full((Tp - T, C), fill, x.dtype)], axis=0)

    tsf = padt(ts.astype(jnp.float32), jnp.nan)
    sef = padt(seas_t.astype(jnp.float32), jnp.nan)
    # next-block-first anom rows for the in-kernel -1 shift: rows
    # TB, 2*TB, ... of (ts - seas), one NaN row appended for the last
    # block (matches the XLA formulation's trailing-NaN semantics)
    nxt = tsf[TB::TB] - sef[TB::TB]
    anext = jnp.concatenate(
        [nxt, jnp.full((nb - nxt.shape[0], C), jnp.nan, jnp.float32)],
        axis=0)
    args = [tsf,
            padt(thresh_t.astype(jnp.float32), jnp.nan),
            sef,
            padt(day.astype(jnp.int8), 0),
            padt(is_start.astype(jnp.int8), 0),
            anext,
            shifts.astype(jnp.float32)]

    kernel = functools.partial(_kernel, T=T, sb=sb, latch=latch)
    tmap2 = lambda i, j: (j, i)
    tmap3 = lambda i, j: (j, 0, i)
    out_rows = (TB // sb if sb else TB) // latch
    S = pl.pallas_call(
        kernel,
        grid=(C // LANES, nb),
        in_specs=[pl.BlockSpec((TB, LANES), tmap2)] * 5
        + [pl.BlockSpec((nb, LANES), lambda i, j: (0, i)),
           pl.BlockSpec((4, LANES), lambda i, j: (0, i))],
        out_specs=pl.BlockSpec((out_rows, NT_, LANES), tmap3),
        out_shape=jax.ShapeDtypeStruct((nb * out_rows, NT_, C),
                                       jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((NP_, LANES), jnp.float32),
            pltpu.VMEM((9, LANES), jnp.float32),
            pltpu.VMEM((5, LANES), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return S
