"""Pallas TPU kernel: one-pass fused detection scans.

Replaces three XLA stages of the detection feature engine with a single
forward pass over time (VMEM carries across time blocks):

1. the 17-channel stacked prefix sums (counts / shifted sums / shifted
   sum-of-squares / category-flag counts),
2. the 9-carrier segmented associative scan (running max / first-argmax /
   first- and last-finite indices, reset at run starts),
3. the channel stacking itself (outputs land directly in the (T, NS, C)
   layout the downstream boundary gathers consume).

The derived columns (relSeas, severity, ...) are recomputed in VMEM from
the raw series — cheaper than reading them from HBM. The per-cell shift
constants for the numerically safe single-pass variances are computed in
XLA (tiny column reductions) and passed as a (4, C) input; the anom_plus/
anom_minus day shifts are also prepared in XLA because a forward kernel
cannot see the next block's first row.

Outputs (channel order matches core/features_scan.py exactly):
  P (T, 17, C) float32 — inclusive prefix sums (caller prepends the zero
    row)
  S (T, 8, C) int32 — segmented-scan outputs; channels 0-2 are float32
    bit patterns (relSeas max, severity max, cats max), 3-7 are indices
    (first argmax, first/last finite relSeas, first finite anom_plus,
    last finite anom_minus)
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
NP_ = 17  # prefix channels
NS_ = 8   # segmented channels


def _shift_rows(x, d, neutral):
    """Shift x down by d rows along axis 0, filling with ``neutral``."""
    pad_shape = (d,) + x.shape[1:]
    return jnp.concatenate(
        [jnp.full(pad_shape, neutral, x.dtype), x[:-d]], axis=0)


def _kernel(ts_ref, th_ref, se_ref, ap_ref, am_ref, day_ref, isst_ref,
            shifts_ref, p_ref, s_ref, pcarry, pcomp, fcarry, icarry,
            rcarry, *, T):
    j = pl.program_id(1)
    dtf = jnp.float32
    nan = jnp.float32(jnp.nan)
    neg = jnp.float32(-jnp.inf)
    base = j * TB
    bigi = jnp.int32(4 * T + 64)

    @pl.when(j == 0)
    def _():
        pcarry[...] = jnp.zeros((NP_, LANES), dtf)
        pcomp[...] = jnp.zeros((NP_, LANES), dtf)
        fcarry[...] = jnp.full((3, LANES), neg, dtf)
        icarry[0:1, :] = jnp.zeros((1, LANES), jnp.int32)
        icarry[1:2, :] = jnp.full((1, LANES), bigi)
        icarry[2:3, :] = jnp.full((1, LANES), -1)
        icarry[3:4, :] = jnp.full((1, LANES), bigi)
        icarry[4:5, :] = jnp.full((1, LANES), -1)
        rcarry[...] = jnp.zeros((1, LANES), jnp.int32)

    ts = ts_ref[:]
    th = th_ref[:]
    se = se_ref[:]
    anom_plus = ap_ref[:]
    anom_minus = am_ref[:]
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
    # i1 AND operands with mixed layouts.
    X = jnp.stack([
        fin_rs.astype(dtf), xs_rs, xs_rs * xs_rs,
        fin_rt.astype(dtf), xs_rt, xs_rt * xs_rt,
        fin_sv.astype(dtf), xs_sv, xs_sv * xs_sv,
        fin_ma.astype(dtf), xs_ma, xs_ma * xs_ma,
        jnp.where(cats == 1.0, 1.0, 0.0).astype(dtf),
        jnp.where(cats == 2.0, 1.0, 0.0).astype(dtf),
        jnp.where(cats == 3.0, 1.0, 0.0).astype(dtf),
        jnp.where(cats >= 4.0, 1.0, 0.0).astype(dtf),
        fin_ct.astype(dtf),
    ], axis=1)  # (TB, NP_, LANES)

    # ---- prefix sums: Hillis-Steele within block + carry ------------------
    d = 1
    while d < TB:
        X = X + _shift_rows(X, d, 0.0)
        d *= 2
    carry = pcarry[...]
    p_ref[:] = X + carry[None, :, :]
    # Kahan-compensated carry: accumulating via the (rounded) written
    # prefix row drifts ~eps*|carry| per block over ~115 blocks; tracking
    # the carry exactly with a compensation term removes the random walk
    tot = X[TB - 1]
    y = tot - pcomp[...]
    t = carry + y
    pcomp[...] = (t - carry) - y
    pcarry[...] = t

    # ---- segmented scan (reset at run starts) ------------------------------
    def comb(a, b):
        # the reset channel rides as int32 (Mosaic cannot concatenate or
        # bitcast i1 vector registers)
        av, ai, asv, act, aff, alf, afa, ala, ar = a
        bv, bi, bsv, bct, bff, blf, bfa, bla, br = b
        brb = br != 0
        tb = brb | (bv > av)
        return (
            jnp.where(tb, bv, av), jnp.where(tb, bi, ai),
            jnp.where(brb, bsv, jnp.maximum(asv, bsv)),
            jnp.where(brb, bct, jnp.maximum(act, bct)),
            jnp.where(brb, bff, jnp.minimum(aff, bff)),
            jnp.where(brb, blf, jnp.maximum(alf, blf)),
            jnp.where(brb, bfa, jnp.minimum(afa, bfa)),
            jnp.where(brb, bla, jnp.maximum(ala, bla)),
            ar | br,
        )

    apd = jnp.where(day, anom_plus, nan)
    amd = jnp.where(day, anom_minus, nan)
    state = (
        jnp.where(fin_rs, relSeas, neg),
        idx,
        jnp.where(fin_sv, severity, neg),
        jnp.where(fin_ct, cats, neg),
        jnp.where(fin_rs, idx, bigi),
        jnp.where(fin_rs, idx, jnp.int32(-1)),
        jnp.where(jnp.isfinite(apd), idx, bigi),
        jnp.where(jnp.isfinite(amd), idx, jnp.int32(-1)),
        is_start.astype(jnp.int32),
    )
    neutrals = (neg, jnp.int32(0), neg, neg, bigi, jnp.int32(-1), bigi,
                jnp.int32(-1), jnp.int32(0))
    d = 1
    while d < TB:
        shifted = tuple(_shift_rows(x, d, n)
                        for x, n in zip(state, neutrals))
        state = comb(shifted, state)
        d *= 2

    carry_tuple = (fcarry[0:1, :], icarry[0:1, :], fcarry[1:2, :],
                   fcarry[2:3, :], icarry[1:2, :], icarry[2:3, :],
                   icarry[3:4, :], icarry[4:5, :], rcarry[0:1, :])
    (mv, mi, msv, mct, mff, mlf, mfa, mla, mr) = comb(carry_tuple, state)

    s_ref[:] = jnp.stack([
        lax.bitcast_convert_type(mv, jnp.int32),
        lax.bitcast_convert_type(msv, jnp.int32),
        lax.bitcast_convert_type(mct, jnp.int32),
        mi, mff, mlf, mfa, mla,
    ], axis=1)

    fcarry[0:1, :] = mv[TB - 1:TB, :]
    fcarry[1:2, :] = msv[TB - 1:TB, :]
    fcarry[2:3, :] = mct[TB - 1:TB, :]
    icarry[0:1, :] = mi[TB - 1:TB, :]
    icarry[1:2, :] = mff[TB - 1:TB, :]
    icarry[2:3, :] = mlf[TB - 1:TB, :]
    icarry[3:4, :] = mfa[TB - 1:TB, :]
    icarry[4:5, :] = mla[TB - 1:TB, :]
    rcarry[0:1, :] = mr[TB - 1:TB, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_detect_scans(ts, thresh_t, seas_t, anom_plus, anom_minus, day,
                       is_start, shifts, interpret=False):
    """One-pass prefix + segmented scans. Series inputs (T, C) float32;
    day/is_start (T, C) bool-like; shifts (4, C) float32 per-cell shift
    constants (relSeas, relThresh, severity, mabs order). C % 128 == 0.

    Returns (P (T, 17, C) f32, S (T, 8, C) i32); see module docstring.
    """
    T, C = ts.shape
    assert C % LANES == 0
    nb = -(-T // TB)
    Tp = nb * TB

    def padt(x, fill):
        if Tp == T:
            return x
        return jnp.concatenate(
            [x, jnp.full((Tp - T, C), fill, x.dtype)], axis=0)

    args = [padt(ts.astype(jnp.float32), jnp.nan),
            padt(thresh_t.astype(jnp.float32), jnp.nan),
            padt(seas_t.astype(jnp.float32), jnp.nan),
            padt(anom_plus.astype(jnp.float32), jnp.nan),
            padt(anom_minus.astype(jnp.float32), jnp.nan),
            padt(day.astype(jnp.int8), 0),
            padt(is_start.astype(jnp.int8), 0),
            shifts.astype(jnp.float32)]

    kernel = functools.partial(_kernel, T=T)
    tmap2 = lambda i, j: (j, i)
    tmap3 = lambda i, j: (j, 0, i)
    P, S = pl.pallas_call(
        kernel,
        grid=(C // LANES, nb),
        in_specs=[pl.BlockSpec((TB, LANES), tmap2)] * 7
        + [pl.BlockSpec((4, LANES), lambda i, j: (0, i))],
        out_specs=[
            pl.BlockSpec((TB, NP_, LANES), tmap3),
            pl.BlockSpec((TB, NS_, LANES), tmap3),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, NP_, C), jnp.float32),
            jax.ShapeDtypeStruct((Tp, NS_, C), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((NP_, LANES), jnp.float32),
            pltpu.VMEM((NP_, LANES), jnp.float32),
            pltpu.VMEM((3, LANES), jnp.float32),
            pltpu.VMEM((5, LANES), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(*args)
    return P[:T], S[:T]
