"""Exact IIR filtering as ONE Pallas TPU kernel (pole-diagonalized scan).

The XLA blocked-scan path (ops/iir.py) is exact but overhead-bound: its
zero-state pass is a length-L ``lax.scan`` whose per-step work is tiny
(~1.4 ms / 4.2 M samples regardless of block_len — BASELINE.md). This
kernel removes the sequential scan entirely by diagonalizing the
transposed-DF-II state recurrence

    z[n] = M z[n-1] + c x[n],    y[n] = b0 x[n] + z[n-1][0]

with M = Q diag(p) Q^-1 (p = filter poles, the roots of a(z)): in the
eigenbasis s = Q^-1 z each coordinate follows an independent COMPLEX
FIRST-ORDER recurrence s_k[n] = p_k s_k[n-1] + w_k x[n], and

    y[n] = b0 x[n] + sum_k wgt_k Re(q_k s_k[n-1])   (q = Q[0,:], w = Q^-1 c)

Conjugate pole pairs collapse to one scan each (s of the conjugate pole is
conj(s), so the pair contributes 2 Re(q_k s_k); wgt = 2 for pairs, 1 for
real poles). An order-m filter therefore costs ceil(m/2) fully parallel
first-order scans — each a log2(BN)-step Hillis-Steele over lanes + a
3-step sublane scan, all data-parallel VPU work with ONE HBM read and one
write, plus a sequential-grid carry in VMEM scratch.

Layout: the signal is PREPENDED with zeros to a multiple of 8*BN and
reshaped (rows, BN) row-major — row r of grid step g covers samples
[(8g + r)*BN, +BN). Prepending (instead of appending) makes the exported
final state the true state at sample N-1. The initial state s0 enters by
injection at the last pad position: adding s0 to the drive e there is, by
linearity, identical to starting the recurrence from s0.

This replaces the reference's flagship k_IirOptimized
(/root/reference/src/iir.cu:80-203), which parallelizes by RESETTING the
filter state every 8-32 samples (approximate, src/iir.cu:118-127); this
kernel is exact up to f32 rounding in the diagonalized arithmetic.
Poles must be distinct (repeated poles make M defective) and order <= 8;
other filters fall back to ops/iir.py.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsdr_tpu.backend import is_tpu_backend

_LANE = 128
_SUB = 8
_MAX_PAIRS = 4          # order <= 8
_POLE_SEP_TOL = 1e-6    # fall back to the XLA path below this separation


# ---------------------------------------------------------------------------
# Host-side diagonalization
# ---------------------------------------------------------------------------

class _Diag:
    """Host-side pole decomposition of a (b, a) filter (float64)."""

    __slots__ = ("b0", "poles", "w", "q", "wgt", "qcols", "qinv_rows", "m")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def diagonalize(b, a):
    """(b, a) -> _Diag with one entry per pole-pair representative, or None
    when the filter cannot run on this kernel (repeated/defective poles or
    order outside [1, 8])."""
    b = np.asarray(b, np.float64)
    a = np.asarray(a, np.float64)
    b = b / a[0]
    a = a / a[0]
    m = len(b) - 1
    if not (1 <= m <= 2 * _MAX_PAIRS):
        return None
    # transposed-DF-II state matrix and input vector (ops/iir.py layout)
    M = np.zeros((m, m))
    M[:, 0] = -a[1:]
    for i in range(m - 1):
        M[i, i + 1] = 1.0
    c = b[1:] - a[1:] * b[0]
    vals, vecs = np.linalg.eig(M)
    if m > 1:
        sep = min(abs(vals[i] - vals[j])
                  for i in range(m) for j in range(i + 1, m))
        if sep < _POLE_SEP_TOL:
            return None
    try:
        qinv = np.linalg.inv(vecs)
    except np.linalg.LinAlgError:
        return None
    w_full = qinv @ c.astype(np.complex128)
    q_full = vecs[0, :]
    # one representative per conjugate pair (imag > 0), weight 2 for true
    # pairs, 1 for real poles
    sel, wgt = [], []
    used = np.zeros(m, bool)
    for i in range(m):
        if used[i]:
            continue
        p = vals[i]
        if abs(p.imag) < 1e-12:
            sel.append(i)
            wgt.append(1.0)
            used[i] = True
        else:
            if p.imag < 0:
                continue  # its conjugate partner is the representative
            j = int(np.argmin(np.abs(vals - np.conj(p)) + used * 1e9))
            sel.append(i)
            wgt.append(2.0)
            used[i] = used[j] = True
    if len(sel) > _MAX_PAIRS:
        return None
    return _Diag(
        b0=float(b[0]),
        poles=[complex(vals[i]) for i in sel],
        w=[complex(w_full[i]) for i in sel],
        q=[complex(q_full[i]) for i in sel],
        wgt=[float(g) for g in wgt],
        qcols=[vecs[:, i].copy() for i in sel],
        qinv_rows=[qinv[i, :].copy() for i in sel],
        m=m,
    )


def _lane_pow_tables(diag, bn):
    """Per-pole (8, bn) float32 tables of re/im of p^l, rows replicated so
    the kernel multiplies without any sublane slicing."""
    l = np.arange(bn)
    out = []
    for p in diag.poles:
        pw = np.power(np.complex128(p), l)
        out.append(np.broadcast_to(
            pw.real.astype(np.float32), (_SUB, bn)).copy())
        out.append(np.broadcast_to(
            pw.imag.astype(np.float32), (_SUB, bn)).copy())
    return out


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _iir_kernel(*refs, bn, log_bn, pairs, b0, inj_r, inj_l):
    """One (8, BN) tile: per-pole lane scan + sublane scan + grid carry.

    refs: x, powl_re_0, powl_im_0, ..., s0, y, sf, carry (scratch).
    pairs: static tuple of (p, w, q, wgt) per pole representative.
    (inj_r, inj_l): static position of the last pad zero — the initial
    state is injected there (block 0 only).

    Carry layout: (8, 128) scratch, row 0, lane 2k/2k+1 = re/im of pole
    k's state after the last processed sample (lane-offset scalar slices
    are the pattern hardware-proven in fm_chain_pallas's carry).
    """
    n_pairs = len(pairs)
    x_ref = refs[0]
    powl = refs[1:1 + 2 * n_pairs]
    s0_ref = refs[1 + 2 * n_pairs]
    y_ref = refs[2 + 2 * n_pairs]
    sf_ref = refs[3 + 2 * n_pairs]
    carry_ref = refs[4 + 2 * n_pairs]

    i = pl.program_id(0)
    n_i = pl.num_programs(0)
    x = x_ref[:, :]
    is_first = (i == 0).astype(jnp.float32)

    @pl.when(i == 0)
    def _():
        carry_ref[:, :] = s0_ref[:, :]

    row_io = jax.lax.broadcasted_iota(jnp.int32, (_SUB, bn), 0)
    lane_io = jax.lax.broadcasted_iota(jnp.int32, (_SUB, bn), 1)
    mask_inj = jnp.where(
        (row_io == inj_r) & (lane_io == inj_l), 1.0, 0.0)
    mask_00 = jnp.where((row_io == 0) & (lane_io == 0), 1.0, 0.0)

    y = b0 * x
    new_carry = []
    for k, (p, w, q, wgt) in enumerate(pairs):
        pr, pim = float(p.real), float(p.imag)
        c_re = carry_ref[_SUB - 1:_SUB, 2 * k:2 * k + 1]  # (1, 1), row 7
        c_im = carry_ref[_SUB - 1:_SUB, 2 * k + 1:2 * k + 2]
        # block 0 injects s0 at the last pad zero; later blocks inject
        # p * carry at (0, 0) — both are "state before the first sample
        # this block owns", folded into the drive by linearity
        l_re, l_im = _cmul(c_re, c_im, pr, pim)
        mask = is_first * mask_inj + (1.0 - is_first) * mask_00

        # Mosaic has no combined sublane+lane broadcast lowering for
        # (1,1)->(8,BN); stage through a (1,BN) row with a non-foldable
        # where (a multiply by ones gets canonicalized away)
        def rowcast(v):
            return jnp.where(lane_io[0:1, :] >= 0, v, 0.0)

        vr = rowcast(is_first * c_re + (1.0 - is_first) * l_re)
        vi = rowcast(is_first * c_im + (1.0 - is_first) * l_im)
        e_re = float(w.real) * x + mask * vr
        e_im = float(w.imag) * x + mask * vi

        # ---- lane Hillis-Steele: zs[r, l] = sum_{j<=l} p^(l-j) e[r, j]
        zr, zim = e_re, e_im
        sp_r, sp_i = pr, pim
        for s_idx in range(log_bn):
            s = 1 << s_idx
            shr = jnp.concatenate(
                [jnp.zeros((_SUB, s), jnp.float32), zr[:, :bn - s]], axis=1)
            shi = jnp.concatenate(
                [jnp.zeros((_SUB, s), jnp.float32), zim[:, :bn - s]], axis=1)
            tr, ti = _cmul(shr, shi, sp_r, sp_i)
            zr = zr + tr
            zim = zim + ti
            if s_idx + 1 < log_bn:
                sp_r, sp_i = _cmul(sp_r, sp_i, sp_r, sp_i)

        # ---- sublane scan over row totals with multiplier p^bn:
        # RS[r] = end-of-row state (carry already inside e). Operate on
        # full (8, 128) lane slabs — width-1 sublane concats hit a Mosaic
        # "offset mismatch" tiny-tile limitation; only lane 127 (the last
        # sample of each row) is meaningful, the rest is dead freight.
        pbn = np.complex128(p) ** bn
        rr = zr[:, bn - _LANE:bn]
        ri = zim[:, bn - _LANE:bn]
        sp = pbn
        for s_idx in range(3):
            s = 1 << s_idx
            shr = jnp.concatenate(
                [jnp.zeros((s, _LANE), jnp.float32), rr[:_SUB - s]], axis=0)
            shi = jnp.concatenate(
                [jnp.zeros((s, _LANE), jnp.float32), ri[:_SUB - s]], axis=0)
            tr, ti = _cmul(shr, shi, float(sp.real), float(sp.imag))
            rr = rr + tr
            ri = ri + ti
            if s_idx + 1 < 3:
                sp = sp * sp
        # row-start states T_r = RS[r-1], as (8, 1) lane-127 slices
        ts_re = jnp.concatenate(
            [jnp.zeros((1, _LANE), jnp.float32), rr[:_SUB - 1]], axis=0)
        ts_im = jnp.concatenate(
            [jnp.zeros((1, _LANE), jnp.float32), ri[:_SUB - 1]], axis=0)
        t_re = ts_re[:, _LANE - 1:_LANE]
        t_im = ts_im[:, _LANE - 1:_LANE]

        # ---- s[n-1] per element: lane-shifted zs + p^l * T_r
        zs_pr = jnp.concatenate(
            [jnp.zeros((_SUB, 1), jnp.float32), zr[:, :bn - 1]], axis=1)
        zs_pi = jnp.concatenate(
            [jnp.zeros((_SUB, 1), jnp.float32), zim[:, :bn - 1]], axis=1)
        tr, ti = _cmul(t_re, t_im, powl[2 * k][:, :], powl[2 * k + 1][:, :])
        sp_re = zs_pr + tr
        sp_im = zs_pi + ti
        # s[n-1] at this block's (0, 0) is the carry itself — the drive
        # injection above only reaches s[0] onward (block 0's pad region
        # needs no such term: its outputs are discarded)
        sp_re = sp_re + mask_00 * rowcast((1.0 - is_first) * c_re)
        sp_im = sp_im + mask_00 * rowcast((1.0 - is_first) * c_im)

        y = y + wgt * (float(q.real) * sp_re - float(q.imag) * sp_im)
        new_carry.append((rr[:, _LANE - 1:_LANE], ri[:, _LANE - 1:_LANE]))

    y_ref[:, :] = y
    # carry column 2k/2k+1 = re/im RS column for pole k; only row 7 (the
    # block-final state) is read back
    for k, (cr, ci) in enumerate(new_carry):
        carry_ref[:, 2 * k:2 * k + 1] = cr
        carry_ref[:, 2 * k + 1:2 * k + 2] = ci

    @pl.when(i == n_i - 1)
    def _():
        sf_ref[:, :] = carry_ref[:, :]


@functools.partial(
    jax.jit,
    static_argnames=("bn", "log_bn", "pairs", "b0", "inj_r", "inj_l",
                     "interpret"))
def _run(x2, powls, s0, *, bn, log_bn, pairs, b0, inj_r, inj_l, interpret):
    rows_total = x2.shape[0]
    kernel = functools.partial(
        _iir_kernel, bn=bn, log_bn=log_bn, pairs=pairs, b0=b0,
        inj_r=inj_r, inj_l=inj_l)
    vm = pltpu.VMEM
    table_specs = [
        pl.BlockSpec((_SUB, bn), lambda i: (0, 0), memory_space=vm)
        for _ in powls
    ]
    return pl.pallas_call(
        kernel,
        grid=(rows_total // _SUB,),
        in_specs=[
            pl.BlockSpec((_SUB, bn), lambda i: (i, 0), memory_space=vm),
            *table_specs,
            pl.BlockSpec((_SUB, _LANE), lambda i: (0, 0), memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((_SUB, bn), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((_SUB, _LANE), lambda i: (0, 0), memory_space=vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows_total, bn), jnp.float32),
            jax.ShapeDtypeStruct((_SUB, _LANE), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((_SUB, _LANE), jnp.float32)],
        interpret=interpret,
    )(x2, *powls, s0)


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

def iir_pallas_supported(b, a):
    """True when (b, a) — static (non-traced) coefficients — can run on the
    pole-diagonalized kernel: order in [1, 8] with distinct poles."""
    try:
        b = np.asarray(b, np.float64)
        a = np.asarray(a, np.float64)
    except (TypeError, ValueError):
        return False
    if b.ndim != 1 or a.ndim != 1 or b.shape != a.shape:
        return False
    return diagonalize(b, a) is not None


def iir_pallas(b, a, x, zi=None, block_n=8192, interpret=False):
    """Exact IIR along a 1-D float32 signal via the diagonalized kernel.

    ``b``/``a`` must be concrete (numpy/sequence) coefficients — the pole
    decomposition happens host-side in float64. ``zi`` / the returned
    final state are transposed-DF-II vectors, interchangeable with
    ops/iir.py's iir_block states. Returns (y, z_final).
    """
    diag = diagonalize(b, a)
    if diag is None:
        raise ValueError("iir_pallas requires order 1..8 with distinct "
                         "poles; use ops.iir.iir_block instead")
    interpret = interpret or not is_tpu_backend()
    x = jnp.asarray(x, jnp.float32)
    if x.ndim != 1:
        raise ValueError("iir_pallas takes a 1-D signal; batched input "
                         "goes through ops.iir.iir_block")
    n = int(x.shape[0])
    bn = int(block_n)
    while bn > _LANE and bn * _SUB > 2 * max(n, 1):
        bn //= 2
    tile = _SUB * bn
    npad = -(-max(n, 1) // tile) * tile
    if npad == n:
        npad += tile  # force pad >= 1: the injection needs a pad slot
    pad = npad - n
    x2 = jnp.pad(x, (pad, 0)).reshape(npad // bn, bn)

    # initial diagonal state s0 = Q^-1 zi, packed row 7 / lanes 2k, 2k+1
    # (row 7 is where the kernel's carry column holds the block-final state)
    s0 = jnp.zeros((_SUB, _LANE), jnp.float32)
    if zi is not None:
        zi = jnp.asarray(zi, jnp.float32).reshape(diag.m)
        for k in range(len(diag.poles)):
            qr = jnp.asarray(diag.qinv_rows[k].real, jnp.float32)
            qi = jnp.asarray(diag.qinv_rows[k].imag, jnp.float32)
            s0 = s0.at[_SUB - 1, 2 * k].set(jnp.dot(qr, zi))
            s0 = s0.at[_SUB - 1, 2 * k + 1].set(jnp.dot(qi, zi))

    pairs = tuple(
        (diag.poles[k], diag.w[k], diag.q[k], diag.wgt[k])
        for k in range(len(diag.poles)))
    powls = tuple(jnp.asarray(t) for t in _lane_pow_tables(diag, bn))

    y2, sf = _run(
        x2, powls, s0,
        bn=bn, log_bn=int(np.log2(bn)), pairs=pairs, b0=diag.b0,
        inj_r=(pad - 1) // bn, inj_l=(pad - 1) % bn, interpret=interpret)
    y = y2.reshape(npad)[pad:]

    # final TDF-II state: z = sum_k wgt_k Re(Qcol_k s_k)
    zf = jnp.zeros((diag.m,), jnp.float32)
    for k in range(len(pairs)):
        qcr = jnp.asarray(diag.qcols[k].real, jnp.float32)
        qci = jnp.asarray(diag.qcols[k].imag, jnp.float32)
        zf = zf + diag.wgt[k] * (qcr * sf[_SUB - 1, 2 * k]
                                 - qci * sf[_SUB - 1, 2 * k + 1])
    return y, zf
