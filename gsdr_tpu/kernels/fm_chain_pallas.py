"""Fully fused FM/AM channelizer chains as ONE Pallas TPU kernel each.

The flagship chain — mix bank + FIR + decimate (complex-tap-bank conv),
LO rotor, quadrature discriminator, first-order IIR de-emphasis — executes
as a single kernel: raw RF is read from HBM once, audio is written once,
and every intermediate (mixed, filtered, demodulated) lives only in VMEM.
This is the TPU counterpart of the reference's single fused k_Fm kernel
(/root/reference/src/fm.cu:21-69) — including its warp-shuffle neighbor
exchange (src/fm.cu:58-64), which here is a carried last-column scratch
that persists across the sequential Pallas grid.

Round-2 restructure — MXU M-dimension stacking. The round-1 kernel
contracted G (2C, 2T) @ W (2T, BM): at C=16 the 32-row M dimension used
1/4 of the 128x128 MXU (measured 2.8x headroom, BASELINE.md). Here R
consecutive decimated outputs are STACKED into the M dimension:

    column J of the window matrix covers R outputs j = J*R + r, and
    G' ((R*2C), K) holds R vertically stacked, horizontally SHIFTED copies
    of the tap bank (output r's taps start at shift-row r), so

    Y (R*2C, BN) = G' @ W'    with W'[g-th group] = xq shifted g coarse cols

at the cost of K = ceil((T/D + R - 1)/R)*R * 2D contraction rows. R
grows until the window rows R*2D reach a full 128-lane vreg (see
_pick_r: the W build moves R*2D-lane slices, and full-lane rows beat
both the K-FLOP overhead and M spilling past the 128-row MXU tile —
flagship C=16/T=64/D=4 runs R=16 with M = 512). The same coarse-column
layout makes D in {1, 2} supported (round-1 required 2D % 8 == 0; now
the alignment unit is R*2D).

Stages per grid step (block of BN coarse columns = R*BN outputs):
  1. stacked window matmul (above), 3-pass bf16x3 / 2-pass bf16x2 / f32.
  2. LO rotor: per-r phasor product of host-exact tables (no per-element
     transcendentals); traced stream offset enters via one (C, 2) phasor.
  3. discriminator: gain * atan2(y[j]*conj(y[j-1])); r=0 takes r=R-1
     shifted one column; the first column uses the carried sample.
  4. de-emphasis z[j] = cc*d[j] + a*z[j-1], y[j] = b0*d[j] + z[j-1]
     decomposed over (J, r): per-column partials (R unrolled fmas), one
     log2(BN)-step Hillis-Steele scan over J with multiplier a^R, then
     per-r reconstruction — exact, matching ops/iir.py bit-for-bit in
     structure (carried state IS the TDF-II z).

The carried state is exactly the unfused pipeline's state pytree
(disc_carry = last filtered sample, deemph_zi = TDF-II state), so the
fused and unfused step functions are interchangeable mid-stream.
"""

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsdr_tpu.backend import is_tpu_backend
from gsdr_tpu.carray import ComplexArray

_LANE = 128
_SUB = 8
_TWO_PI = 6.283185307179586


# ---------------------------------------------------------------------------
# Stacking geometry
# ---------------------------------------------------------------------------

def _pick_r(c_eff, decimation):
    """Stacking factor R (power of two): at least the sublane-alignment
    minimum (R*2D % 8 == 0), then grown while the MXU M-fill win outweighs
    the K-row overhead (G' gains R-1 shift rows), then further while the
    window width R*2D is lane-inefficient."""
    d = int(decimation)
    r = 1
    while (r * 2 * d) % _SUB != 0:
        r *= 2
    # grow while still under the MXU M dim: each doubling doubles fill
    # (2x win) for a (p+2R)/(p+R)-ish K cost (< 2x) — always worth it
    # until R*2C reaches 128.
    while r * 2 * c_eff < _LANE:
        r *= 2
    # keep growing (M spills past 128 — the MXU tiles M fine, and the
    # per-kernel VMEM caps shrink bn to fit) while the window rows R*2D
    # are narrower than a full 128-lane vreg: the per-block W build moves
    # R*2D-lane slices, and narrow slices waste lanes proportionally
    # (8-lane reads run at 1/16 VPU efficiency; the 64-channel chain at
    # R=1/rows=8 spent ~0.5 ms/step in the W build alone). Measured
    # ladders on v5e: flagship (C=16, D=4) 235/175/151/200 us at
    # R=4/8/16/32 (rows 32/64/128/256 — stop at exactly full-lane);
    # 64 channels 635/565/525 us at R=4/8/16 (M = 512/1024/2048: the
    # M growth keeps paying as long as rows stay below 128).
    while (r * 2 * d) < _LANE:
        r *= 2
    return r


def _pick_bn(n_cols, block_cols):
    bn = _LANE
    while bn * 2 <= block_cols and n_cols % (bn * 2) == 0:
        bn *= 2
    return bn


def _ns_candidate(bn_c, requested, auto_cap=8):
    """Overlap split at a candidate block size: 'auto' = min(auto_cap,
    bn/128), demoted until the sub-blocks are lane-aligned.

    auto_cap is front-dependent (round 5): the dense Toeplitz kernel's
    measured optimum is 8 (big K_toe dots to overlap under the VPU
    stages), but the PFB FM front's exact-K dots are tiny — at
    wb64c_t512 the whole fold+DFT phase is ~25-35 us — so an 8-way split
    is pure sub-block granularity overhead. Measured (v5e, 2 rounds):
    wb64c ns8 94-100 us vs ns2 64-79 (and ns1 77-93); oversampled P=4
    ns8 330-339 vs ns2 291-293. PFB FM plans pass auto_cap=2."""
    ns = min(auto_cap, max(1, bn_c // _LANE)) if requested == "auto" \
        else int(requested)
    while ns > 1 and (bn_c % ns != 0 or (bn_c // ns) % _LANE != 0):
        ns //= 2
    return ns


def _resolve_n_sub(bn, requested, fn_name, auto_cap=8):
    """Final n_sub for a plan; warns when an explicit request is demoted
    (shared by all four chain plan builders)."""
    ns = _ns_candidate(bn, requested, auto_cap)
    if requested != "auto" and int(requested) != ns:
        import warnings
        warnings.warn(
            f"{fn_name}: n_sub={requested} cannot split bn={bn} into "
            f"lane-aligned sub-blocks; running n_sub={ns}", stacklevel=3)
    return ns


def _check_pfb_grid(k_grid, decimation, taps):
    """Shared PFB-front geometry validation: returns (kg, d, p_cnt, hp,
    q_fold) or raises with the structural reason (used by both PFB plan
    builders)."""
    d = int(decimation)
    kg = int(k_grid)
    if kg % d != 0:
        raise ValueError(f"PFB front needs D | K (D={d}, K={kg})")
    if kg < _SUB:
        raise ValueError(
            f"PFB front needs K >= {_SUB} (K={kg}: the K-lane window "
            f"planes fall below sublane alignment — use the dense chain)")
    hp = _poly_taps(np.asarray(taps, np.float64), kg)
    q_fold = hp.shape[0]
    if q_fold > 127:
        raise ValueError(
            f"taps span {q_fold} grid periods > 127: the 128-coarse-column "
            f"halo window cannot cover the fold")
    return kg, d, kg // d, hp, q_fold


def _pick_bn_padded(n_j_real, cap_cols, block_n):
    """Block size for the pad-and-mask kernels (round 3): choose bn from
    the VMEM cap FIRST, then pad n_j up to a bn multiple — instead of
    requiring bn | n_j, which collapsed to bn=128 whenever the block
    length had an odd coarse-column count (e.g. N=1e6 at the flagship
    geometry: n_j=15744=128*123 ran a 123-step grid at the minimum
    block). Padding waste is bounded by capping bn at ~n_j/8 (<=12.5%
    discarded columns), floor 128."""
    limit = min(int(cap_cols), int(block_n), max(_LANE, n_j_real // 8))
    bn = _LANE
    while bn * 2 <= limit:
        bn *= 2
    return bn


def _stack_geometry(c_cnt, t, d, m, pad_m=False, r_override=None):
    """(c_eff, R, groups, m_eff) for the stacked contraction, or None if
    the shape cannot run fused. c_eff pads channels to a sublane multiple
    so every in-kernel row slice is 8-aligned.

    ``pad_m``: pad M up to a multiple of R*128 and mask — any M works.
    All fused chains now use it (round 3): the stateless kernels slice
    the padded outputs; the FM chain additionally exports its carried
    state from the last REAL output's (grid step, column, phase) instead
    of the last grid position (_fm_chain_kernel last_i/last_col/last_r).
    pad_m=False keeps the exact-alignment requirement for callers that
    cannot mask.

    ``r_override``: force the stacking factor R instead of _pick_r — the
    MXU floor scales with the Toeplitz span K ~ (p_cnt+R-1)*2D, so
    MXU-bound geometries (large C) can win with a smaller R than the
    full-lane W-build optimum (measurement hook + tuned-geometry knob).
    """
    # T % D != 0 runs via trailing-zero tap padding (round 4): the plan
    # builders pad the bank to a D multiple (output-identical — the extra
    # taps are exact zeros), matching the reference's any-T contract
    # (/root/reference/include/gsdr/fir.h:30-68).
    t = -(-t // d) * d
    c_eff = -(-c_cnt // _SUB) * _SUB
    if r_override is not None:
        r = int(r_override)
        if r < 1 or (r & (r - 1)) or (r * 2 * d) % _SUB != 0:
            raise ValueError(
                f"r_stack={r} must be a power of two with R*2D "
                f"sublane-aligned (D={d})")
        if r * 2 * d > 4 * _LANE:
            raise ValueError(
                f"r_stack={r} gives window rows R*2D={r * 2 * d} > "
                f"{4 * _LANE}: past 4 full-lane vregs the VMEM footprint "
                f"floors bn at 128 and the geometry only loses (measured "
                f"R ladders in BASELINE.md)")
        if not pad_m and m % (r * _LANE) != 0:
            raise ValueError(
                f"r_stack={r} cannot be honored with pad_m=False: M={m} "
                f"is not a multiple of R*128={r * _LANE}")
    else:
        r = _pick_r(c_eff, d)
    if not pad_m:
        while r > 1 and (m % (r * _LANE) != 0):
            r //= 2
        if m % (r * _LANE) != 0 or (r * 2 * d) % _SUB != 0:
            return None
    p_cnt = t // d
    groups = -(-(p_cnt + r - 1) // r)
    # keep K a multiple of 16 so the bf16 operand tiles cleanly
    while (groups * r * 2 * d) % 16 != 0:
        groups += 1
    if groups > _LANE:
        return None  # halo window (128 coarse cols) cannot cover the taps
    m_eff = -(-m // (r * _LANE)) * (r * _LANE) if pad_m else m
    return c_eff, r, groups, m_eff


def fused_chain_supported(decimation, num_taps, m_out, num_channels=16,
                          pad_m=True):
    """True when the fused single-kernel chain can run this shape: the
    taps (zero-padded up to a D multiple, round 4 — any T works) must fit
    the 128-coarse-column halo window. With the default pad-and-mask
    (round 3) any M works; pad_m=False restores the old exact
    M % (R*128) == 0 requirement."""
    return _stack_geometry(int(num_channels), int(num_taps),
                           int(decimation), int(m_out),
                           pad_m=pad_m) is not None


def _g_matrix_stacked(kernel_np, decimation, c_eff, r_stack, groups,
                      order="interleaved"):
    """(2C, 2, T) conv kernel -> G' (R*2C_eff, K) stacked contraction matrix.

    Row r*2C + c is the re (c < C_eff) / im (c >= C_eff) plane of channel c
    for output phase r. Column order matches the in-kernel window build:

      'interleaved' (flat/t32/tiled xq): column s*2D + p*2 + plane
        multiplies xq[(s%R)*2D + p*2 + plane, J + s//R]
        = plane(x[(J*R + s)*D + p]) — tap t = (s-r)*D + p of j = J*R + r.
      'planar' (nt xq): column (s//R)*(R*2D) + plane*(R*D) + (s%R)*D + p —
        the W'^T layout built from two separate re/im planes (lane-concat
        [re(R*D) | im(R*D)], sublane-shifted per group)."""
    k2c, _, t = kernel_np.shape
    c_cnt = k2c // 2
    d = int(decimation)
    p_cnt = t // d
    s_tot = groups * r_stack
    g = np.zeros((r_stack * 2 * c_eff, s_tot * 2 * d), np.float32)
    for r in range(r_stack):
        for s in range(r, min(r + p_cnt, s_tot)):
            k = s - r
            for p in range(d):
                for plane in range(2):
                    if order == "planar":
                        col = ((s // r_stack) * (r_stack * 2 * d)
                               + plane * (r_stack * d) + (s % r_stack) * d
                               + p)
                    else:
                        col = s * 2 * d + p * 2 + plane
                    row0 = r * 2 * c_eff
                    g[row0:row0 + c_cnt, col] = \
                        kernel_np[0::2, plane, k * d + p]
                    g[row0 + c_eff:row0 + c_eff + c_cnt, col] = \
                        kernel_np[1::2, plane, k * d + p]
    return g


def _xq_prep(buf, d, r_stack, n_coarse_total, mode="flat"):
    """Planar (Nb,) RF -> windowable input with logical value
    xq[u*2D + p*2 + plane, J] = plane(x[(J*R + u)*D + p]):

      'flat'  — (R*2D, n_coarse_total): the direct form, but producing it
                costs a narrow (n_coarse, 32) -> (32, n_coarse) XLA
                transpose measured at ~160 us / 2^20 samples on v5e
                (~47% of the whole fused step; benchmarks/ablate_chain.py).
      'nt'    — a PAIR of (n_coarse_total, R*D) planes (re, im): pad +
                free reshape ONLY — no XLA relayout of any kind (measured:
                every narrow-minor-dim XLA op above runs at 1/8-1/4 lane
                efficiency, ~160 us / 2^20 samples; this mode is ~0). The
                kernel lane-concats the planes and contracts the window
                matrix TRANSPOSED via an NT dot_general (MXU hardware
                takes the transposed RHS). Requires 'planar' G' order.

    (Two further modes, 't32' in-kernel transpose and 'tiled' XLA tile
    transpose, measured 382/333 us vs nt's 248 in round 2 and were
    dropped in round 3 — CLAUDE.md "tried and rejected".)
    """
    rows = r_stack * 2 * d
    need = n_coarse_total * r_stack * d
    n = buf.shape[-1]
    xr = jnp.pad(buf.re, (0, max(0, need - n)))[:need]
    xi = jnp.pad(buf.im, (0, max(0, need - n)))[:need]
    if mode == "nt":
        return (xr.reshape(n_coarse_total, r_stack * d),
                xi.reshape(n_coarse_total, r_stack * d))
    if mode == "ntc":
        # 'nt' with the [re | im] lane-concat done ONCE in XLA instead of
        # per grid step in VMEM (round 4): one (n_coarse, R*2D) operand;
        # same G' 'planar' column order.
        return jnp.concatenate(
            [xr.reshape(n_coarse_total, r_stack * d),
             xi.reshape(n_coarse_total, r_stack * d)], axis=1)
    xp = jnp.stack(
        [xr.reshape(n_coarse_total, r_stack * d),
         xi.reshape(n_coarse_total, r_stack * d)],
        axis=-1,
    ).reshape(n_coarse_total, rows)
    return xp.T


def _n_xq_parts(xq_mode):
    """How many pallas operands carry the window input (and halo each)."""
    return 2 if xq_mode == "nt" else 1


def _build_v(xq_refs, halo_refs, xq_mode):
    """Window source from the mode-specific block refs: (R*2D, bn + 128)
    for the dot-from-the-left modes, or TRANSPOSED (bn + 128, R*2D) for
    'nt'/'ntc' (consumed by the NT dot_general)."""
    if xq_mode == "nt":
        xr, xi = xq_refs
        hr, hi = halo_refs
        return jnp.concatenate(
            [jnp.concatenate([xr[:, :], xi[:, :]], axis=1),
             jnp.concatenate([hr[:, :], hi[:, :]], axis=1)], axis=0)
    (xq_ref,), (halo_ref,) = xq_refs, halo_refs
    if xq_mode == "ntc":
        return jnp.concatenate([xq_ref[:, :], halo_ref[:, :]], axis=0)
    return jnp.concatenate([xq_ref[:, :], halo_ref[:, :]], axis=1)


def _xq_specs(xq_mode, rows, bn):
    """([xq BlockSpecs], [halo BlockSpecs]) for the chosen input layout."""
    vm = pltpu.VMEM
    if xq_mode == "nt":
        rd = rows // 2
        xs = pl.BlockSpec((bn, rd), lambda i: (i, 0), memory_space=vm)
        hs = pl.BlockSpec((_LANE, rd),
                          lambda i: ((i * bn) // _LANE + bn // _LANE, 0),
                          memory_space=vm)
        return [xs, xs], [hs, hs]
    if xq_mode == "ntc":
        xs = pl.BlockSpec((bn, rows), lambda i: (i, 0), memory_space=vm)
        hs = pl.BlockSpec((_LANE, rows),
                          lambda i: ((i * bn) // _LANE + bn // _LANE, 0),
                          memory_space=vm)
        return [xs], [hs]
    return ([pl.BlockSpec((rows, bn), lambda i: (0, i),
                          memory_space=vm)],
            [pl.BlockSpec((rows, _LANE),
                          lambda i: (0, (i * bn) // _LANE + bn // _LANE),
                          memory_space=vm)])


def _n_coarse_of(xq, xq_mode):
    """Total coarse-column count of a mode-laid-out xq array (for 'nt',
    pass one of the two plane arrays)."""
    return xq.shape[1] if xq_mode == "flat" else xq.shape[0]


def _split_g(g, precision):
    """Host-side (hi, lo) bf16 split (or f32 passthrough) of G'.

    Returns NUMPY arrays (ml_dtypes bf16): plan tables must stay host
    constants — converting via jnp.asarray under an active jit trace
    yields a tracer in current JAX, which breaks plan reuse."""
    import ml_dtypes

    if precision in ("bf16x3", "bf16x2"):
        gh_np = g.astype(ml_dtypes.bfloat16)
        gl_np = (g - gh_np.astype(np.float32)).astype(ml_dtypes.bfloat16)
        return gh_np, gl_np, precision
    return g, np.zeros_like(g), "f32"


_NT_DIMS = (((1,), (1,)), ((), ()))  # contract lhs dim1 x rhs dim1 (A @ B^T)


def _nt_grade_dot(w, gh_ref, gl_ref, f32_dot):
    """bf16x3 / bf16x2 / f32-HIGHEST NT contraction of a VMEM window value
    ``w`` (bn, K) with the hi/lo-split tap matrix — the precision-grade arm
    of _window_dot, shared with the PFB fold front (round 4)."""
    if f32_dot == "f32":
        return jax.lax.dot_general(
            gh_ref[:, :], w, _NT_DIMS,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, _NT_DIMS, preferred_element_type=jnp.float32)

    wh = w.astype(jnp.bfloat16)
    y = dot(gh_ref[:, :], wh)
    y += dot(gl_ref[:, :], wh)
    if f32_dot == "bf16x3":
        wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
        y += dot(gh_ref[:, :], wl)
    return y


def _pfb_fold_dot(vr, vi, hp_ref, gh_ref, gl_ref, w_ref, bs, q_fold, kg, d,
                  p_cnt, f32_dot, col_off=0):
    """PFB front (round 4): polyphase fold + one DFT-bank NT dot per output
    phase p, replacing the Toeplitz window copies + G' contraction.

    For channels on the uniform grid f_c = g_c*Fs/K (K = ``kg``), output
    j = J*p_cnt + p of channel c is

        y[c, j] = rotor * sum_v e^{2i pi g_c v/K} A_p[J, v],
        A_p[J, v] = sum_u hp[v, u] * x[(J+u)*K + p*D + v]      (fold)

    with hp[v, u] = h[v + K*u] the (K, Q) polyphase tap matrix. ``vr``/
    ``vi`` are the nt-mode window sources (n_rows, K) — the SAME layout the
    Toeplitz front uses (R*D = P*D = K coarse columns). The fold is Q
    fma'd row-shifted slices per plane (lane-rolled by p*D, with the
    wrapped lanes from the NEXT row); the contraction is an NT dot against
    the (2C, 2K) DFT-bank matrix — K is exact (no Toeplitz zero-padding:
    the structural 2x FLOP overhead of the dense stacked form is gone) and
    the tap length enters only through the Q fold passes, so long
    prototype filters (T = Q*K, the realistic wideband-channelizer case)
    cost Q VPU fmas instead of Q*K MXU columns.

    Returns the list of per-p (2C, bs) products, r-major compatible with
    the Toeplitz front's stacked y (r <-> p).
    """
    span = bs + q_fold                    # rows covering all fold taps
    lane = jax.lax.broadcasted_iota(jnp.int32, (span, kg), 1)
    for p in range(p_cnt):
        off = p * d

        def _rolled(v, off=off):
            # The phase-p window source: lanes rotate by p*D with the
            # wrapped lanes taken from the NEXT row — rolled ONCE per p
            # over the whole (bs + Q)-row span, then the fold uses plain
            # row slices. (Per-tap lane-offset slice concats crash the
            # Mosaic compiler at these shapes — round 4 — and per-tap
            # rolls measured 641 vs 381 us at P=4/Q=8: the roll, not the
            # fma, is the expensive op.)
            cur = v[col_off:col_off + span, :]
            if off == 0:
                return cur
            nxt = v[col_off + 1:col_off + 1 + span, :]
            return jnp.where(lane < kg - off,
                             pltpu.roll(cur, kg - off, axis=1),
                             pltpu.roll(nxt, kg - off, axis=1))

        rp_re = _rolled(vr)
        rp_im = _rolled(vi)
        a_re = None
        a_im = None
        for u in range(q_fold):
            h_u = hp_ref[u:u + 1, :]          # (1, K) lane-wise tap row
            a_re = (rp_re[u:u + bs, :] * h_u if a_re is None
                    else a_re + rp_re[u:u + bs, :] * h_u)
            a_im = (rp_im[u:u + bs, :] * h_u if a_im is None
                    else a_im + rp_im[u:u + bs, :] * h_u)
        # All P folds stage into ONE (P*bs, 2K) scratch so the whole
        # sub-block contracts as a single batched NT dot (N = P*bs) —
        # one MXU launch instead of P, and the per-p y values never
        # coexist (P=16 at bn=1024/n_sub=8 ran out of VMEM as separate
        # values, crashing the remote compiler)
        if w_ref.dtype == jnp.bfloat16:
            a_re = a_re.astype(jnp.bfloat16)
            a_im = a_im.astype(jnp.bfloat16)
        w_ref[p * bs:(p + 1) * bs, :kg] = a_re
        w_ref[p * bs:(p + 1) * bs, kg:] = a_im
    y_all = _nt_grade_dot(w_ref[:, :], gh_ref, gl_ref, f32_dot)
    return [y_all[:, p * bs:(p + 1) * bs] for p in range(p_cnt)]


def _window_dot(v, gh_ref, gl_ref, w_ref, bn, groups, rows, f32_dot,
                nt=False, col_off=0):
    """Contract the stacked tap bank with ``groups`` full-height shifted
    copies of the window source ``v`` (from _build_v), as bf16x3 / bf16x2 /
    exact f32. Shared by the FM and AM fused kernels.

    nt=False: v is (R*2D, bn+128); W' (K, bn) built by LANE-shifted copies,
    y = G' @ W'. nt=True: v is TRANSPOSED (bn+128, R*2D); W'^T (bn, K)
    built by SUBLANE-shifted copies and contracted as an NT dot_general —
    the MXU consumes the transposed RHS natively, so no transpose exists
    anywhere on the path (the point of the 'nt' input mode).

    ``bn`` is the column count of THIS dot and ``col_off`` the coarse-column
    offset into ``v`` — the intra-step overlap split (n_sub > 1) issues one
    _window_dot per sub-block, each with its own scratch ``w_ref``, before
    any VPU stage runs.

    bf16x2 passes a bf16 ``w_ref``: the window scratch is built directly
    in bf16 (the signal operand is quantized anyway in this grade), which
    halves the vreg traffic of the narrow 32-lane W build."""
    if w_ref.dtype == jnp.bfloat16:
        v = v.astype(jnp.bfloat16)
    # W goes through scratch on purpose: building it as one concatenated
    # value crashes Mosaic's compiler at these sizes in BOTH orientations
    # (tpu_compile_helper exit 1; re-verified for the nt lane-concat form),
    # while per-shift scratch stores lower cleanly.
    if nt:
        for g in range(groups):
            w_ref[:, g * rows:(g + 1) * rows] = \
                v[col_off + g:col_off + g + bn, :]
    else:
        for g in range(groups):
            w_ref[g * rows:(g + 1) * rows, :] = \
                v[:, col_off + g:col_off + g + bn]
    w = w_ref[:, :]

    def dot(a, b):
        if nt:
            return jax.lax.dot_general(
                a, b, _NT_DIMS, preferred_element_type=jnp.float32)
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    if f32_dot == "f32":
        # HIGHEST is load-bearing: Mosaic's dot defaults to bf16 multiply
        # even for f32 operands (measured 2.6e-3 rel err on HW without it)
        if nt:
            return jax.lax.dot_general(
                gh_ref[:, :], w, _NT_DIMS,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        return jnp.dot(gh_ref[:, :], w, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    wh = w.astype(jnp.bfloat16)
    y = dot(gh_ref[:, :], wh)
    y += dot(gl_ref[:, :], wh)
    if f32_dot == "bf16x3":
        wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
        y += dot(gh_ref[:, :], wl)
    # bf16x2: signal quantized to bf16 (~0.2% = -54 dB, below RF ADC noise
    # floors), taps still hi+lo exact — one fewer MXU pass than bf16x3
    return y


# ---------------------------------------------------------------------------
# AM fused chain
# ---------------------------------------------------------------------------

def _am_chain_kernel(*refs, groups, rows, c_eff, r_stack, f32_dot, xq_mode,
                     n_sub=1, front="toeplitz", q_fold=0, k_grid=0, d=0):
    """Fused AM chain: stacked windows+dot + envelope 2*clamp(|.|,0,1)-1
    (the reference's fused k_Am, /root/reference/src/am.cu:21-50). The LO
    window-start rotor is a unit phasor and the envelope is magnitude-only,
    so the rotor drops out entirely — the mixing inside the filter window
    is already in the complex tap bank.

    n_sub: intra-step overlap split (same mechanism as the FM kernel —
    all window dots issued into disjoint scratches before any envelope
    math, so the scheduler overlaps MXU and VPU work).

    front='pfb' (round 4): polyphase fold + DFT-bank dot instead of the
    Toeplitz window contraction (uniform channel grid; see _pfb_fold_dot)."""
    nx = _n_xq_parts(xq_mode)
    xq_refs, halo_refs = refs[:nx], refs[nx:2 * nx]
    base = 2 * nx
    hp_ref = None
    if front == "pfb":
        hp_ref = refs[base]
        base += 1
    gh_ref, gl_ref, audio_ref = refs[base:base + 3]
    w_refs = refs[base + 3:base + 3 + n_sub]
    bn = audio_ref.shape[1]
    bs = bn // n_sub
    if front == "pfb":
        (xr, xi), (hr, hi) = xq_refs, halo_refs
        vr = jnp.concatenate([xr[:, :], hr[:, :]], axis=0)
        vi = jnp.concatenate([xi[:, :], hi[:, :]], axis=0)
        ys = [
            _pfb_fold_dot(vr, vi, hp_ref, gh_ref, gl_ref, w_refs[s], bs,
                          q_fold, k_grid, d, r_stack, f32_dot,
                          col_off=s * bs)
            for s in range(n_sub)
        ]
    else:
        v = _build_v(xq_refs, halo_refs, xq_mode)
        nt = xq_mode in ("nt", "ntc")
        ys = [
            _window_dot(v, gh_ref, gl_ref, w_refs[s], bs, groups, rows,
                        f32_dot, nt=nt, col_off=s * bs)
            for s in range(n_sub)
        ]
    for s in range(n_sub):
        y = ys[s]
        sl = slice(s * bs, (s + 1) * bs)
        for r in range(r_stack):
            row0 = r * 2 * c_eff
            if front == "pfb":
                y_re = y[r][:c_eff, :]
                y_im = y[r][c_eff:, :]
            else:
                y_re = y[row0:row0 + c_eff, :]
                y_im = y[row0 + c_eff:row0 + 2 * c_eff, :]
            mag = jnp.sqrt(y_re * y_re + y_im * y_im)
            audio_ref[r * c_eff:(r + 1) * c_eff, sl] = \
                2.0 * jnp.clip(mag, 0.0, 1.0) - 1.0


@functools.partial(
    jax.jit,
    static_argnames=("block_n", "groups", "rows", "c_eff", "r_stack",
                     "f32_dot", "interpret", "xq_mode", "n_sub",
                     "front", "q_fold", "k_grid", "d_stat"))
def _run_am(xq, gh, gl, hp=None, *, block_n, groups, rows, c_eff, r_stack,
            f32_dot, interpret, xq_mode="flat", n_sub=1,
            front="toeplitz", q_fold=0, k_grid=0, d_stat=0):
    xq_parts = xq if isinstance(xq, tuple) else (xq,)
    n_coarse_total = _n_coarse_of(xq_parts[0], xq_mode)
    k_rows = gh.shape[1]
    n_out = n_coarse_total - _LANE
    bn = block_n
    if bn % n_sub != 0 or (bn // n_sub) % _LANE != 0:
        raise ValueError(f"n_sub={n_sub} must split bn={bn} into "
                         f"lane-aligned sub-blocks")
    kernel = functools.partial(_am_chain_kernel, groups=groups, rows=rows,
                               c_eff=c_eff, r_stack=r_stack, f32_dot=f32_dot,
                               xq_mode=xq_mode, n_sub=n_sub,
                               front=front, q_fold=q_fold, k_grid=k_grid,
                               d=d_stat)
    vm = pltpu.VMEM
    xq_specs, halo_specs = _xq_specs(xq_mode, rows, bn)
    bs = bn // n_sub
    if front == "pfb":
        w_shape = (r_stack * bs, k_rows)
        hp_specs = [pl.BlockSpec(hp.shape, lambda i: (0, 0),
                                 memory_space=vm)]
        hp_args = [hp]
    else:
        w_shape = ((bs, k_rows) if xq_mode in ("nt", "ntc")
                   else (k_rows, bs))
        hp_specs, hp_args = [], []
    w_dtype = jnp.bfloat16 if f32_dot == "bf16x2" else jnp.float32
    return pl.pallas_call(
        kernel,
        grid=(n_out // bn,),
        in_specs=list(xq_specs) + list(halo_specs) + hp_specs + [
            pl.BlockSpec(gh.shape, lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec(gl.shape, lambda i: (0, 0), memory_space=vm),
        ],
        out_specs=pl.BlockSpec((r_stack * c_eff, bn), lambda i: (0, i),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((r_stack * c_eff, n_out), jnp.float32),
        scratch_shapes=[pltpu.VMEM(w_shape, w_dtype) for _ in range(n_sub)],
        interpret=interpret,
    )(*xq_parts, *xq_parts, *hp_args, gh, gl)


def _pad_taps(kernel_np, d):
    """Trailing-zero-pad a (2C, 2, T) bank's taps to a multiple of D.

    Output-identical: the extra taps are exact zeros, so each window only
    grows past its real span into samples multiplied by 0.0 (and the xq
    prep already zero-pads the buffer, so the widest window's extra reads
    are in-bounds). Closes the T % D != 0 fused-dispatch cliff — the
    reference accepts any T (/root/reference/include/gsdr/fir.h:30-68)."""
    t = kernel_np.shape[-1]
    t_pad = -(-t // int(d)) * int(d)
    if t_pad == t:
        return kernel_np
    out = np.zeros(kernel_np.shape[:-1] + (t_pad,), kernel_np.dtype)
    out[..., :t] = kernel_np
    return out


def _dft_bank_stacked(grid_bins, k, c_eff):
    """(2*c_eff, 2K) DFT-bank matrix for the PFB front, planes-major rows
    like _g_matrix_stacked's row groups: rows [0, c_eff) produce the re
    planes, [c_eff, 2*c_eff) the im planes, from A^T = [a_re | a_im]:

      y_re[c] = sum_v cos(2 pi g_c v / K) a_re[v] - sin(...) a_im[v]
      y_im[c] = sum_v sin(2 pi g_c v / K) a_re[v] + cos(...) a_im[v]

    The +sin sign matches make_complex_tap_bank's e^{+2i pi f_c t / Fs}
    with f_c = g_c Fs / K (ops/channelize.py:39-66); angles are exact
    integer fractions (float64 cos/sin)."""
    g = np.zeros((2 * c_eff, 2 * k), np.float64)
    v = np.arange(k)
    for c, gc in enumerate(grid_bins):
        ang = 2.0 * np.pi * ((int(gc) * v) % k) / k
        wr, wi = np.cos(ang), np.sin(ang)
        g[c, :k] = wr
        g[c, k:] = -wi
        g[c_eff + c, :k] = wi
        g[c_eff + c, k:] = wr
    return g.astype(np.float32)


def _poly_taps(taps, k):
    """(Q, K) polyphase tap matrix hp[u, v] = h[v + K u], zero-padded.
    Row-major in u so the kernel reads hp_ref[u:u+1, :] as a lane row."""
    taps_np = np.asarray(taps, np.float64)
    q = -(-len(taps_np) // int(k))
    padded = np.zeros(q * int(k))
    padded[:len(taps_np)] = taps_np
    return padded.reshape(q, int(k)).astype(np.float32)


def _pad_bank(kernel_np, c_eff):
    """Pad a (2C, 2, T) bank with zero-tap channels up to (2*c_eff, 2, T)."""
    k2c, two, t = kernel_np.shape
    c_cnt = k2c // 2
    if c_cnt == c_eff:
        return kernel_np
    out = np.zeros((2 * c_eff, two, t), kernel_np.dtype)
    out[: 2 * c_cnt] = kernel_np
    return out


def _unstack(audio, c_eff, c_cnt, r_stack, m):
    """(R*C_eff, M/R) r-major rows -> (C, M).

    The channel slice happens BEFORE the un-interleave transpose: XLA
    materializes the transpose at full padded width otherwise, so a
    padded channel count (c_cnt < c_eff, e.g. the 1-channel AM receiver
    at c_eff=8) would relayout c_eff/c_cnt times more data than the
    consumer reads (measured 87% of the standalone channelizer step —
    see channelize_pallas.mix_fir_decimate_bank_pallas)."""
    n_j = audio.shape[1]
    a = audio.reshape(r_stack, c_eff, n_j)[:, :c_cnt, :]
    a = jnp.transpose(a, (1, 2, 0)).reshape(c_cnt, n_j * r_stack)
    return a[:, :m]


@dataclasses.dataclass(frozen=True)
class AmChainPlan:
    """Host-side compile plan for the fused AM chain (see FmChainPlan)."""

    d: int
    t: int
    c_cnt: int
    c_eff: int
    r_stack: int
    groups: int
    rows: int
    bn: int
    n_j: int
    m: int
    n_buf: int
    f32_dot: str
    xq_mode: str
    gh: object
    gl: object
    n_sub: int = 1
    # round-4 PFB front (see FmChainPlan)
    front: str = "toeplitz"
    q_fold: int = 0
    k_grid: int = 0
    hp: object = None


def am_chain_plan(kernel_bank, decimation, n_buf, block_n=4096,
                  precision="bf16x3", xq_mode="nt", n_sub="auto",
                  r_stack=None):
    """Host-side plan for the fused AM chain over an n_buf-sample buffer."""
    kh = np.asarray(kernel_bank)
    k2c, _, t = kh.shape
    c_cnt = k2c // 2
    d = int(decimation)
    m = (int(n_buf) - t) // d + 1   # output count from the REAL tap span
    kh = _pad_taps(kh, d)           # T % D != 0: output-identical zero taps
    geom = _stack_geometry(c_cnt, t, d, m, pad_m=True, r_override=r_stack)
    if geom is None:
        raise ValueError(f"unsupported (D={d}, T={t}, M={m}) for fused chain")
    c_eff, r_stack, groups, _ = geom
    rows = r_stack * 2 * d
    # VMEM guard (AM: y + envelope temporaries + the (bn, K) window
    # scratch): cap bn so ~ (2*R*2C + K) * bn f32 fits scoped VMEM
    cap = max(_LANE, 3_500_000 // (2 * r_stack * 2 * c_eff + groups * rows))
    bn = _pick_bn_padded(-(-m // r_stack), cap, block_n)
    m_eff = -(-m // (r_stack * bn)) * (r_stack * bn)
    n_j = m_eff // r_stack
    g = _g_matrix_stacked(_pad_bank(kh, c_eff), d, c_eff, r_stack, groups,
                          order="planar" if xq_mode in ("nt", "ntc")
                          else "interleaved")
    gh, gl, f32_dot = _split_g(g, precision)
    # intra-step overlap split (see fm_chain_plan): auto = min(8, bn/128)
    n_sub = _resolve_n_sub(bn, n_sub, "am_chain_plan")
    return AmChainPlan(
        d=d, t=t, c_cnt=c_cnt, c_eff=c_eff, r_stack=r_stack, groups=groups,
        rows=rows, bn=bn, n_j=n_j, m=m, n_buf=int(n_buf),
        f32_dot=f32_dot, xq_mode=xq_mode,
        gh=np.asarray(gh), gl=np.asarray(gl), n_sub=n_sub)


def am_chain_apply(plan, buf, gh=None, gl=None, interpret=False):
    """Run the fused AM chain under a prebuilt plan (traceable; shard-safe).

    gh/gl may be traced per-shard overrides (shard_map operands)."""
    interpret = interpret or not is_tpu_backend()
    if buf.shape[-1] != plan.n_buf:
        raise ValueError(f"buffer length {buf.shape[-1]} != plan {plan.n_buf}")
    xq = _xq_prep(buf, plan.d, plan.r_stack, plan.n_j + _LANE,
                  mode=plan.xq_mode)
    audio = _run_am(
        xq,
        jnp.asarray(plan.gh if gh is None else gh),
        jnp.asarray(plan.gl if gl is None else gl),
        hp=None if plan.hp is None else jnp.asarray(plan.hp),
        block_n=plan.bn, groups=plan.groups, rows=plan.rows,
        c_eff=plan.c_eff, r_stack=plan.r_stack, f32_dot=plan.f32_dot,
        interpret=interpret, xq_mode=plan.xq_mode, n_sub=plan.n_sub,
        front=plan.front, q_fold=plan.q_fold, k_grid=plan.k_grid,
        d_stat=plan.d)
    return _unstack(audio, plan.c_eff, plan.c_cnt, plan.r_stack, plan.m)


def pfb_am_chain_plan(taps, decimation, n_buf, grid_bins, k_grid,
                      block_n=4096, precision="bf16x3", n_sub="auto",
                      cap_words=3_500_000, _force_bn=None):
    """Plan the PFB-fronted fused AM chain (round 4): channels on the
    uniform grid shifts[c] = grid_bins[c] * Fs / k_grid with D | k_grid.
    Same envelope back-end as am_chain_plan; see pfb_fm_chain_plan for
    the front's structure and the measured win/loss boundary."""
    kg, d, p_cnt, hp, q_fold = _check_pfb_grid(k_grid, decimation, taps)
    t_len = len(np.asarray(taps))
    c_cnt = len(grid_bins)
    c_eff = -(-c_cnt // _SUB) * _SUB
    r_stack = p_cnt
    rows = r_stack * 2 * d
    m = (int(n_buf) - t_len) // d + 1

    def _words(bn_c):
        return (2 * r_stack * 2 * c_eff + r_stack * 2 * kg) * bn_c

    if _force_bn is not None:
        bn = int(_force_bn)
        if bn < _LANE or bn % _LANE != 0:
            raise ValueError(f"_force_bn={bn} must be a multiple of 128")
    else:
        cap = max(_LANE, int(cap_words) // max(1, _words(1)))
        bn = _pick_bn_padded(-(-m // r_stack), cap, block_n)
        if _words(bn) > int(cap_words):
            raise ValueError(
                f"PFB front infeasible: P={p_cnt} x 2K={2 * kg} fold "
                f"scratch exceeds the VMEM budget even at bn=128")
    n_sub = _resolve_n_sub(bn, n_sub, "pfb_am_chain_plan")
    m_eff = -(-m // (r_stack * bn)) * (r_stack * bn)
    n_j = m_eff // r_stack
    g = _dft_bank_stacked(grid_bins, kg, c_eff)
    gh, gl, f32_dot = _split_g(g, precision)
    return AmChainPlan(
        d=d, t=t_len, c_cnt=c_cnt, c_eff=c_eff, r_stack=r_stack,
        groups=q_fold, rows=rows, bn=bn, n_j=n_j, m=m, n_buf=int(n_buf),
        f32_dot=f32_dot, xq_mode="nt",
        gh=np.asarray(gh), gl=np.asarray(gl), n_sub=n_sub,
        front="pfb", q_fold=q_fold, k_grid=kg, hp=hp)


def pfb_am_chain_pallas(buf, taps, decimation, grid_bins, k_grid,
                        block_n=4096, precision="bf16x3", interpret=False,
                        n_sub="auto"):
    """PFB-fronted fused AM chain over a tail-prepended planar RF buffer
    (uniform channel grid; same contract as am_chain_pallas)."""
    plan = pfb_am_chain_plan(taps, decimation, buf.shape[-1], grid_bins,
                             k_grid, block_n=block_n, precision=precision,
                             n_sub=n_sub)
    return am_chain_apply(plan, buf, interpret=interpret)


def am_chain_pallas(buf, kernel_bank, decimation, block_n=4096,
                    precision="bf16x3", interpret=False, xq_mode="nt"):
    """Fused AM chain over a tail-prepended planar RF buffer.

    Returns audio (C, M) float32 in [-1, 1]; M = (Nb - T)//D + 1. No
    streaming carries beyond the caller's raw RF tail (the AM chain is
    memoryless past the filter window, src/am.cu:21-50)."""
    plan = am_chain_plan(kernel_bank, decimation, buf.shape[-1],
                         block_n=block_n, precision=precision,
                         xq_mode=xq_mode)
    return am_chain_apply(plan, buf, interpret=interpret)


# ---------------------------------------------------------------------------
# FM fused chain
# ---------------------------------------------------------------------------

def _fm_chain_kernel(*refs,
                     groups, rows, c_eff, r_stack, gain, b0, cc, a_pole,
                     spow, f32_dot, xq_mode, last_i, last_col, last_r,
                     n_sub=1, dot_ahead=None, ablate="full",
                     front="toeplitz", q_fold=0, k_grid=0, d=0):
    nx = _n_xq_parts(xq_mode)
    xq_refs, halo_refs = refs[:nx], refs[nx:2 * nx]
    base = 2 * nx
    hp_ref = None
    if front == "pfb":
        hp_ref = refs[base]
        base += 1
    (gh_ref, gl_ref, base_ref, bt_ref, pj_ref, jpow_ref,
     fcar0_ref, zcar0_ref, audio_ref, fcar_ref, zcar_ref) = \
        refs[base:base + 11]
    w_refs = refs[base + 11:base + 11 + n_sub]
    carry_ref = refs[base + 11 + n_sub]
    bn = audio_ref.shape[1]
    bs = bn // n_sub
    i = pl.program_id(0)
    n_i = pl.num_programs(0)

    def _early_out(vals):
        # Measurement hook (benchmarks/ablate_chain.py): emit the last
        # computed stage and exports with real data dependence, skip the
        # rest. Not a user-facing mode — stage timing only.
        audio_ref[:, :] = jnp.concatenate(vals, axis=0)[:audio_ref.shape[0]]

        @pl.when(i == n_i - 1)
        def _():
            fcar_ref[:, :] = vals[0][:fcar_ref.shape[0], 0:2]
            zcar_ref[:, :] = vals[0][:zcar_ref.shape[0], 0:1]

    # carry_ref cols: 0 = f_re, 1 = f_im (last filtered sample), 2 = z.
    # Layout (C_eff, 8) with channel in sublanes — every access is a plain
    # 2D slice; no transposes (transpose relayouts of tiny tiles miscompiled
    # on hardware while passing in interpret mode).
    @pl.when(i == 0)
    def _():
        carry_ref[:, 0:2] = fcar0_ref[:, :]
        carry_ref[:, 2:3] = zcar0_ref[:, :]

    if ablate == "grid":
        # Pure grid/DMA probe (round 5, VERDICT #3): identical grid,
        # BlockSpecs and scratch to the full kernel, NO compute — measures
        # the per-step grid machinery + input/output block DMA directly
        # instead of inferring "intrinsic overhead" by elimination. One
        # element read off the input block keeps its fetch live; it stages
        # through a (1, bn) row via a non-foldable where (Mosaic cannot
        # broadcast (1,1) to (rows, bn) directly — CLAUDE.md gotcha), and
        # the audio block fills from a host-table slice (sublane-only
        # broadcast add).
        x00 = xq_refs[0][0:1, 0:1]
        bn_full = audio_ref.shape[1]
        row = jnp.where(jpow_ref[0:1, :bn_full] < 2.0, x00, 0.0)  # (1, bn)
        audio_ref[:, :] = pj_ref[0:audio_ref.shape[0], :] + row

        @pl.when(i == n_i - 1)
        def _():
            # plain 2D slice copies — the input dependence rides on the
            # audio write; a (1,1)+slice add here would be the combined
            # sublane+lane broadcast Mosaic rejects
            fcar_ref[:, :] = pj_ref[:fcar_ref.shape[0], 0:2]
            zcar_ref[:, :] = pj_ref[:zcar_ref.shape[0], 0:1]
        return

    # ---- 1) stacked windows + tap-bank contraction -----------------------
    # MXU phase: with n_sub > 1 the block's columns split into n_sub
    # sub-blocks; sub-block dots have no data dependence on the
    # rotor/disc/de-emphasis of other sub-blocks, so the scheduler can
    # keep the MXU busy under the VPU stages instead of serializing
    # stage-by-stage (round 3 overlap mechanism). Each sub-block gets its
    # OWN W scratch — disjoint refs, no false store->load ordering.
    #
    # dot_ahead (round 4): with None every dot issues before any VPU
    # stage — which serializes the whole MXU phase (incl. its VPU-side
    # W'^T builds) in front of the whole VPU phase, because Mosaic
    # schedules mostly in program order (measured e2e ~= dot-stage + VPU
    # stages). dot_ahead=k instead issues builds+dots for sub-blocks
    # 0..k-1 up front, then interleaves: [VPU stage s] next to
    # [build+dot s+k] — the stage and the NEXT dot are adjacent in
    # program order, so the MXU dot runs under the VPU stage and only
    # the W builds and stages share the VPU.
    if front == "pfb":
        # the fold rolls lanes WITHIN each plane, so keep the planes
        # separate (vs _build_v's lane-concat) — row-concat the halo only
        (xr, xi), (hr, hi) = xq_refs, halo_refs
        vr = jnp.concatenate([xr[:, :], hr[:, :]], axis=0)
        vi = jnp.concatenate([xi[:, :], hi[:, :]], axis=0)

        def _issue(s):
            # per-p (2C_eff, bs) pieces kept UNconcatenated: a single
            # (P*2C, bs) value concat crashes Mosaic at these shapes
            # (the round-2 W'-as-one-value crash class)
            return _pfb_fold_dot(vr, vi, hp_ref, gh_ref, gl_ref,
                                 w_refs[s], bs, q_fold, k_grid, d,
                                 r_stack, f32_dot, col_off=s * bs)
    else:
        v = _build_v(xq_refs, halo_refs, xq_mode)
        nt = xq_mode in ("nt", "ntc")

        def _issue(s):
            return _window_dot(v, gh_ref, gl_ref, w_refs[s], bs, groups,
                               rows, f32_dot, nt=nt, col_off=s * bs)

    la = n_sub if (dot_ahead is None or ablate == "dot") else int(dot_ahead)
    ys = [None] * n_sub
    for s in range(min(la, n_sub)):
        ys[s] = _issue(s)
    if ablate == "dot":
        if front == "pfb":
            # per-p fold+dot pieces: stitch each phase across sub-blocks
            # (round 5 — the PFB front's stage accounting, VERDICT #1)
            return _early_out(
                [jnp.concatenate([ys[s][r] for s in range(n_sub)], axis=1)
                 if n_sub > 1 else ys[0][r] for r in range(r_stack)])
        return _early_out(
            [jnp.concatenate(ys, axis=1) if n_sub > 1 else ys[0]])

    # ---- VPU phase: per-sub-block rotor/disc/de-emphasis ------------------
    # lo(c, (i*bn + J)*R + r) = base(c) * blocktab(c, i) * pj_r(c, J):
    # base carries the traced stream offset (computed outside the kernel),
    # blocktab/pj are host-precomputed float64-accurate unit phasors.
    bt_re = bt_ref[:, 0:1]   # block i's phasor pair (BlockSpec-selected)
    bt_im = bt_ref[:, 1:2]
    b_re = base_ref[:, 0:1] * bt_re - base_ref[:, 1:2] * bt_im   # (C, 1)
    b_im = base_ref[:, 0:1] * bt_im + base_ref[:, 1:2] * bt_re
    # streaming carries thread across sub-blocks as VALUES (f: previous
    # filtered sample for the discriminator; z: de-emphasis state).
    f_re_c = carry_ref[:, 0:1]
    f_im_c = carry_ref[:, 1:2]
    z_c = carry_ref[:, 2:3]
    cut = []   # per-sub stage outputs when an ablate cut is requested
    from gsdr_tpu.kernels.kmath import atan2_poly
    for s in range(n_sub):
        if s + la < n_sub:
            ys[s + la] = _issue(s + la)   # dot s+la overlaps VPU stage s
        y = ys[s]
        sl = slice(s * bs, (s + 1) * bs)

        # ---- 2) LO rotor as a phasor product (no transcendentals) --------
        f_res = []
        f_ims = []
        for r in range(r_stack):
            row0 = r * 2 * c_eff
            if front == "pfb":   # per-p pieces, not one stacked y
                y_re = y[r][:c_eff, :]
                y_im = y[r][c_eff:, :]
            else:
                y_re = y[row0:row0 + c_eff, :]
                y_im = y[row0 + c_eff:row0 + 2 * c_eff, :]
            pj_re = pj_ref[row0:row0 + c_eff, sl]
            pj_im = pj_ref[row0 + c_eff:row0 + 2 * c_eff, sl]
            lo_re = b_re * pj_re - b_im * pj_im
            lo_im = b_re * pj_im + b_im * pj_re
            f_res.append(y_re * lo_re - y_im * lo_im)
            f_ims.append(y_re * lo_im + y_im * lo_re)
        if ablate == "rotor":
            cut.append((f_res, f_ims))
            f_re_c = f_res[r_stack - 1][:, bs - 1:bs]
            f_im_c = f_ims[r_stack - 1][:, bs - 1:bs]
            continue

        # ---- 3) discriminator with carried previous sample ---------------
        # output j = J*R + r: previous sample is phase r-1 (same column),
        # or phase R-1 shifted one column right for r = 0 (carried across
        # sub-blocks and grid steps).
        prev_res = [
            jnp.concatenate([f_re_c, f_res[r_stack - 1][:, :bs - 1]],
                            axis=1)
        ] + f_res[:r_stack - 1]
        prev_ims = [
            jnp.concatenate([f_im_c, f_ims[r_stack - 1][:, :bs - 1]],
                            axis=1)
        ] + f_ims[:r_stack - 1]
        m_re = jnp.concatenate(
            [f_res[r] * prev_res[r] + f_ims[r] * prev_ims[r]
             for r in range(r_stack)], axis=0)
        m_im = jnp.concatenate(
            [f_ims[r] * prev_res[r] - f_res[r] * prev_ims[r]
             for r in range(r_stack)], axis=0)
        # jnp.arctan2 has no Mosaic lowering; polynomial atan2. The
        # bf16x2 grade's dot quantization (~7e-4 rel) dwarfs the 7th-order
        # fit's ~8.2e-5 rad, so the fast grade drops two fma passes here.
        d_all = gain * atan2_poly(
            m_im, m_re, order=7 if f32_dot == "bf16x2" else 11)
        # d_all: (R*C_eff, bs), r-major rows
        f_re_c = f_res[r_stack - 1][:, bs - 1:bs]
        f_im_c = f_ims[r_stack - 1][:, bs - 1:bs]
        if ablate == "disc":
            cut.append(d_all)
            continue

        # ---- 4) de-emphasis (transposed DF-II), (J, r)-decomposed --------
        # z[j] = cc*d[j] + a*z[j-1]; y[j] = b0*d[j] + z[j-1].  Per coarse
        # column J: partial_r = sum_{k<=r} a^(r-k) cc d_k (unrolled fmas);
        # column state zcol[J] = z[J*R + R-1] follows zcol[J] = a^R
        # zcol[J-1] + partial_{R-1}[J] — one lane-scan with multiplier a^R.
        partials = []
        acc = None
        for r in range(r_stack):
            d_r = d_all[r * c_eff:(r + 1) * c_eff, :]
            acc = cc * d_r if acc is None else a_pole * acc + cc * d_r
            partials.append(acc)
        # Hillis-Steele inclusive scan over J with multiplier a^R. ``spow``
        # is STATIC (round 3): (a^R)^(2^s) underflows to exactly 0.0 within
        # a few steps for real de-emphasis poles (flagship: a^16 ~ 1.5e-4,
        # squared twice -> 0), and multiplying by an exact f32 zero adds
        # nothing — skipping those steps is bit-identical and deletes most
        # of the scan's lane-shift passes (all of them for the op-level
        # identity de-emphasis, a = 0).
        zc = partials[r_stack - 1]
        for s_idx, w in enumerate(spow):
            if w == 0.0 or (1 << s_idx) >= bs:
                break  # monotone |a^R| < 1 decay: later steps are 0 too
            sh = 1 << s_idx
            shifted = jnp.concatenate(
                [jnp.zeros((c_eff, sh), jnp.float32), zc[:, :bs - sh]],
                axis=1)
            zc = zc + w * shifted
        zcol = zc + z_c * jpow_ref[0:1, :bs]          # jpow[J] = a^{R(J+1)}
        zcol_shift = jnp.concatenate([z_c, zcol[:, :bs - 1]], axis=1)
        a_r = 1.0
        for r in range(r_stack):
            d_r = d_all[r * c_eff:(r + 1) * c_eff, :]
            if r == 0:
                audio_r = b0 * d_r + zcol_shift
            else:
                audio_r = b0 * d_r + a_r * zcol_shift + partials[r - 1]
            audio_ref[r * c_eff:(r + 1) * c_eff, sl] = audio_r
            a_r *= a_pole
        z_c = zcol[:, bs - 1:bs]

        # ---- export final streaming state at the last REAL output --------
        # M may be padded up to the R*128 grid (pad-and-mask, round 3):
        # output m-1 sits at grid step last_i, coarse column last_col,
        # phase last_r — only equal to (n_i-1, bn-1, R-1) when M was
        # aligned. The de-emphasis state at j = J*R + r is z[j] =
        # partials[r][J] + a^(r+1) * zcol_shift[J] (zcol specializes this
        # at r = R-1).
        if s == last_col // bs:
            lc = last_col % bs

            @pl.when(i == last_i)
            def _(f_res=f_res, f_ims=f_ims, partials=partials,
                  zcol_shift=zcol_shift, lc=lc):
                fcar_ref[:, 0:1] = f_res[last_r][:, lc:lc + 1]
                fcar_ref[:, 1:2] = f_ims[last_r][:, lc:lc + 1]
                zcar_ref[:, 0:1] = (
                    partials[last_r][:, lc:lc + 1]
                    + (a_pole ** (last_r + 1))
                    * zcol_shift[:, lc:lc + 1])

    if ablate == "rotor":
        return _early_out(
            [jnp.concatenate([c[0][r] for c in cut], axis=1)
             for r in range(r_stack)]
            + [jnp.concatenate([c[1][r] for c in cut], axis=1)
               for r in range(r_stack)])
    if ablate == "disc":
        return _early_out([jnp.concatenate(cut, axis=1)])

    # ---- carries for the next sequential grid step -----------------------
    carry_ref[:, 0:1] = f_re_c
    carry_ref[:, 1:2] = f_im_c
    carry_ref[:, 2:3] = z_c


@functools.partial(
    jax.jit,
    static_argnames=("block_n", "groups", "rows", "c_eff", "r_stack",
                     "gain", "b0", "cc", "a1", "f32_dot", "interpret",
                     "ablate", "xq_mode", "m_real", "n_sub", "dot_ahead",
                     "front", "q_fold", "k_grid", "d_stat"))
def _run_chain(base, xq, gh, gl, bt, pj, fcar0, zcar0, hp=None, *,
               block_n, groups, rows, c_eff, r_stack, gain, b0, cc, a1,
               f32_dot, interpret, ablate="full", xq_mode="flat",
               m_real=None, n_sub=1, dot_ahead=None,
               front="toeplitz", q_fold=0, k_grid=0, d_stat=0):
    xq_parts = xq if isinstance(xq, tuple) else (xq,)
    n_coarse_total = _n_coarse_of(xq_parts[0], xq_mode)
    k_rows = gh.shape[1]
    n_out = n_coarse_total - _LANE
    bn = block_n
    log_bn = int(np.log2(bn))

    a = -float(a1)
    a_r_mult = float(a ** r_stack)
    spow = tuple(
        float(np.float32(a_r_mult ** (1 << s)))  # f64 pow, f32 cast — the
        for s in range(log_bn))                  # same values the operand
                                                 # array carried before
    jpow = np.power(a_r_mult, np.arange(1, bn + 1),
                    dtype=np.float64).astype(np.float32)[None, :]

    m_eff = n_out * r_stack
    j_last = (m_eff if m_real is None else m_real) - 1
    kernel = functools.partial(
        _fm_chain_kernel, groups=groups, rows=rows, c_eff=c_eff,
        r_stack=r_stack, gain=gain, b0=b0, cc=cc, a_pole=a,
        spow=spow, f32_dot=f32_dot, xq_mode=xq_mode, ablate=ablate,
        n_sub=n_sub, dot_ahead=dot_ahead,
        front=front, q_fold=q_fold, k_grid=k_grid, d=d_stat,
        last_i=(j_last // r_stack) // bn,
        last_col=(j_last // r_stack) % bn,
        last_r=j_last % r_stack)

    if bn % n_sub != 0 or (bn // n_sub) % _LANE != 0:
        raise ValueError(f"n_sub={n_sub} must split bn={bn} into "
                         f"lane-aligned sub-blocks")
    n_blk = n_out // bn
    vm = pltpu.VMEM
    xq_specs, halo_specs = _xq_specs(xq_mode, rows, bn)
    bs = bn // n_sub
    if front == "pfb":
        # A^T scratch: all P phase folds of a sub-block, contracted as
        # ONE batched NT dot (see _pfb_fold_dot)
        w_shape = (r_stack * bs, k_rows)
        hp_specs = [pl.BlockSpec(hp.shape, lambda i: (0, 0),
                                 memory_space=vm)]
        hp_args = [hp]
    else:
        w_shape = ((bs, k_rows) if xq_mode in ("nt", "ntc")
                   else (k_rows, bs))
        hp_specs, hp_args = [], []
    w_dtype = jnp.bfloat16 if f32_dot == "bf16x2" else jnp.float32
    return pl.pallas_call(
        kernel,
        grid=(n_blk,),
        in_specs=list(xq_specs) + list(halo_specs) + hp_specs + [
            pl.BlockSpec(gh.shape, lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec(gl.shape, lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((c_eff, 2), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((c_eff, _LANE), lambda i: (0, i),
                         memory_space=vm),
            pl.BlockSpec((r_stack * 2 * c_eff, bn), lambda i: (0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, bn), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((c_eff, 2), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((c_eff, 1), lambda i: (0, 0), memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((r_stack * c_eff, bn), lambda i: (0, i),
                         memory_space=vm),
            pl.BlockSpec((c_eff, 2), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((c_eff, 1), lambda i: (0, 0), memory_space=vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_stack * c_eff, n_out), jnp.float32),
            jax.ShapeDtypeStruct((c_eff, 2), jnp.float32),
            jax.ShapeDtypeStruct((c_eff, 1), jnp.float32),
        ),
        scratch_shapes=(
            [pltpu.VMEM(w_shape, w_dtype) for _ in range(n_sub)]
            + [pltpu.VMEM((c_eff, 8), jnp.float32)]
        ),
        interpret=interpret,
    )(*xq_parts, *xq_parts, *hp_args, gh, gl, base, bt, pj,
      jnp.asarray(jpow), fcar0, zcar0)


def _phasor_tables(shifts_hz, sample_rate, dec, r_stack, bn, n_blk):
    """Host-exact unit-phasor rotor tables in the stacked layout:

    pj (R*2C, bn), r-major row groups [re C; im C], with
    pj[r-group][c, J] = e^{2i pi frac(f_c * D * (J*R + r) / Fs)}, and
    bt (C, 128*n_blk) with lanes 0/1 of each 128-lane stripe holding
    re/im of e^{2i pi frac(f_c * D * R * bn * i / Fs)}."""
    c_cnt = len(shifts_hz)
    pj = np.zeros((r_stack * 2 * c_cnt, bn), np.float32)
    # per-block phasor pair lives in its own 128-lane stripe (Mosaic block
    # shapes must be lane-128 aligned); lanes 0/1 hold re/im.
    bt = np.zeros((c_cnt, _LANE * n_blk), np.float32)
    fs = float(sample_rate)
    for c, f in enumerate(shifts_hz):
        f = float(f)
        for r in range(r_stack):
            if f.is_integer() and fs.is_integer():
                fi, fsi = int(f), int(fs)
                ang_j = 2.0 * np.pi * (
                    (fi * dec * (np.arange(bn, dtype=object) * r_stack + r))
                    % fsi
                ).astype(np.float64) / fsi
            else:
                ang_j = 2.0 * np.pi * np.mod(
                    f * dec * (np.arange(bn, dtype=np.float64) * r_stack + r),
                    fs) / fs
            pj[r * 2 * c_cnt + c] = np.cos(ang_j)
            pj[r * 2 * c_cnt + c_cnt + c] = np.sin(ang_j)
        if f.is_integer() and fs.is_integer():
            fi, fsi = int(f), int(fs)
            ang_i = 2.0 * np.pi * (
                (fi * dec * r_stack * bn * np.arange(n_blk, dtype=object))
                % fsi
            ).astype(np.float64) / fsi
        else:
            ang_i = 2.0 * np.pi * np.mod(
                f * dec * r_stack * bn * np.arange(n_blk, dtype=np.float64),
                fs) / fs
        bt[c, 0::_LANE] = np.cos(ang_i)
        bt[c, 1::_LANE] = np.sin(ang_i)
    return pj, bt


@dataclasses.dataclass(frozen=True)
class FmChainPlan:
    """Host-side compile plan for the fused FM chain.

    Everything static the kernel launch needs (geometry, precision grade,
    chain coefficients) plus the host-precomputed numpy tables (stacked
    tap matrix hi/lo, rotor phasor tables). A plan is built once per
    (model config, buffer length) and reused across streaming steps; the
    table arrays may be overridden with *traced* equivalents in
    fm_chain_apply — that is how the sharded step (parallel/channelizer.py)
    feeds each channel shard its own tables through shard_map.
    """

    d: int
    t: int
    c_cnt: int
    c_eff: int
    r_stack: int
    groups: int
    rows: int
    bn: int
    n_j: int      # coarse columns after pad-and-mask (m_eff / R)
    m: int        # real outputs
    n_buf: int
    f32_dot: str
    xq_mode: str
    gain: float
    b0: float
    cc: float
    a1: float
    gh: object    # numpy-backed device constants (hashability not needed)
    gl: object
    pj: object
    bt: object
    # intra-step overlap split: the block's bn columns run as n_sub
    # sub-blocks whose window dots are ALL issued before any VPU stage,
    # letting the scheduler overlap MXU and VPU work (round 3).
    n_sub: int = 1
    # round 4: issue dots only dot_ahead sub-blocks ahead of the VPU
    # stages instead of all-up-front (None) — interleaves [stage s] with
    # [build+dot s+k] in program order so the MXU keeps running under
    # the VPU stages (see _fm_chain_kernel). Measured a wash at the
    # flagship (BASELINE.md round 4) — kept as a tuning knob.
    dot_ahead: int | None = None
    # round 4 PFB front (uniform channel grids f_c = g_c*Fs/K with D | K):
    # front='pfb' replaces the Toeplitz window copies + G' contraction
    # with a Q-tap polyphase fold + one (2C, 2K) DFT-bank dot per output
    # phase p = K/D (r_stack holds P; gh/gl hold the split DFT bank; hp
    # the (Q, K) polyphase taps). See _pfb_fold_dot.
    front: str = "toeplitz"
    q_fold: int = 0
    k_grid: int = 0
    hp: object = None


def fm_chain_plan(kernel_bank, decimation, gain, deemph_b, deemph_a,
                  n_buf, shifts_hz, sample_rate,
                  block_n=4096, precision="bf16x3", xq_mode="nt",
                  n_sub="auto", cap_words=3_500_000, _force_bn=None,
                  r_stack=None, dot_ahead=None):
    """Build the host-side plan for a tail-prepended buffer of n_buf samples.

    Raises ValueError when the shape cannot run fused (the taps, padded to
    a D multiple, outrun the 128-coarse-column halo window). M is padded
    up to the R*128 grid and masked (round 3) — any output count works —
    and T % D != 0 pads the taps with trailing zeros (round 4) — any tap
    count works.

    ``r_stack``: override the stacking factor (see _stack_geometry).
    """
    kh = np.asarray(kernel_bank)
    k2c, _, t = kh.shape
    c_cnt = k2c // 2
    d = int(decimation)
    m = (int(n_buf) - t) // d + 1   # output count from the REAL tap span
    kh = _pad_taps(kh, d)           # T % D != 0: output-identical zero taps
    geom = _stack_geometry(c_cnt, t, d, m, pad_m=True, r_override=r_stack)
    if geom is None:
        raise ValueError(
            f"unsupported (D={d}, T={t}, M={m}) for fused chain")
    c_eff, r_stack, groups, _ = geom
    rows = r_stack * 2 * d
    # Block size: target ~16 grid steps, bounded by an n_sub-aware VMEM
    # footprint check. Measured ladders (2026-08-18, v5e): fm64's old
    # bn=256 (64 steps) ran 465-495 us vs 423-432 at bn=1024 (16 steps),
    # while fm16's bn=2048 (8 steps) lost slightly to bn=1024 (16 steps)
    # in 5/6 paired runs — 16 steps is the sweet spot at both geometries.
    # Footprint: the intra-step split keeps the VPU temporaries bs-wide,
    # so the old ~4.5-full-height liveness model relaxes by min(n_sub, 4)
    # (conservative half of the split; fm64/bn1024 and fm16/bn2048 both
    # compile and run correct on HW under it, rel err 1.3e-4 / 4.2e-5).
    n_j_real = -(-m // r_stack)

    # 'auto': split the block into 128-column sub-blocks, up to 8 — the
    # HW A/B at the flagship (2026-08-18) measured n_sub 1/2/4/8 =
    # 149/145/139/135 us (bf16x3) and 127/118/123/121 (bf16x2), repeatably
    # ordered across rounds; the MXU-first issue order lets the scheduler
    # overlap the dots with the previous sub-block's VPU stages.
    def _ns_at(bn_c):
        return _ns_candidate(bn_c, n_sub)

    if _force_bn is not None:
        # test/A-B hook: bypass the chooser (still lane-aligned). Small
        # shapes can never grow bn past n_j/16, which would leave the
        # n_sub>1 kernel paths untestable at test-sized inputs.
        bn = int(_force_bn)
        if bn < _LANE or bn % _LANE != 0:
            raise ValueError(f"_force_bn={bn} must be a multiple of 128")
    else:
        # log-space-nearest power of two to n_j/16 (grow while bn <
        # n_j/(16*sqrt(2)), squared to stay integer-exact): n_j=15625 must
        # round UP to bn=1024 (15.3 steps), not floor to 512.
        bn = _LANE
        while bn * 2 <= int(block_n) and 512 * bn * bn < n_j_real * n_j_real:
            bn *= 2
        # VMEM footprint: relax the liveness model by the ACTUAL split at
        # each candidate bn (an explicit n_sub=1 must not inherit the auto
        # split's relaxation — its VPU temporaries stay full-bn-wide).
        while bn > _LANE:
            words = (9 * r_stack * 2 * c_eff // 2 // min(_ns_at(bn), 4)
                     + groups * rows) * bn
            if words <= int(cap_words):
                break
            bn //= 2
    n_sub = _resolve_n_sub(bn, n_sub, "fm_chain_plan")
    m_eff = -(-m // (r_stack * bn)) * (r_stack * bn)
    n_j = m_eff // r_stack
    g = _g_matrix_stacked(_pad_bank(kh, c_eff), d, c_eff, r_stack, groups,
                          order="planar" if xq_mode in ("nt", "ntc")
                          else "interleaved")
    gh, gl, f32_dot = _split_g(g, precision)

    b0 = float(deemph_b[0]) / float(deemph_a[0])
    b1 = float(deemph_b[1]) / float(deemph_a[0])
    a1 = float(deemph_a[1]) / float(deemph_a[0])
    cc = b1 - a1 * b0  # TDF-II input coefficient

    shifts_eff = tuple(float(f) for f in shifts_hz) \
        + (0.0,) * (c_eff - c_cnt)
    pj_np, bt_np = _phasor_tables(shifts_eff, sample_rate, d, r_stack, bn,
                                  n_j // bn)
    return FmChainPlan(
        d=d, t=t, c_cnt=c_cnt, c_eff=c_eff, r_stack=r_stack, groups=groups,
        rows=rows, bn=bn, n_j=n_j, m=m, n_buf=int(n_buf),
        f32_dot=f32_dot, xq_mode=xq_mode,
        gain=float(gain), b0=b0, cc=cc, a1=a1,
        gh=np.asarray(gh), gl=np.asarray(gl), pj=pj_np, bt=bt_np,
        n_sub=n_sub,
        dot_ahead=None if dot_ahead is None else int(dot_ahead))


def pfb_fm_chain_plan(taps, decimation, gain, deemph_b, deemph_a,
                      n_buf, shifts_hz, sample_rate, grid_bins, k_grid,
                      block_n=4096, precision="bf16x3", n_sub="auto",
                      cap_words=3_200_000, _force_bn=None):
    """Plan the PFB-fronted fused FM chain (round 4) for channel shifts on
    the uniform grid shifts_hz[c] = grid_bins[c] * Fs / k_grid with
    decimation D | k_grid.

    Same streaming contract, state pytree, and VPU back-end as
    fm_chain_plan — only the contraction changes: a Q = ceil(T/K)-tap
    polyphase fold + one (2C, 2K) DFT-bank dot per output phase (P = K/D
    phases stack into the MXU M dim exactly like the Toeplitz R). K is
    exact (no Toeplitz zero-span), so the MXU work per output is
    4*C*K vs the dense form's ~8*C*T — the PFB form wins when the
    prototype filter is long relative to the grid (T > ~K/2) and is the
    TPU-native conclusion of the reference's multi-channel FM intent
    (/root/reference/src/fm.cu:71-179).

    cap_words: the 3.2M default is a measured compile boundary, not a
    footprint estimate — (P=8, bn=1024, n_sub=2) sits at 3.4M under the
    liveness model and crashes the remote compiler (tpu_compile_helper
    exit 1, round 5), while every <=3.2M geometry measured compiles; the
    same class as the documented fm256 bn=256 crash edge.
    """
    kg, d, p_cnt, hp, q_fold = _check_pfb_grid(k_grid, decimation, taps)
    t_len = len(np.asarray(taps))
    c_cnt = len(grid_bins)
    c_eff = -(-c_cnt // _SUB) * _SUB
    r_stack = p_cnt
    rows = r_stack * 2 * d          # = 2K: the nt plane pair is (n, K)
    m = (int(n_buf) - t_len) // d + 1
    n_j_real = -(-m // r_stack)

    def _ns_at(bn_c):
        # auto_cap=2: the PFB front's exact-K dots are tiny, so the dense
        # kernel's 8-way overlap split only adds sub-block granularity
        # overhead here (see _ns_candidate's measured ladder)
        return _ns_candidate(bn_c, n_sub, auto_cap=2)

    if _force_bn is not None:
        bn = int(_force_bn)
        if bn < _LANE or bn % _LANE != 0:
            raise ValueError(f"_force_bn={bn} must be a multiple of 128")
    else:
        bn = _LANE

        def _words(bn_c):
            # per-column f32 words: y/audio/VPU liveness (same model as
            # the Toeplitz plan) + the (P*bn, 2K) fold scratch
            return (9 * r_stack * 2 * c_eff // 2 // min(_ns_at(bn_c), 4)
                    + r_stack * 2 * kg) * bn_c

        while bn * 2 <= int(block_n) and 512 * bn * bn < n_j_real * n_j_real:
            bn *= 2
        while bn > _LANE and _words(bn) > int(cap_words):
            bn //= 2
        if _words(bn) > int(cap_words):
            raise ValueError(
                f"PFB front infeasible: P={p_cnt} phases x 2K={2 * kg} "
                f"fold-scratch lanes exceed the VMEM budget even at "
                f"bn=128 ({_words(bn)} > {cap_words} words). Large-K "
                f"grids with T < K also lose structurally (the DFT-bank "
                f"dot does 4*C*K > 4*C*T MACs) — use the dense chain.")
    n_sub = _resolve_n_sub(bn, n_sub, "pfb_fm_chain_plan", auto_cap=2)
    m_eff = -(-m // (r_stack * bn)) * (r_stack * bn)
    n_j = m_eff // r_stack
    g = _dft_bank_stacked(grid_bins, kg, c_eff)
    gh, gl, f32_dot = _split_g(g, precision)

    b0 = float(deemph_b[0]) / float(deemph_a[0])
    b1 = float(deemph_b[1]) / float(deemph_a[0])
    a1 = float(deemph_a[1]) / float(deemph_a[0])
    cc = b1 - a1 * b0

    shifts_eff = tuple(float(f) for f in shifts_hz) \
        + (0.0,) * (c_eff - c_cnt)
    pj_np, bt_np = _phasor_tables(shifts_eff, sample_rate, d, r_stack, bn,
                                  n_j // bn)
    return FmChainPlan(
        d=d, t=t_len, c_cnt=c_cnt, c_eff=c_eff, r_stack=r_stack,
        groups=q_fold, rows=rows, bn=bn, n_j=n_j, m=m, n_buf=int(n_buf),
        f32_dot=f32_dot, xq_mode="nt",
        gain=float(gain), b0=b0, cc=cc, a1=a1,
        gh=np.asarray(gh), gl=np.asarray(gl), pj=pj_np, bt=bt_np,
        n_sub=n_sub, front="pfb", q_fold=q_fold, k_grid=kg, hp=hp)


def fm_chain_apply(plan, buf, lo_table, n0_rot, carry_f, carry_z,
                   gh=None, gl=None, pj=None, bt=None,
                   interpret=False, ablate="full"):
    """Run the fused chain under a prebuilt plan (traceable; shard-safe).

    Args:
      plan: FmChainPlan for this buffer length.
      buf: planar (plan.n_buf,) RF including the (T-1)-sample history.
      lo_table: (C, 4) digit-fraction table (numpy or traced — a traced
        per-shard slice under shard_map is fine).
      n0_rot: traced int32 scalar — global raw-sample index of window 0.
      carry_f / carry_z: (C, 1) discriminator / de-emphasis carries.
      gh/gl/pj/bt: optional traced overrides of the plan's host tables
        (same shapes) — used by the sharded step to pass per-channel-shard
        tables as shard_map operands.

    Returns (audio (C, M), new_carry_f, new_carry_z) exactly like
    fm_chain_pallas.
    """
    interpret = interpret or not is_tpu_backend()
    if buf.shape[-1] != plan.n_buf:
        raise ValueError(f"buffer length {buf.shape[-1]} != plan {plan.n_buf}")
    c_cnt, c_eff, r_stack = plan.c_cnt, plan.c_eff, plan.r_stack
    xq = _xq_prep(buf, plan.d, r_stack, plan.n_j + _LANE, mode=plan.xq_mode)

    # traced base phasor e^{2i pi frac(f_c * n0 / Fs)} via the digit table
    # (XLA-side: C sin/cos evaluations, negligible)
    from gsdr_tpu.utils.phase import phase_fraction_from_table

    pad_c = [(0, c_eff - c_cnt), (0, 0)]
    table = jnp.pad(jnp.asarray(lo_table, jnp.float32), pad_c)
    frac0 = phase_fraction_from_table(
        jnp.asarray(n0_rot, jnp.int32).reshape(1), table[:, None, :])
    theta0 = _TWO_PI * frac0  # (C_eff, 1)
    base = jnp.concatenate(
        [jnp.cos(theta0), jnp.sin(theta0)], axis=1)  # (C_eff, 2)

    fcar0 = jnp.pad(
        jnp.concatenate([carry_f.re, carry_f.im], axis=1), pad_c)
    zcar0 = jnp.pad(jnp.asarray(carry_z), pad_c)

    audio, fcar, zcar = _run_chain(
        base, xq,
        jnp.asarray(plan.gh if gh is None else gh),
        jnp.asarray(plan.gl if gl is None else gl),
        jnp.asarray(plan.bt if bt is None else bt),
        jnp.asarray(plan.pj if pj is None else pj),
        fcar0, zcar0,
        hp=None if plan.hp is None else jnp.asarray(plan.hp),
        block_n=plan.bn, groups=plan.groups, rows=plan.rows, c_eff=c_eff,
        r_stack=r_stack, gain=plan.gain, b0=plan.b0, cc=plan.cc, a1=plan.a1,
        f32_dot=plan.f32_dot, interpret=interpret, xq_mode=plan.xq_mode,
        m_real=plan.m, ablate=ablate, n_sub=plan.n_sub,
        dot_ahead=plan.dot_ahead,
        front=plan.front, q_fold=plan.q_fold, k_grid=plan.k_grid,
        d_stat=plan.d)
    new_f = ComplexArray(fcar[:c_cnt, 0:1], fcar[:c_cnt, 1:2])
    return (_unstack(audio, c_eff, c_cnt, r_stack, plan.m), new_f,
            zcar[:c_cnt])


def pfb_fm_chain_pallas(buf, taps, lo_table, n0_rot, decimation, gain,
                        deemph_b, deemph_a, carry_f, carry_z,
                        shifts_hz, sample_rate, grid_bins, k_grid,
                        block_n=4096, precision="bf16x3", interpret=False,
                        n_sub="auto"):
    """PFB-fronted fused FM chain over a tail-prepended planar RF buffer
    (uniform channel grid; same contract and state pytree as
    fm_chain_pallas — the two are interchangeable mid-stream)."""
    plan = pfb_fm_chain_plan(taps, decimation, gain, deemph_b, deemph_a,
                             buf.shape[-1], shifts_hz, sample_rate,
                             grid_bins, k_grid, block_n=block_n,
                             precision=precision, n_sub=n_sub)
    return fm_chain_apply(plan, buf, lo_table, n0_rot, carry_f, carry_z,
                          interpret=interpret)


def fm_chain_pallas(buf, kernel_bank, lo_table, n0_rot, decimation, gain,
                    deemph_b, deemph_a, carry_f, carry_z, shifts_hz=None,
                    sample_rate=None,
                    block_n=4096, precision="bf16x3", interpret=False,
                    xq_mode="nt", n_sub="auto"):
    """Run the fused chain over a tail-prepended planar RF buffer.

    Args:
      buf: planar (Nb,) RF including the (T-1)-sample history prefix.
      kernel_bank: (2C, 2, T) numpy conv kernel (make_complex_tap_bank).
      lo_table: (C, 4) numpy digit-fraction table (phase_digit_table).
      n0_rot: traced int32 scalar — global raw-sample index of window 0
        (i.e. n0 - (T-1) mod Fs).
      shifts_hz / sample_rate: static shift frequencies and Fs, used to
        precompute exact unit-phasor rotor tables host-side (the kernel
        multiplies phasors instead of evaluating sin/cos per element).
      decimation, gain, deemph_b/deemph_a: static chain parameters.
      carry_f: planar (C, 1) previous filtered sample (discriminator halo).
      carry_z: (C, 1) de-emphasis TDF-II state.
      block_n: coarse columns per grid step (R decimated outputs each).

    Returns (audio (C, M), new_carry_f, new_carry_z), M = (Nb - T)//D + 1,
    bit-compatible with the unfused FmChannelizer state pytree.

    """
    plan = fm_chain_plan(kernel_bank, decimation, gain, deemph_b, deemph_a,
                         buf.shape[-1], shifts_hz, sample_rate,
                         block_n=block_n, precision=precision,
                         xq_mode=xq_mode, n_sub=n_sub)
    return fm_chain_apply(plan, buf, lo_table, n0_rot, carry_f, carry_z,
                          interpret=interpret)
