"""Fully fused FM channelizer chain as ONE Pallas TPU kernel.

The flagship chain — mix bank + FIR + decimate (complex-tap-bank conv),
LO rotor, quadrature discriminator, first-order IIR de-emphasis — executes
as a single kernel: raw RF is read from HBM once, audio is written once,
and every intermediate (mixed, filtered, demodulated) lives only in VMEM.
This is the TPU counterpart of the reference's single fused k_Fm kernel
(/root/reference/src/fm.cu:21-69) — including its warp-shuffle neighbor
exchange (src/fm.cu:58-64), which here is a carried last-column scratch
that persists across the sequential Pallas grid.

Stages per grid step (block of BM decimated outputs):
  1. window matmul: W (2T, BM) built from shifted copies of the phase-split
     input (see channelize_pallas.py), contracted with the complex tap bank
     as 3-pass bf16x3 (or exact f32) -> filtered planes (C, BM) x2. G rows
     are planes-major (re rows 0..C-1, im rows C..2C-1) so the planes are
     contiguous slices.
  2. LO rotor: theta from exact digit-table phase fractions of the global
     raw index n0 + j*D (utils/phase.py scheme, computed in-kernel from a
     broadcasted iota + the (C, 4) table; n0 arrives as an SMEM scalar).
  3. discriminator: gain * atan2 of y[j]*conj(y[j-1]); the j=0 column uses
     the carried previous filtered sample.
  4. de-emphasis in transposed DF-II form: z[j] = c*d[j] - a1*z[j-1]
     (prefix computed by a log2(BM)-step Hillis-Steele scan over lanes +
     the carried state contribution a^{j+1} z_prev), then
     y[j] = b0*d[j] + z[j-1].

The carried state is exactly the unfused pipeline's state pytree
(disc_carry = last filtered sample, deemph_zi = TDF-II state), so the
fused and unfused step functions are interchangeable mid-stream.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsdr_tpu.carray import ComplexArray

_LANE = 128
_SUB = 8
_TWO_PI = 6.283185307179586
_BASE_BITS = 8
_NUM_DIGITS = 4
_MAX_LOG_BM = 16


def _g_matrix_planes(kernel_np, decimation):
    """(2C, 2, T) conv kernel -> (2C, 2T) with planes-major rows:
    row c = re plane of channel c, row C+c = im plane."""
    k2c, _, t = kernel_np.shape
    c_cnt = k2c // 2
    d = decimation
    p_cnt = t // d
    g = np.zeros((k2c, 2 * t), np.float32)
    for k in range(p_cnt):
        for p in range(d):
            for plane in range(2):
                col = k * 2 * d + p * 2 + plane
                g[:c_cnt, col] = kernel_np[0::2, plane, k * d + p]
                g[c_cnt:, col] = kernel_np[1::2, plane, k * d + p]
    return g


def _window_dot(xp_ref, halo_ref, gh_ref, gl_ref, w_ref, bm, p_cnt, rows,
                f32_dot):
    """Build W (2T, BM) from shifted copies of the phase-split input and
    contract with the tap bank (bf16x3 or exact f32). Shared by the FM and
    AM fused chain kernels."""
    v = jnp.concatenate([xp_ref[:, :], halo_ref[:, :]], axis=1)
    # W goes through scratch on purpose: building it as one concatenated
    # value crashes Mosaic's compiler at these sizes (tpu_compile_helper
    # exit 1), while per-shift scratch stores lower cleanly
    for k in range(p_cnt):
        w_ref[k * rows:(k + 1) * rows, :] = v[:, k:k + bm]
    w = w_ref[:, :]
    if f32_dot == "f32":
        return jnp.dot(gh_ref[:, :], w, preferred_element_type=jnp.float32)
    wh = w.astype(jnp.bfloat16)
    y = jnp.dot(gh_ref[:, :], wh, preferred_element_type=jnp.float32)
    y += jnp.dot(gl_ref[:, :], wh, preferred_element_type=jnp.float32)
    if f32_dot == "bf16x3":
        wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
        y += jnp.dot(gh_ref[:, :], wl, preferred_element_type=jnp.float32)
    # bf16x2: signal quantized to bf16 (~0.2% = -54 dB, below RF ADC noise
    # floors), taps still hi+lo exact — one fewer MXU pass than bf16x3
    return y


def _am_chain_kernel(xp_ref, halo_ref, gh_ref, gl_ref, audio_ref, w_ref, *,
                     p_cnt, rows, c_cnt, f32_dot):
    """Fused AM chain: windows+dot + envelope 2*clamp(|.|,0,1)-1 (the
    reference's fused k_Am, /root/reference/src/am.cu:21-50). The LO
    window-start rotor is a unit phasor and the envelope is
    magnitude-only, so the rotor drops out entirely — the mixing inside
    the filter window is already in the complex tap bank."""
    bm = audio_ref.shape[1]
    y = _window_dot(xp_ref, halo_ref, gh_ref, gl_ref, w_ref, bm,
                    p_cnt, rows, f32_dot)
    y_re = y[:c_cnt, :]
    y_im = y[c_cnt:, :]
    mag = jnp.sqrt(y_re * y_re + y_im * y_im)
    audio_ref[:, :] = 2.0 * jnp.clip(mag, 0.0, 1.0) - 1.0


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "p_cnt", "rows", "c_cnt", "f32_dot",
                     "interpret"))
def _run_am(xp, gh, gl, *, block_m, p_cnt, rows, c_cnt, f32_dot, interpret):
    _, mp = xp.shape
    k2t = gh.shape[1]
    m_out = mp - _LANE
    bm = block_m
    kernel = functools.partial(_am_chain_kernel, p_cnt=p_cnt, rows=rows,
                               c_cnt=c_cnt, f32_dot=f32_dot)
    vm = pltpu.VMEM
    return pl.pallas_call(
        kernel,
        grid=(m_out // bm,),
        in_specs=[
            pl.BlockSpec((rows, bm), lambda i: (0, i), memory_space=vm),
            pl.BlockSpec((rows, _LANE),
                         lambda i: (0, (i * bm) // _LANE + bm // _LANE),
                         memory_space=vm),
            pl.BlockSpec((2 * c_cnt, k2t), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((2 * c_cnt, k2t), lambda i: (0, 0), memory_space=vm),
        ],
        out_specs=pl.BlockSpec((c_cnt, bm), lambda i: (0, i),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((c_cnt, m_out), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k2t, bm), jnp.float32)],
        interpret=interpret,
    )(xp, xp, gh, gl)


def am_chain_pallas(buf, kernel_bank, decimation, block_m=4096,
                    precision="bf16x3", interpret=False):
    """Fused AM chain over a tail-prepended planar RF buffer.

    Returns audio (C, M) float32 in [-1, 1]; M = (Nb - T)//D + 1. No
    streaming carries beyond the caller's raw RF tail (the AM chain is
    memoryless past the filter window, src/am.cu:21-50)."""
    interpret = interpret or jax.default_backend() == "cpu"
    kh = np.asarray(kernel_bank)
    k2c, _, t = kh.shape
    c_cnt = k2c // 2
    d = int(decimation)
    n = buf.shape[-1]
    m = (n - t) // d + 1
    if not fused_chain_supported(d, t, m):
        raise ValueError(f"unsupported (D={d}, T={t}, M={m}) for fused chain")
    rows = 2 * d
    p_cnt = t // d
    bm = _pick_bm(m, block_m)
    total_cols = m + _LANE
    need = total_cols * d
    xr = jnp.pad(buf.re, (0, max(0, need - n)))[:need]
    xi = jnp.pad(buf.im, (0, max(0, need - n)))[:need]
    xp = jnp.stack([xr.reshape(total_cols, d), xi.reshape(total_cols, d)],
                   axis=-1).reshape(total_cols, rows).T

    import ml_dtypes

    g = _g_matrix_planes(kh, d)
    if precision in ("bf16x3", "bf16x2"):
        gh_np = g.astype(ml_dtypes.bfloat16)
        gl_np = (g - gh_np.astype(np.float32)).astype(ml_dtypes.bfloat16)
        gh, gl = jnp.asarray(gh_np), jnp.asarray(gl_np)
        f32_dot = precision
    else:
        gh, gl = jnp.asarray(g), jnp.asarray(np.zeros_like(g))
        f32_dot = "f32"
    audio = _run_am(xp, gh, gl, block_m=bm, p_cnt=p_cnt, rows=rows,
                    c_cnt=c_cnt, f32_dot=f32_dot, interpret=interpret)
    return audio[:, :m]


def _fm_chain_kernel(xp_ref, halo_ref, gh_ref, gl_ref, base_ref, bt_ref,
                     pj_ref, spow_ref, jpow_ref, fcar0_ref, zcar0_ref,
                     audio_ref, fcar_ref, zcar_ref,
                     w_ref, carry_ref, *,
                     p_cnt, rows, c_cnt, dec, gain, b0, cc, log_bm, f32_dot):
    bm = audio_ref.shape[1]
    i = pl.program_id(0)
    n_i = pl.num_programs(0)

    # carry_ref cols: 0 = f_re, 1 = f_im (last filtered sample), 2 = z.
    # Layout (C, 8) with channel in sublanes — every access is a plain 2D
    # slice; no transposes (transpose relayouts of tiny tiles miscompiled
    # on hardware while passing in interpret mode).
    @pl.when(i == 0)
    def _():
        carry_ref[:, 0:2] = fcar0_ref[:, :]
        carry_ref[:, 2:3] = zcar0_ref[:, :]

    # ---- 1) windows + tap-bank contraction -------------------------------
    y = _window_dot(xp_ref, halo_ref, gh_ref, gl_ref, w_ref, bm,
                    p_cnt, rows, f32_dot)
    y_re = y[:c_cnt, :]
    y_im = y[c_cnt:, :]

    # ---- 2) LO rotor as a phasor product (no transcendentals) ------------
    # lo(c, i*bm+j) = base(c) * blocktab(c, i) * pj(c, j): base carries the
    # traced stream offset (computed outside the kernel), blocktab/pj are
    # host-precomputed float64-accurate unit phasors.
    bt_re = bt_ref[:, 0:1]   # block i's phasor pair (BlockSpec-selected)
    bt_im = bt_ref[:, 1:2]
    b_re = base_ref[:, 0:1] * bt_re - base_ref[:, 1:2] * bt_im   # (C, 1)
    b_im = base_ref[:, 0:1] * bt_im + base_ref[:, 1:2] * bt_re
    lo_re = b_re * pj_ref[:c_cnt, :] - b_im * pj_ref[c_cnt:, :]
    lo_im = b_re * pj_ref[c_cnt:, :] + b_im * pj_ref[:c_cnt, :]
    f_re = y_re * lo_re - y_im * lo_im
    f_im = y_re * lo_im + y_im * lo_re

    # ---- 3) discriminator with carried previous sample -------------------
    prev_re = jnp.concatenate(
        [carry_ref[:, 0:1], f_re[:, :bm - 1]], axis=1)
    prev_im = jnp.concatenate(
        [carry_ref[:, 1:2], f_im[:, :bm - 1]], axis=1)
    m_re = f_re * prev_re + f_im * prev_im
    m_im = f_im * prev_re - f_re * prev_im
    # jnp.arctan2 has no Mosaic lowering; polynomial atan2 (~1e-6 rad)
    from gsdr_tpu.kernels.kmath import atan2_poly
    d = gain * atan2_poly(m_im, m_re)

    # ---- 4) de-emphasis (transposed DF-II) -------------------------------
    # z[j] = cc*d[j] - a1*z[j-1]; y[j] = b0*d[j] + z[j-1]
    acc = cc * d
    for s_idx in range(log_bm):
        s = 1 << s_idx
        shifted = jnp.concatenate(
            [jnp.zeros((c_cnt, s), jnp.float32), acc[:, :bm - s]], axis=1)
        acc = acc + spow_ref[0, s_idx] * shifted
    z_init = carry_ref[:, 2:3]                        # (C, 1)
    z = acc + z_init * jpow_ref[0:1, :]               # jpow[j] = a^{j+1}
    z_shift = jnp.concatenate([z_init, z[:, :bm - 1]], axis=1)
    audio = b0 * d + z_shift
    audio_ref[:, :] = audio

    # ---- carries for the next sequential grid step -----------------------
    carry_ref[:, 0:1] = f_re[:, bm - 1:bm]
    carry_ref[:, 1:2] = f_im[:, bm - 1:bm]
    carry_ref[:, 2:3] = z[:, bm - 1:bm]

    # ---- export final streaming state ------------------------------------
    @pl.when(i == n_i - 1)
    def _():
        fcar_ref[:, 0:1] = f_re[:, bm - 1:bm]
        fcar_ref[:, 1:2] = f_im[:, bm - 1:bm]
        zcar_ref[:, 0:1] = z[:, bm - 1:bm]


@functools.partial(
    jax.jit,
    static_argnames=("dec", "block_m", "p_cnt", "rows", "c_cnt", "gain",
                     "b0", "cc", "a1", "f32_dot", "interpret"))
def _run_chain(base, xp, gh, gl, bt, pj, fcar0, zcar0, *,
               dec, block_m, p_cnt, rows, c_cnt, gain, b0, cc, a1,
               f32_dot, interpret):
    _, mp = xp.shape
    k2t = gh.shape[1]
    m_out = mp - _LANE
    bm = block_m
    log_bm = int(np.log2(bm))

    a = -float(a1)
    spow = np.zeros((1, _MAX_LOG_BM), np.float32)
    for s in range(log_bm):
        spow[0, s] = a ** (1 << s)
    jpow = np.power(a, np.arange(1, bm + 1),
                    dtype=np.float64).astype(np.float32)[None, :]

    kernel = functools.partial(
        _fm_chain_kernel, p_cnt=p_cnt, rows=rows, c_cnt=c_cnt, dec=dec,
        gain=gain, b0=b0, cc=cc, log_bm=log_bm, f32_dot=f32_dot)

    n_blk = m_out // bm
    vm = pltpu.VMEM
    return pl.pallas_call(
        kernel,
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec((rows, bm), lambda i: (0, i), memory_space=vm),
            pl.BlockSpec((rows, _LANE),
                         lambda i: (0, (i * bm) // _LANE + bm // _LANE),
                         memory_space=vm),
            pl.BlockSpec((2 * c_cnt, k2t), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((2 * c_cnt, k2t), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((c_cnt, 2), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((c_cnt, _LANE), lambda i: (0, i),
                         memory_space=vm),
            pl.BlockSpec((2 * c_cnt, bm), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, _MAX_LOG_BM), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, bm), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((c_cnt, 2), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((c_cnt, 1), lambda i: (0, 0), memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((c_cnt, bm), lambda i: (0, i), memory_space=vm),
            pl.BlockSpec((c_cnt, 2), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((c_cnt, 1), lambda i: (0, 0), memory_space=vm),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c_cnt, m_out), jnp.float32),
            jax.ShapeDtypeStruct((c_cnt, 2), jnp.float32),
            jax.ShapeDtypeStruct((c_cnt, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((k2t, bm), jnp.float32),
            pltpu.VMEM((c_cnt, 8), jnp.float32),
        ],
        interpret=interpret,
    )(xp, xp, gh, gl, base, bt, pj, jnp.asarray(spow), jnp.asarray(jpow),
      fcar0, zcar0)


def fused_chain_supported(decimation, num_taps, m_out):
    """T % D == 0, 2D sublane-aligned, and a power-of-two block divides M."""
    return (num_taps % decimation == 0 and (2 * decimation) % _SUB == 0
            and m_out % _LANE == 0)


def _pick_bm(m, block_m):
    bm = _LANE
    while bm * 2 <= block_m and m % (bm * 2) == 0:
        bm *= 2
    return bm


def _phasor_tables(shifts_hz, sample_rate, dec, bm, n_blk):
    """Host-exact unit-phasor tables: pj (2C, bm) stacked [re; im] with
    pj[c, j] = e^{2i pi frac(f_c * D * j / Fs)}, and bt (C, 2*n_blk) with
    interleaved re/im of e^{2i pi frac(f_c * D * bm * i / Fs)}."""
    c_cnt = len(shifts_hz)
    pj = np.zeros((2 * c_cnt, bm), np.float32)
    # per-block phasor pair lives in its own 128-lane stripe (Mosaic block
    # shapes must be lane-128 aligned); lanes 0/1 hold re/im.
    bt = np.zeros((c_cnt, _LANE * n_blk), np.float32)
    fs = float(sample_rate)
    for c, f in enumerate(shifts_hz):
        f = float(f)
        if f.is_integer() and fs.is_integer():
            fi, fsi = int(f), int(fs)
            ang_j = 2.0 * np.pi * (
                (fi * dec * np.arange(bm, dtype=object)) % fsi
            ).astype(np.float64) / fsi
            ang_i = 2.0 * np.pi * (
                (fi * dec * bm * np.arange(n_blk, dtype=object)) % fsi
            ).astype(np.float64) / fsi
        else:
            ang_j = 2.0 * np.pi * np.mod(
                f * dec * np.arange(bm, dtype=np.float64), fs) / fs
            ang_i = 2.0 * np.pi * np.mod(
                f * dec * bm * np.arange(n_blk, dtype=np.float64), fs) / fs
        pj[c] = np.cos(ang_j)
        pj[c_cnt + c] = np.sin(ang_j)
        bt[c, 0::_LANE] = np.cos(ang_i)
        bt[c, 1::_LANE] = np.sin(ang_i)
    return pj, bt


def fm_chain_pallas(buf, kernel_bank, lo_table, n0_rot, decimation, gain,
                    deemph_b, deemph_a, carry_f, carry_z, shifts_hz=None,
                    sample_rate=None,
                    block_m=4096, precision="bf16x3", interpret=False):
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

    Returns (audio (C, M), new_carry_f, new_carry_z), M = (Nb - T)//D + 1,
    bit-compatible with the unfused FmChannelizer state pytree.
    """
    interpret = interpret or jax.default_backend() == "cpu"
    kh = np.asarray(kernel_bank)
    k2c, _, t = kh.shape
    c_cnt = k2c // 2
    d = int(decimation)
    n = buf.shape[-1]
    m = (n - t) // d + 1
    if not fused_chain_supported(d, t, m):
        raise ValueError(
            f"unsupported (D={d}, T={t}, M={m}) for fused chain")
    rows = 2 * d
    p_cnt = t // d
    bm = _pick_bm(m, block_m)
    total_cols = m + _LANE
    need = total_cols * d
    xr = jnp.pad(buf.re, (0, max(0, need - n)))[:need]
    xi = jnp.pad(buf.im, (0, max(0, need - n)))[:need]
    xp = jnp.stack([xr.reshape(total_cols, d), xi.reshape(total_cols, d)],
                   axis=-1).reshape(total_cols, rows).T

    import ml_dtypes

    g = _g_matrix_planes(kh, d)
    if precision in ("bf16x3", "bf16x2"):
        gh_np = g.astype(ml_dtypes.bfloat16)
        gl_np = (g - gh_np.astype(np.float32)).astype(ml_dtypes.bfloat16)
        gh, gl = jnp.asarray(gh_np), jnp.asarray(gl_np)
        f32_dot = precision
    else:
        gh = jnp.asarray(g)
        gl = jnp.asarray(np.zeros_like(g))
        f32_dot = "f32"

    b0 = float(deemph_b[0]) / float(deemph_a[0])
    b1 = float(deemph_b[1]) / float(deemph_a[0])
    a1 = float(deemph_a[1]) / float(deemph_a[0])
    cc = b1 - a1 * b0  # TDF-II input coefficient

    # traced base phasor e^{2i pi frac(f_c * n0 / Fs)} via the digit table
    # (XLA-side: C sin/cos evaluations, negligible)
    from gsdr_tpu.utils.phase import phase_fraction_from_table

    table = jnp.asarray(np.asarray(lo_table, np.float32))
    frac0 = phase_fraction_from_table(
        jnp.asarray(n0_rot, jnp.int32).reshape(1), table[:, None, :])
    theta0 = _TWO_PI * frac0  # (C, 1)
    base = jnp.concatenate(
        [jnp.cos(theta0), jnp.sin(theta0)], axis=1)  # (C, 2)

    n_blk = m // bm
    pj_np, bt_np = _phasor_tables(shifts_hz, sample_rate, d, bm, n_blk)
    fcar0 = jnp.concatenate([carry_f.re, carry_f.im], axis=1)  # (C, 2)

    audio, fcar, zcar = _run_chain(
        base, xp, gh, gl, jnp.asarray(bt_np), jnp.asarray(pj_np),
        fcar0, jnp.asarray(carry_z),
        dec=d, block_m=bm, p_cnt=p_cnt, rows=rows, c_cnt=c_cnt,
        gain=float(gain), b0=b0, cc=cc, a1=a1,
        f32_dot=f32_dot, interpret=interpret)
    new_f = ComplexArray(fcar[:, 0:1], fcar[:, 1:2])
    return audio[:, :m], new_f, zcar
