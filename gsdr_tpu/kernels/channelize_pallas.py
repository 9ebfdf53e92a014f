"""Fused channelizer conv as a Pallas TPU kernel.

Computes the same contraction as ops/channelize.mix_fir_decimate_bank —
y[c, j] = sum_t x[j*D + t] * g_c[t] over a bank of complex taps — but
without XLA's HBM im2col. The insight: transpose the matmul so the window
matrix's rows are SHIFTED COPIES of the phase-split input,

    x is reshaped host-side to xp (2D, M) with row (p*2 + plane) holding
    plane(x[j*D + p]); then

    W (2T, BM) with W[k*2D + q, j] = xp[q, j0 + j + k]      (k < T/D)
    y (2C, BM) = G (2C, 2T) @ W

so building W is T/D shifted (2D, BM) copies inside VMEM — cheap VPU moves
of data DMA'd from HBM exactly once — followed by one MXU matmul per block
with the full output width as the N dimension. The reference computes this
same window reuse through its per-thread tap loop over global memory with a
hardware cache (/root/reference/src/fir.cu:57-70, src/adjustFrequency.cu:
36-55); on TPU the reuse is explicit VMEM residency.

Requires T % D == 0 (pad taps with zeros otherwise) and 2*T and 2*D
aligned to the f32 tile sublane (8): D in {1, 4 (then 2D=8 rows)} etc.; the
wrapper pads as needed.
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


def pallas_supported(decimation, num_taps):
    """The kernel requires T % D == 0 and 2D a multiple of the f32 sublane
    tile (8), i.e. D in {4, 8, 12, ...}; other configs use the XLA conv."""
    return num_taps % decimation == 0 and (2 * decimation) % _SUB == 0


def _g_matrix(kernel_np, decimation):
    """(2C, 2, T) conv kernel -> (2C, 2T) contraction matrix G matching the
    W row order k*2D + (p*2 + plane)."""
    k2c, _, t = kernel_np.shape
    d = decimation
    p_cnt = t // d
    g = np.zeros((k2c, 2 * t), np.float32)
    for k in range(p_cnt):
        for p in range(d):
            for plane in range(2):
                g[:, k * 2 * d + p * 2 + plane] = \
                    kernel_np[:, plane, k * d + p]
    return g


def _channelize_kernel(xp_ref, halo_ref, gh_ref, gl_ref, out_ref, w_ref, *,
                       p_cnt, rows):
    """One grid step: build W (2T, BM) from shifted copies, then a 3-pass
    bf16x3 MXU contraction.

    An f32 matmul on the MXU costs ~6 bf16 passes; splitting both operands
    into (hi, lo) bf16 and keeping the three significant cross terms
    gh*wh + gh*wl + gl*wh costs 3 passes. Observed accuracy: ~1e-4
    relative in interpreter mode, ~1e-3 on hardware (Mosaic bf16 rounding)
    — acceptable for RF signal paths (ADC noise floors are far higher),
    which is why this kernel is opt-in (impl='pallas') rather than the
    default f32 conv path."""
    bm = out_ref.shape[1]
    v = jnp.concatenate([xp_ref[:, :], halo_ref[:, :]], axis=1)
    for k in range(p_cnt):
        w_ref[k * rows:(k + 1) * rows, :] = v[:, k:k + bm]
    w = w_ref[:, :]
    wh = w.astype(jnp.bfloat16)
    wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
    gh = gh_ref[:, :]
    gl = gl_ref[:, :]
    acc = jnp.dot(gh, wh, preferred_element_type=jnp.float32)
    acc += jnp.dot(gh, wl, preferred_element_type=jnp.float32)
    acc += jnp.dot(gl, wh, preferred_element_type=jnp.float32)
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("decimation", "block_m"))
def _run(xp, gh, gl, decimation, block_m):
    rows, mp = xp.shape            # rows = 2D, mp = padded M + halo
    k2c, k2t = gh.shape
    p_cnt = k2t // rows            # T/D shifts
    m_out = mp - _LANE             # output positions (halo columns at tail)
    bm = block_m
    grid = (m_out // bm,)

    kernel = functools.partial(_channelize_kernel, p_cnt=p_cnt, rows=rows)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, bm), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            # halo: the next _LANE columns after this block
            pl.BlockSpec((rows, _LANE), lambda i: (0, (i * bm) // _LANE + bm // _LANE),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2c, k2t), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2c, k2t), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k2c, bm), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k2c, m_out), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k2t, bm), jnp.float32)],
    )(xp, xp, gh, gl)


def mix_fir_decimate_bank_pallas(x, kernel, decimation, block_m=1024,
                                 interpret=False):
    """Pallas drop-in for ops.channelize.mix_fir_decimate_bank.

    x: planar ComplexArray (N,) (1-D only; batch via vmap). Returns planar
    (C, M) with M = (N - T)//D + 1, identical semantics to the XLA path.
    """
    if x.ndim != 1:
        raise ValueError("pallas channelizer takes 1-D x; vmap for batches")
    kh = np.asarray(kernel)
    k2c, _, t = kh.shape
    d = int(decimation)
    if not pallas_supported(d, t):
        raise ValueError(f"unsupported (D={d}, T={t}) for pallas kernel")
    n = x.shape[-1]
    m = (n - t) // d + 1

    rows = 2 * d
    p_cnt = t // d
    # phase-split: xp[q, j] with q = p*2 + plane -> plane(x[j*D + p]).
    # Pad so that every block's halo read stays in bounds:
    # columns needed: m + (p_cnt - 1); pad m up to block multiple + _LANE.
    bm = min(block_m, max(_LANE, (m // _LANE) * _LANE) or _LANE)
    m_pad = ((m + bm - 1) // bm) * bm
    total_cols = m_pad + _LANE
    need = total_cols * d  # raw samples per phase grid
    xr = jnp.pad(x.re, (0, max(0, need - n)))[:need]
    xi = jnp.pad(x.im, (0, max(0, need - n)))[:need]
    xr2 = xr.reshape(total_cols, d)   # [j, p]
    xi2 = xi.reshape(total_cols, d)
    xp = jnp.stack([xr2, xi2], axis=-1)          # [j, p, plane]
    xp = xp.reshape(total_cols, rows).T          # (2D, total_cols)
    xp = jnp.ascontiguousarray(xp) if hasattr(jnp, "ascontiguousarray") else xp

    import ml_dtypes  # ships with jax

    g = _g_matrix(kh, d)                         # (2C, 2T) float64-accurate
    gh_np = g.astype(ml_dtypes.bfloat16)         # host-side split (numpy),
    gl_np = (g - gh_np.astype(np.float32)).astype(ml_dtypes.bfloat16)
    gh = jnp.asarray(gh_np)                      # safe under an active trace
    gl = jnp.asarray(gl_np)

    if interpret:
        out = _run_interpret(xp, gh, gl, d, bm)
    else:
        out = _run(xp, gh, gl, d, bm)
    out = out[:, :m]
    c = k2c // 2
    out = out.reshape(c, 2, m)
    return ComplexArray(out[:, 0, :], out[:, 1, :])


@functools.partial(jax.jit, static_argnames=("decimation", "block_m"))
def _run_interpret(xp, gh, gl, decimation, block_m):
    """Interpreter-mode fallback (CPU tests)."""
    rows, mp = xp.shape
    k2c, k2t = gh.shape
    p_cnt = k2t // rows
    m_out = mp - _LANE
    bm = block_m
    kernel = functools.partial(_channelize_kernel, p_cnt=p_cnt, rows=rows)
    return pl.pallas_call(
        kernel,
        grid=(m_out // bm,),
        in_specs=[
            pl.BlockSpec((rows, bm), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, _LANE), lambda i: (0, (i * bm) // _LANE + bm // _LANE),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2c, k2t), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2c, k2t), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k2c, bm), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k2c, m_out), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k2t, bm), jnp.float32)],
        interpret=True,
    )(xp, xp, gh, gl)
