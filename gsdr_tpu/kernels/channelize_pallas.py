"""Fused channelizer conv as a Pallas TPU kernel (stacked-MXU layout).

Computes the same contraction as ops/channelize.mix_fir_decimate_bank —
y[c, j] = sum_t x[j*D + t] * g_c[t] over a bank of complex taps — without
XLA's HBM im2col, sharing the round-2 stacked machinery of
kernels/fm_chain_pallas.py: R consecutive decimated outputs stack into
the MXU M dimension (G' (R*2C, K) @ W' (K, BN)), the window matrix W' is
built from full-height shifted copies of the coarse-column phase-split
input inside VMEM, and any output length works (stateless kernel — M
pads up to a multiple of R*128 and the outputs slice back).

The reference computes the same window reuse through its per-thread tap
loop over global memory with a hardware cache
(/root/reference/src/fir.cu:57-70, src/adjustFrequency.cu:36-55); on TPU
the reuse is explicit VMEM residency and the channel bank is one matmul.

Any T works (T % D != 0 trailing-zero-pads the taps, round 4); the
round-1 restriction 2D % 8 == 0 (which excluded D in {1, 2}) is gone —
the alignment unit is now R*2D.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsdr_tpu.backend import is_tpu_backend
from gsdr_tpu.carray import ComplexArray
from gsdr_tpu.kernels.fm_chain_pallas import (
    _LANE,
    _build_v,
    _g_matrix_stacked,
    _n_coarse_of,
    _n_xq_parts,
    _pad_bank,
    _pad_taps,
    _pick_bn_padded,
    _split_g,
    _stack_geometry,
    _window_dot,
    _xq_prep,
    _xq_specs,
)


def pallas_supported(decimation, num_taps, num_channels=1):
    """True when the stacked kernel covers this filter shape: the taps
    (zero-padded to a D multiple) must fit the 128-coarse-column halo."""
    return _stack_geometry(int(num_channels), int(num_taps),
                           int(decimation), _LANE * 8, pad_m=True) is not None


def _channelize_kernel(*refs, groups, rows, c_eff, r_stack, f32_dot,
                       xq_mode):
    """One grid step: stacked windows + bf16x3 (or f32) MXU contraction.

    Output rows are r-major ((r*2C + plane_row); the wrapper interleaves
    back to (2C, M))."""
    nx = _n_xq_parts(xq_mode)
    xq_refs, halo_refs = refs[:nx], refs[nx:2 * nx]
    gh_ref, gl_ref, out_ref, w_ref = refs[2 * nx:]
    bn = out_ref.shape[1]
    v = _build_v(xq_refs, halo_refs, xq_mode)
    out_ref[:, :] = _window_dot(v, gh_ref, gl_ref, w_ref, bn,
                                groups, rows, f32_dot,
                                nt=xq_mode in ("nt", "ntc"))


@functools.partial(
    jax.jit,
    static_argnames=("block_n", "groups", "rows", "c_eff", "r_stack",
                     "f32_dot", "interpret", "xq_mode"))
def _run(xq, gh, gl, *, block_n, groups, rows, c_eff, r_stack, f32_dot,
         interpret, xq_mode="flat"):
    xq_parts = xq if isinstance(xq, tuple) else (xq,)
    n_coarse_total = _n_coarse_of(xq_parts[0], xq_mode)
    k_rows = gh.shape[1]
    n_out = n_coarse_total - _LANE
    bn = block_n
    kernel = functools.partial(_channelize_kernel, groups=groups, rows=rows,
                               c_eff=c_eff, r_stack=r_stack, f32_dot=f32_dot,
                               xq_mode=xq_mode)
    vm = pltpu.VMEM
    xq_specs, halo_specs = _xq_specs(xq_mode, rows, bn)
    w_shape = ((bn, k_rows) if xq_mode in ("nt", "ntc")
               else (k_rows, bn))
    w_dtype = jnp.bfloat16 if f32_dot == "bf16x2" else jnp.float32
    return pl.pallas_call(
        kernel,
        grid=(n_out // bn,),
        in_specs=list(xq_specs) + list(halo_specs) + [
            pl.BlockSpec(gh.shape, lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec(gl.shape, lambda i: (0, 0), memory_space=vm),
        ],
        out_specs=pl.BlockSpec((r_stack * 2 * c_eff, bn), lambda i: (0, i),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((r_stack * 2 * c_eff, n_out),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM(w_shape, w_dtype)],
        interpret=interpret,
    )(*xq_parts, *xq_parts, gh, gl)


def mix_fir_decimate_bank_pallas(x, kernel, decimation, block_n=4096,
                                 precision="bf16x3", interpret=False,
                                 xq_mode="nt"):
    """Pallas drop-in for ops.channelize.mix_fir_decimate_bank.

    x: planar ComplexArray (N,) (1-D only; batch via vmap). Returns planar
    (C, M) with M = (N - T)//D + 1, identical semantics to the XLA path
    (bf16x3 contraction: ~1e-4 relative; pass precision='f32' for exact).
    """
    if x.ndim != 1:
        raise ValueError("pallas channelizer takes 1-D x; vmap for batches")
    interpret = interpret or not is_tpu_backend()
    kh = np.asarray(kernel)
    k2c, _, t = kh.shape
    c_cnt = k2c // 2
    d = int(decimation)
    n = x.shape[-1]
    m = (n - t) // d + 1    # output count from the REAL tap span
    kh = _pad_taps(kh, d)   # T % D != 0: output-identical zero taps
    geom = _stack_geometry(c_cnt, t, d, m, pad_m=True)
    if geom is None:
        raise ValueError(f"unsupported (D={d}, T={t}) for pallas kernel")
    c_eff, r_stack, groups, _ = geom
    rows = r_stack * 2 * d
    # VMEM guard. Measured footprint model (round 3 — the old 1.5*M + K
    # estimate let the C=1/T=64/D=4 shape pick bn=4096 and OOM scoped
    # VMEM at 19.4M > 16M on HW): per bn column, f32 words ~ y (M) +
    # out block (M) + W'^T scratch (K) + the v concat (rows) + the
    # double-buffered xq operands (2*rows) = 2M + K + 3*rows.
    cap = max(_LANE, 3_500_000 // (
        2 * r_stack * 2 * c_eff + groups * rows + 3 * rows))
    bn = _pick_bn_padded(-(-m // r_stack), cap, block_n)
    m_eff = -(-m // (r_stack * bn)) * (r_stack * bn)
    n_j = m_eff // r_stack
    xq = _xq_prep(x, d, r_stack, n_j + _LANE, mode=xq_mode)
    g = _g_matrix_stacked(_pad_bank(kh, c_eff), d, c_eff, r_stack, groups,
                          order="planar" if xq_mode in ("nt", "ntc")
                          else "interleaved")
    gh, gl, f32_dot = _split_g(g, precision)
    out = _run(xq, gh, gl, block_n=bn, groups=groups, rows=rows,
               c_eff=c_eff, r_stack=r_stack, f32_dot=f32_dot,
               interpret=interpret, xq_mode=xq_mode)
    # r-major (R*2C_eff, n_j) -> (2C_eff, m_eff): within each r-group the
    # rows are planes-major (re channels at 0, im channels at c_eff).
    # Slice the REAL channel rows BEFORE the un-interleave transpose: XLA
    # materializes the transpose at full padded width otherwise (measured
    # on HW at C=1/T=64/D=4/2^20: the full (16,16,16384) transpose is
    # ~423 us of a 486 us step — 87% — while the kernel+prep is 60.5 us;
    # transposing only the c_cnt rows cuts the relayout by c_eff/c_cnt).
    a = out.reshape(r_stack, 2 * c_eff, n_j)
    re = jnp.transpose(a[:, :c_cnt, :], (1, 2, 0))
    im = jnp.transpose(a[:, c_eff:c_eff + c_cnt, :], (1, 2, 0))
    return ComplexArray(re.reshape(c_cnt, n_j * r_stack)[:, :m],
                        im.reshape(c_cnt, n_j * r_stack)[:, :m])
