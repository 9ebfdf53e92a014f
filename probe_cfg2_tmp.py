"""Stage probe of the standalone fused channelizer (config 2) on HW.

Rows: kernel-only (sum of raw r-major out), kernel+uninterleave+sum,
prep-only composite, and the production run_all step — localizes where
the 486 us/step (2159 Msps) goes when the bare kernel should be ~50 us.
"""
import json
import numpy as np
import jax
import jax.numpy as jnp

from gsdr_tpu.carray import ComplexArray
from gsdr_tpu.kernels import channelize_pallas as cp
from gsdr_tpu.kernels import fm_chain_pallas as fcp
from gsdr_tpu.ops.channelize import make_complex_tap_bank
from gsdr_tpu.utils.timing import time_step

N = 1 << 20


def _lowpass(nt, cf):
    n = np.arange(nt) - (nt - 1) / 2.0
    h = np.sinc(2 * cf * n) * np.hamming(nt)
    return (h / h.sum()).astype(np.float64)


kernel = make_complex_tap_bank(_lowpass(64, 0.1), [12_345.0], 1e6)
rng = np.random.default_rng(0)
rf = ComplexArray(jnp.asarray(rng.standard_normal(N), jnp.float32),
                  jnp.asarray(rng.standard_normal(N), jnp.float32))

kh = np.asarray(kernel)
t = kh.shape[-1]
d = 4
m = (N - t) // d + 1
c_eff, r_stack, groups, _ = fcp._stack_geometry(1, t, d, m, pad_m=True)
rows = r_stack * 2 * d
cap = max(fcp._LANE, 3_500_000 // (
    2 * r_stack * 2 * c_eff + groups * rows + 3 * rows))
bn = fcp._pick_bn_padded(-(-m // r_stack), cap, 4096)
m_eff = -(-m // (r_stack * bn)) * (r_stack * bn)
n_j = m_eff // r_stack
g = fcp._g_matrix_stacked(fcp._pad_bank(kh, c_eff), d, c_eff, r_stack,
                          groups, order="planar")
gh, gl, f32_dot = fcp._split_g(g, "bf16x3")
print(json.dumps({"geom": [c_eff, r_stack, groups, bn, n_j]}), flush=True)


def run(name, step, state, block, iters=1000):
    sec = time_step(step, state, block, iters=iters, reps=5)
    print(json.dumps({"stage": name, "us": round(sec * 1e6, 1),
                      "msps": round(N / sec / 1e6, 1)}), flush=True)


# 1) kernel only, raw r-major out, full checksum
def step_kernel(st, x):
    x2 = ComplexArray(x.re + st * 1e-30, x.im)
    xq = fcp._xq_prep(x2, d, r_stack, n_j + fcp._LANE, mode="nt")
    out = cp._run(xq, gh, gl, block_n=bn, groups=groups, rows=rows,
                  c_eff=c_eff, r_stack=r_stack, f32_dot=f32_dot,
                  interpret=False, xq_mode="nt")
    return jnp.sum(out) * 1e-9, out


run("prep+kernel_raw", step_kernel, jnp.float32(0.0), rf)


# 2) + uninterleave + slice + full checksum (the production wrapper path)
def step_full(st, x):
    x2 = ComplexArray(x.re + st * 1e-30, x.im)
    y = cp.mix_fir_decimate_bank_pallas(x2, kernel, d)
    return (jnp.sum(y.re) + jnp.sum(y.im)) * 1e-9, y


run("wrapper_full", step_full, jnp.float32(0.0), rf)


# 3) uninterleave measured against a checksum that can't absorb it:
#    consume out[:, ::4097] (strided slice forces materialization-ish)
def step_full_slice(st, x):
    x2 = ComplexArray(x.re + st * 1e-30, x.im)
    y = cp.mix_fir_decimate_bank_pallas(x2, kernel, d)
    return jnp.sum(y.re[:, :1]) * 1e-9 + st * 0.5, y


run("wrapper_colslice", step_full_slice, jnp.float32(0.0), rf)
