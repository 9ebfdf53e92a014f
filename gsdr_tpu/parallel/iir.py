"""Exact IIR filtering across a time-sharded sample axis.

The IIR recurrence is the one true sequential dependency in the op set
(SURVEY.md section 5). The reference sidesteps it by resetting state every
8-32 samples (/root/reference/src/iir.cu:118-127) — approximate. Here it is
exact across chips, extending the blocked-scan decomposition of
gsdr_tpu.ops.iir one level up the hierarchy:

  1. every time shard runs the local blocked scan from zero state, yielding
     local outputs y0 and its zero-state final state d_s (order-m vector);
  2. one all_gather over the time axis moves all d_s (shards x m floats —
     a few hundred bytes) to every chip;
  3. each shard computes its true start state  z_s = M^{Ls} zi +
     sum_{k<s} M^{L(s-1-k)} d_k  using host-precomputed powers of the
     state-transition matrix (static coefficients => numpy constants), and
  4. corrects its outputs with one (batch, m) x (m, L) matmul:
     y = y0 + z_s K^T,  K[t] = e0^T M^t  — linearity makes this exact.

Total communication: one small all_gather. No ring, no log-depth scan needed
at realistic shard counts.
"""

import numpy as np

import jax.numpy as jnp
from jax import lax

from gsdr_tpu.ops.iir import iir_block


def _host_state_space(b, a):
    """numpy float64 (M, K-rows generator) matching ops.iir._state_space."""
    b = np.asarray(b, np.float64)
    a = np.asarray(a, np.float64)
    b = b / a[0]
    a = a / a[0]
    m = b.shape[0] - 1
    M = np.zeros((m, m))
    M[:, 0] = -a[1:]
    for i in range(m - 1):
        M[i, i + 1] = 1.0
    return M


def _host_powers(M, L):
    """K (L, m) with K[t] = e0^T M^t, and M^L — numpy, host-side."""
    m = M.shape[0]
    K = np.zeros((L, m))
    row = np.zeros(m)
    row[0] = 1.0
    for t in range(L):
        K[t] = row
        row = row @ M
    return K, np.linalg.matrix_power(M, L)


def sharded_iir(b, a, x_local, zi, axis_name, num_shards, block_len=128):
    """Exact IIR over a time-sharded last axis; call inside shard_map.

    Args:
      b, a: static coefficient sequences (Python floats), scipy convention.
      x_local: (..., L) this shard's contiguous time block.
      zi: (..., m) global initial state, replicated over ``axis_name`` (None
        for zero state).
      axis_name: the time mesh axis.
      num_shards: static size of that axis (mesh shape is static anyway).
      block_len: intra-shard scan block length (perf knob).

    Returns:
      (y_local (..., L), zf (..., m) global final state, replicated) —
      bit-stable continuation for the next streaming step.
    """
    t = int(num_shards)
    L = x_local.shape[-1]
    m = len(b) - 1
    M = _host_state_space(b, a)
    K, M_L = _host_powers(M, L)
    # P[j] = M^{L*j}, j = 0..t  (t+1 entries: index t used for global zf)
    P = np.stack([np.linalg.matrix_power(M_L, j) for j in range(t + 1)])
    Pj = jnp.asarray(P, jnp.float32)
    Kj = jnp.asarray(K, jnp.float32)

    bj = jnp.asarray(b, jnp.float32)
    aj = jnp.asarray(a, jnp.float32)
    zeros = jnp.zeros(x_local.shape[:-1] + (m,), jnp.float32)
    y0, d_local = iir_block(bj, aj, x_local, zi=zeros, block_len=block_len)

    d_all = lax.all_gather(d_local, axis_name)  # (t, ..., m)
    if zi is None:
        zi = zeros

    s = lax.axis_index(axis_name)
    # z_start for this shard: M^{L*s} zi + sum_{k<s} M^{L*(s-1-k)} d_k
    z = jnp.einsum("...m,nm->...n", zi, Pj[s], precision="highest")
    zf = jnp.einsum("...m,nm->...n", zi, Pj[t], precision="highest")
    for k in range(t):
        contrib = jnp.einsum("...m,nm->...n", d_all[k],
                             Pj[jnp.clip(s - 1 - k, 0, t)],
                             precision="highest")
        z = z + jnp.where(k < s, 1.0, 0.0) * contrib
        zf = zf + jnp.einsum("...m,nm->...n", d_all[k], Pj[t - 1 - k], precision="highest")

    y = y0 + jnp.einsum("...m,lm->...l", z, Kj, precision="highest")
    return y, zf
