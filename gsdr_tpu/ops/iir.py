"""IIR filtering as an exact blocked parallel scan.

Capability parity with gsdrIirFF/CC and the *Custom variants
(/root/reference/src/iir.cu:341-394,499-533; API include/gsdr/iir.h:87-191).
Semantics are scipy-style Direct Form: with a[0] = 1,

    y[n] = sum_i b[i] x[n-i] - sum_{i>=1} a[i] y[n-i]

matching the reference recurrence (src/iir.cu:158-178). The reference
*approximates* this: each CUDA thread owns 8-32 consecutive samples with
zero-initialized private history, so filter state resets every chunk
(src/iir.cu:118-127 — SURVEY.md section 2.2 caveat 5). This implementation
is EXACT while still parallel, via the state-space block decomposition:

Transposed Direct Form II state z in R^m (m = order = coeff_count - 1):

    y[n]   = b0 x[n] + z[n-1][0]
    z[n]   = M z[n-1] + c x[n]

with M[i,0] = -a[i+1], M[i,i+1] = 1, and c[i] = b[i+1] - a[i+1] b0 — a
*linear* recurrence, so it block-decomposes exactly:

  1. zero-state pass: split x into B blocks of L; run the recurrence inside
     every block simultaneously from z = 0 (one length-L scan over (B, m)
     vectors — the VPU-parallel axis is B);
  2. cross-block combine: true block-start states follow the affine
     recurrence Z[b+1] = M^L Z[b] + d[b]; composed with
     lax.associative_scan in log2(B) steps;
  3. correction: the initial-state contribution to in-block outputs is
     Z_start @ K^T with K[t] = e0^T M^t — one (B, m) x (m, L) MXU matmul.

The reference's `samplesPerThread` tuning knob (include/gsdr/iir.h:158)
becomes ``block_len``. Numerical note: M^t decays for stable filters, so the
f32 composition is well-conditioned; for high orders prefer iir_sos
(cascaded biquads), the standard conditioning fix the reference lacks.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

_MIN_COEFFS = 2
_MAX_COEFFS = 32  # reference validation range, src/iir.cu:243-249


def _normalize_coeffs(b, a, dtype):
    b = jnp.asarray(b, dtype=dtype)
    a = jnp.asarray(a, dtype=dtype)
    if b.ndim != 1 or a.ndim != 1 or b.shape[0] != a.shape[0]:
        raise ValueError("b and a must be 1-D with equal length (reference "
                         "coeffCount contract, include/gsdr/iir.h:99)")
    nc = b.shape[0]
    if not (_MIN_COEFFS <= nc <= _MAX_COEFFS):
        raise ValueError(f"coeff count must be in [{_MIN_COEFFS}, {_MAX_COEFFS}], got {nc}")
    b = b / a[0]
    a = a / a[0]
    return b, a


def _state_space(b, a):
    """(M, c, b0) for the transposed DF-II recurrence above."""
    m = b.shape[0] - 1
    b0 = b[0]
    col = -a[1:]
    shift = jnp.eye(m, k=1, dtype=b.dtype)
    M = shift.at[:, 0].add(col)
    c = b[1:] - a[1:] * b0
    return M, c, b0


def _powers(M, L):
    """K (L, m) with K[t] = e0^T M^t, and M^L (m, m)."""
    m = M.shape[0]
    e0 = jnp.zeros((m,), M.dtype).at[0].set(1)

    def step(carry, _):
        row, P = carry
        return (row @ M, P @ M), row

    (_, M_L), rows = lax.scan(step, (e0, jnp.eye(m, dtype=M.dtype)), None, length=L)
    return rows, M_L


def _iir_1d(b, a, x, zi, block_len):
    dtype = x.dtype
    M, c, b0 = _state_space(b, a)
    m = M.shape[0]
    n = x.shape[0]
    L = min(block_len, max(n, 1))
    B = -(-n // L)
    pad = B * L - n
    xb = jnp.pad(x, (0, pad)).reshape(B, L)

    # 1) zero-state pass over all blocks simultaneously. The last block holds
    # only `rem` real samples (the rest is padding), so additionally capture
    # its zero-state state after `rem` steps for the exact final state.
    MT = M.T
    rem = n - (B - 1) * L  # real samples in the last block, in [1, L]

    def zs_step(carry, inp):
        z, z_rem = carry
        x_t, t = inp
        y_t = b0 * x_t + z[:, 0]
        z_new = z @ MT + x_t[:, None] * c
        z_rem = jnp.where(t == rem - 1, z_new[-1], z_rem)
        return (z_new, z_rem), y_t

    z0 = jnp.zeros((B, m), dtype)
    (d, z_rem_last), y_zs = lax.scan(
        zs_step, (z0, jnp.zeros((m,), dtype)), (xb.T, jnp.arange(L))
    )
    y_zs = y_zs.T  # (B, L)

    # 2) cross-block affine combine: Z[b+1] = M_L Z[b] + d[b].
    K, M_L = _powers(M, L)

    def combine(left, right):
        # Affine map composition right(left(z)); operands carry a leading
        # scan axis inside associative_scan, so batch the matvec explicitly.
        A1, u1 = left
        A2, u2 = right
        return A2 @ A1, (A2 @ u1[..., None])[..., 0] + u2

    A_all = jnp.broadcast_to(M_L, (B, m, m))
    E_A, E_u = lax.associative_scan(combine, (A_all, d))
    # Z_start[b] = effect of blocks 0..b-1 applied to zi.
    zi = jnp.zeros((m,), dtype) if zi is None else jnp.asarray(zi, dtype)
    z_starts_tail = E_u[:-1] + E_A[:-1] @ zi
    z_start = jnp.concatenate([zi[None, :], z_starts_tail], axis=0)  # (B, m)
    # Exact final state: evolve the last block's true start state through its
    # `rem` real samples only (not the zero padding).
    M_rem = jnp.linalg.matrix_power(M, rem)
    z_final = M_rem @ z_start[-1] + z_rem_last

    # 3) initial-state correction: one MXU matmul.
    y = y_zs + z_start @ K.T
    return y.reshape(-1)[:n], z_final


def _pallas_dispatchable(b, a, x, impl):
    """True when the pole-diagonalized Pallas kernel should take this call:
    concrete coefficients, 1-D signal, TPU backend (or impl forced)."""
    if impl == "xla":
        return False
    if isinstance(b, jax.core.Tracer) or isinstance(a, jax.core.Tracer):
        return False
    from gsdr_tpu.carray import is_planar

    ndim = x.ndim if (is_planar(x) or hasattr(x, "ndim")) else \
        np.asarray(x).ndim
    if ndim != 1:
        return False
    if impl != "pallas" and jax.default_backend() == "cpu":
        return False
    from gsdr_tpu.kernels.iir_pallas import iir_pallas_supported

    return iir_pallas_supported(np.asarray(b), np.asarray(a))


def iir_block(b, a, x, zi=None, block_len=128, impl="auto"):
    """IIR filter returning (y, final_state) for streaming continuation.

    ``zi`` / the returned state are transposed-DF-II state vectors of length
    coeff_count - 1 (the functional replacement for the reference's ignored
    history pointers, include/gsdr/iir.h:74-75 — here they actually work).
    Supports leading batch axes on ``x``. A planar ComplexArray ``x`` with
    real coefficients (the gsdrIirCC capability — its coefficients are float,
    include/gsdr/iir.h:91-92) filters the two planes independently, which is
    exact by linearity.

    ``impl``: 'auto' routes 1-D signals with concrete order-<=8 coefficients
    through the pole-diagonalized Pallas kernel on TPU
    (kernels/iir_pallas.py — removes the sequential-scan bottleneck);
    'xla'/'pallas' force a path.
    """
    import numpy as _np

    if _pallas_dispatchable(b, a, x, impl):
        from gsdr_tpu.carray import ComplexArray, is_planar
        from gsdr_tpu.kernels.iir_pallas import iir_pallas

        bb, aa = _np.asarray(b, _np.float64), _np.asarray(a, _np.float64)
        if is_planar(x):
            yr, zr = iir_pallas(bb, aa, x.re, zi=None if zi is None else zi.re)
            yi, zim = iir_pallas(bb, aa, x.im,
                                 zi=None if zi is None else zi.im)
            return ComplexArray(yr, yi), ComplexArray(zr, zim)
        return iir_pallas(bb, aa, x, zi=zi)
    return _iir_block_xla(b, a, x, zi=zi, block_len=block_len)


@functools.partial(jax.jit, static_argnames=("block_len",))
def _iir_block_xla(b, a, x, zi=None, block_len=128):
    """Exact blocked-parallel-scan path (module docstring algorithm)."""
    from gsdr_tpu.carray import ComplexArray, is_planar

    if is_planar(x):
        xs = jnp.stack([x.re, x.im], axis=0)
        zis = None if zi is None else jnp.stack([zi.re, zi.im], axis=0)
        y, zf = _iir_block_xla(b, a, xs, zi=zis, block_len=block_len)
        return ComplexArray(y[0], y[1]), ComplexArray(zf[0], zf[1])

    x = jnp.asarray(x)
    dtype = jnp.promote_types(x.dtype, jnp.asarray(b).dtype)
    dtype = jnp.promote_types(dtype, jnp.float32)
    x = x.astype(dtype)
    b, a = _normalize_coeffs(b, a, dtype)

    batch_shape = x.shape[:-1]
    xb = x.reshape((-1, x.shape[-1]))
    if zi is None:
        zi_b = jnp.zeros((xb.shape[0], b.shape[0] - 1), dtype)
    else:
        zi_b = jnp.asarray(zi, dtype).reshape((-1, b.shape[0] - 1))
    # f32 matmul precision: TPU matmuls default to bf16, which silently
    # breaks the exactness contract of the blocked scan (state-transition
    # compositions are tiny m x m matrices — HIGHEST costs nothing here)
    with jax.default_matmul_precision("float32"):
        y, zf = jax.vmap(
            lambda xi, zii: _iir_1d(b, a, xi, zii, block_len))(xb, zi_b)
    return (
        y.reshape(batch_shape + (x.shape[-1],)),
        zf.reshape(batch_shape + (b.shape[0] - 1,)),
    )


def iir(b, a, x, zi=None, block_len=128, impl="auto"):
    """Exact IIR filter along the last axis (covers gsdrIirFF/CC/Custom).

    ``block_len`` is a performance knob only (the reference's
    samplesPerThread analog); results are exact for any value.
    """
    y, _ = iir_block(b, a, x, zi=zi, block_len=block_len, impl=impl)
    return y


def iir_reference(b, a, x, zi=None):
    """Golden sequential implementation (lax.scan, one sample at a time).

    Bit-for-bit the recurrence the reference documents (src/iir.cu:158-178)
    with correct (never-reset) state; used to validate the blocked scan.
    """
    x = jnp.asarray(x)
    dtype = jnp.promote_types(x.dtype, jnp.asarray(b).dtype)
    dtype = jnp.promote_types(dtype, jnp.float32)
    x = x.astype(dtype)
    b, a = _normalize_coeffs(b, a, dtype)
    M, c, b0 = _state_space(b, a)
    m = M.shape[0]

    def step(z, x_t):
        y_t = b0 * x_t + z[0]
        z = M @ z + c * x_t
        return z, y_t

    def run(x1):
        z = jnp.zeros((m,), dtype) if zi is None else jnp.asarray(zi, dtype)
        _, y = lax.scan(step, z, x1)
        return y

    batch_shape = x.shape[:-1]
    with jax.default_matmul_precision("float32"):
        y = jax.vmap(run)(x.reshape((-1, x.shape[-1])))
    return y.reshape(batch_shape + (x.shape[-1],))


def iir_sos_block(sos, x, zi=None, block_len=128):
    """Cascade of second-order sections returning (y, final_state).

    ``sos`` is (S, 6) scipy-style [b0 b1 b2 a0 a1 a2] rows. ``zi`` / the
    returned state stack per-section transposed-DF-II states along a
    LEADING axis: shape (S,) + batch + (2,) — so long streams keep exact
    continuity section by section (the capability the reference's ignored
    history pointers pretend to offer, include/gsdr/iir.h:74-75).
    """
    sos = jnp.asarray(sos)
    n_sec = sos.shape[0]
    y = x
    zfs = []
    for s in range(n_sec):
        zi_s = None if zi is None else zi[s]
        y, zf = iir_block(sos[s, :3], sos[s, 3:], y, zi=zi_s,
                          block_len=block_len)
        zfs.append(zf)
    from gsdr_tpu.carray import is_planar as _is_planar
    if zfs and _is_planar(zfs[0]):
        from gsdr_tpu.carray import ComplexArray as _CA
        zf_stack = _CA(jnp.stack([z.re for z in zfs], axis=0),
                       jnp.stack([z.im for z in zfs], axis=0))
    else:
        zf_stack = jnp.stack(zfs, axis=0)
    return y, zf_stack


def iir_sos(sos, x, zi=None, block_len=128):
    """Cascade of second-order sections (numerically robust high-order IIR).

    ``sos`` is (S, 6) scipy-style [b0 b1 b2 a0 a1 a2] rows. The reference has
    no cascade API (high-order filters run as one monolithic recurrence);
    this is the conditioning upgrade recommended in SURVEY.md section 7.
    Pass ``zi`` (see iir_sos_block) for streaming continuation.
    """
    y, _ = iir_sos_block(sos, x, zi=zi, block_len=block_len)
    return y
