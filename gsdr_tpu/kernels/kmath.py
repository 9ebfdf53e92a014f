"""Math helpers for Pallas TPU kernels.

Mosaic lacks lowerings for some libm-style primitives (atan2 at the time
of writing); these are VPU-friendly polynomial replacements. Accuracy
figures are for float32 inputs.
"""

import jax.numpy as jnp

_PI = 3.141592653589793
_PI_2 = 1.5707963267948966

# Minimax odd polynomial for atan(r), r in [0, 1] — max error ~6e-7 rad.
# (11th-order; the classic single-precision fit.)
_C1 = 0.99997726
_C3 = -0.33262347
_C5 = 0.19354346
_C7 = -0.11643287
_C9 = 0.05265332
_C11 = -0.01172120

# 7th-order minimax fit for atan(r), r in [0, 1] — max error ~8.2e-5 rad
# (Lawson-iterated equioscillating fit, verified in tests). Two fewer fma
# passes per lane slab than the 11th-order fit; used by the fused chains'
# bf16x2 grade, whose dot quantization error (~7e-4) dwarfs the extra
# polynomial error.
_D1 = 0.999213972
_D3 = -0.321176637
_D5 = 0.146268577
_D7 = -0.038989304


def atan_poly01(r, order=11):
    """atan(r) for r in [0, 1]. ``order`` must be 7 or 11."""
    if order not in (7, 11):
        raise ValueError(f"unsupported atan polynomial order {order}")
    r2 = r * r
    if order >= 11:
        p = _C11
        p = p * r2 + _C9
        p = p * r2 + _C7
        p = p * r2 + _C5
        p = p * r2 + _C3
        p = p * r2 + _C1
    else:
        p = _D7
        p = p * r2 + _D5
        p = p * r2 + _D3
        p = p * r2 + _D1
    return r * p


# Cephes single-precision minimax coefficients on [-pi/4, pi/4]:
# sin: r (1 + s1 r^2 + s2 r^4 + s3 r^6), cos: 1 + c1 r^2 + ... + c4 r^8
_S1 = -1.6666654611e-1
_S2 = 8.3321608736e-3
_S3 = -1.9515295891e-4
_K1 = -0.5
_K2 = 4.166664568298827e-2
_K3 = -1.388731625493765e-3
_K4 = 2.443315711809948e-5

_TWO_OVER_PI = 0.6366197723675814
# Cody-Waite split of pi/2: HI is exactly representable in f32 with
# trailing zero bits, so k*HI is exact for small integer k and the
# reduction r = (ang - k*HI) - k*LO keeps ~f32-ulp angle accuracy
_PI2_HI = 1.5707962512969971
_PI2_LO = 7.549789948768648e-08


def sincos_poly(ang):
    """(cos(ang), sin(ang)) via quarter-period range reduction + the
    Cephes f32 minimax polynomials — ~1e-7 absolute for |ang| up to a
    few hundred radians (one f32 k*pi/2 subtraction). ~20 VPU ops for
    BOTH values vs two libm-grade transcendental lowerings; used where
    per-element sin/cos dominates (the QPSK256 ring modulator) and
    usable inside Pallas kernels."""
    k = jnp.round(ang * _TWO_OVER_PI)
    r = (ang - k * _PI2_HI) - k * _PI2_LO
    r2 = r * r
    sin_r = r * (1.0 + r2 * (_S1 + r2 * (_S2 + r2 * _S3)))
    cos_r = 1.0 + r2 * (_K1 + r2 * (_K2 + r2 * (_K3 + r2 * _K4)))
    q = k - 4.0 * jnp.floor(k * 0.25)          # k mod 4 in {0,1,2,3}
    odd = (q == 1.0) | (q == 3.0)
    s = jnp.where(odd, cos_r, sin_r)
    c = jnp.where(odd, sin_r, cos_r)
    s_neg = (q == 2.0) | (q == 3.0)            # sin sign: -1 for k%4 in {2,3}
    c_neg = (q == 1.0) | (q == 2.0)            # cos sign: -1 for k%4 in {1,2}
    return jnp.where(c_neg, -c, c), jnp.where(s_neg, -s, s)


def atan2_poly(y, x, order=11):
    """Four-quadrant atan2 via range reduction + the [0,1] polynomial.

    Max error ~1e-6 rad (order=11, default) or ~8.2e-5 rad (order=7);
    atan2(0, 0) = 0 (matching the discriminator's zero-carry warmup
    convention). Usable inside Pallas TPU kernels where jnp.arctan2 has
    no Mosaic lowering.
    """
    abs_y = jnp.abs(y)
    abs_x = jnp.abs(x)
    mx = jnp.maximum(abs_x, abs_y)
    mn = jnp.minimum(abs_x, abs_y)
    r = mn / jnp.maximum(mx, 1e-37)
    r = jnp.where(mx == 0.0, 0.0, r)
    a = atan_poly01(r, order=order)
    a = jnp.where(abs_y > abs_x, _PI_2 - a, a)
    a = jnp.where(x < 0.0, _PI - a, a)
    return jnp.where(y < 0.0, -a, a)
