"""Sample-format conversions.

Parity with gsdrInt8ToNormFloat (/root/reference/include/gsdr/conversion.h:24-29,
src/conversion.cu:20-27).
"""

import jax.numpy as jnp


def int8_to_norm_float(x):
    """Normalize int8 samples into [-1.0, 1.0].

    out = max(-1, x / 127): -127 and -128 both map to -1.0, 127 maps to 1.0,
    0 maps to 0.0 — exactly the reference's documented edge behavior
    (include/gsdr/conversion.h:24-29).
    """
    x = jnp.asarray(x)
    return jnp.maximum(-1.0, x.astype(jnp.float32) * (1.0 / 127.0))
