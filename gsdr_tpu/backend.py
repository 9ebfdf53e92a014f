"""Backend identification for impl='auto' dispatch.

The Pallas kernels in gsdr_tpu.kernels are Mosaic (TPU) kernels: they must
only auto-dispatch on a backend that can compile them. That is the standard
'tpu' PJRT platform or the axon tunnel plugin (which fronts a real TPU
chip) — NOT merely "anything that isn't cpu": a GPU backend would route to
Mosaic and fail to compile (round-2 advisor finding).
"""

import jax

_TPU_PLATFORMS = ("tpu", "axon")


def is_tpu_backend():
    """True when the default backend compiles Mosaic TPU kernels."""
    return jax.default_backend() in _TPU_PLATFORMS
