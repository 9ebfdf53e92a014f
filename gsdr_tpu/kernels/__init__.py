"""Pallas TPU kernels for the roofline-bearing hot paths.

XLA handles most of the op set well, but its conv emitter materializes
im2col windows through HBM — for the channelizer's stride-D window matmul
that is ~T/D x the input in extra traffic and dominates the runtime
(measured: the conv runs at the speed of its window materialization, not
the MXU). These kernels keep the window construction in VMEM.
"""

from gsdr_tpu.kernels.channelize_pallas import (
    mix_fir_decimate_bank_pallas,
    pallas_supported,
)

__all__ = ["mix_fir_decimate_bank_pallas", "pallas_supported"]
