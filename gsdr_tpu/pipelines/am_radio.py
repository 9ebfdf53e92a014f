"""Multi-channel AM receiver pipeline.

The streaming, multi-channel form of gsdrAmDemod
(/root/reference/src/am.cu:52-81): mix bank -> FIR low-pass + decimate ->
envelope detector. Same skeleton as the FM channelizer minus the
discriminator halo (the AM chain has no neighbor-sample dependency,
src/am.cu:21-50), so state is just (global offset, FIR tail).
"""

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp

from gsdr_tpu.carray import ComplexArray, expj, is_planar
from gsdr_tpu.ops.fir import fir
from gsdr_tpu.ops.quad_demod import quad_am_demod
from gsdr_tpu.utils.phase import phase_digit_table, phase_fraction_from_table

_TWO_PI = 6.283185307179586


@dataclass(frozen=True)
class AmReceiver:
    """C-channel AM envelope receiver with functional streaming state.

    ``step(state, rf_block)`` maps a planar (N,) RF block (N % decimation
    == 0) to (state', audio (C, N/decimation) float32 in [-1, 1]).
    """

    sample_rate: float
    tuning_frequency: float
    channel_frequencies: Tuple[float, ...]
    decimation: int
    low_pass_taps: Tuple[float, ...]

    @property
    def num_channels(self):
        return len(self.channel_frequencies)

    @property
    def num_taps(self):
        return len(self.low_pass_taps)

    def _lo_table(self):
        shifts = [
            float(self.tuning_frequency) - float(f)
            for f in self.channel_frequencies
        ]
        return phase_digit_table(shifts, self.sample_rate)

    def init(self, first_sample_index=0):
        fs = int(round(self.sample_rate))
        return (
            jnp.asarray(int(first_sample_index) % fs, jnp.int32),
            ComplexArray.zeros((self.num_channels, self.num_taps - 1)),
        )

    def step(self, state, rf):
        if not is_planar(rf):
            rf = ComplexArray.from_complex(jnp.asarray(rf))
        n0, fir_tail = state
        n = rf.shape[-1]
        if n % self.decimation != 0:
            raise ValueError("block length must be a multiple of decimation")

        idx = n0 + jnp.arange(n, dtype=jnp.int32)
        table = jnp.asarray(self._lo_table())
        frac = phase_fraction_from_table(idx[None, :], table[:, None, :])
        lo = expj(_TWO_PI * frac)
        mixed = ComplexArray(
            rf.re[None, :] * lo.re - rf.im[None, :] * lo.im,
            rf.re[None, :] * lo.im + rf.im[None, :] * lo.re,
        )

        buf = ComplexArray(
            jnp.concatenate([fir_tail.re, mixed.re], axis=-1),
            jnp.concatenate([fir_tail.im, mixed.im], axis=-1),
        )
        taps = jnp.asarray(self.low_pass_taps, jnp.float32)
        filt = fir(buf, taps, self.decimation)
        new_tail = buf[..., buf.shape[-1] - (self.num_taps - 1):]

        audio = quad_am_demod(filt)  # 2*clamp(|.|,0,1)-1, src/am.cu:49
        fs = int(round(self.sample_rate))
        n0_new = (n0 + jnp.int32(n % fs)) % fs
        return (n0_new, new_tail), audio
