"""Multi-channel FM broadcast receiver (channelizer) — the flagship model.

One wideband complex RF stream in; C demodulated (and de-emphasized) audio
channels out. This is the chain the reference fuses in gsdrFmDemod
(/root/reference/src/fm.cu:181-218) — mix -> FIR low-pass + decimate ->
quadrature discriminator — extended the way its dead 4-channel kernel
k_Fm4x intended (src/fm.cu:71-179, never launched): instead of 4 hand-written
LO/accumulator copies, the channel bank is a leading array axis. Added on
top: IIR de-emphasis per channel (the reference ships IIR but never wires it
into the chain) and an explicit streaming-state pytree (replacing the
caller-managed overlap/phase contracts, include/gsdr/fm.h:26).

Everything is static-shaped and jit/scan/shard_map friendly. The per-block
compute is dominated by the (C,) x (taps) FIR bank, which XLA maps onto the
MXU via conv_general_dilated; the Pallas fused kernel (gsdr_tpu.kernels)
accelerates the same step fn when enabled.
"""

import math
from dataclasses import dataclass, field
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from gsdr_tpu.carray import ComplexArray, expj, is_planar
from gsdr_tpu.ops.fir import fir
from gsdr_tpu.ops.iir import iir_block
from gsdr_tpu.ops.quad_demod import quad_fm_demod
from gsdr_tpu.utils.phase import phase_digit_table, phase_fraction_from_table

_TWO_PI = 6.283185307179586


def fm_deemphasis_coeffs(tau_seconds, sample_rate):
    """First-order de-emphasis IIR (b, a) via bilinear transform of
    H(s)=1/(1+s*tau). tau = 75e-6 (US) / 50e-6 (EU); sample_rate is the
    post-decimation audio rate."""
    k = math.tan(1.0 / (2.0 * float(tau_seconds) * float(sample_rate)))
    # Bilinear transform of the RC low-pass pole.
    b0 = k / (1.0 + k)
    a1 = (k - 1.0) / (k + 1.0)
    return (b0, b0), (1.0, a1)


@dataclass(frozen=True)
class FmChannelizer:
    """C-channel FM receiver: mix bank -> FIR decimate -> discriminator ->
    de-emphasis.

    Config is static (hashable); state is a pytree:
      (n0_mod_fs: int32 scalar,
       fir_tail: ComplexArray (C, T-1),
       disc_carry: ComplexArray (C, 1),
       deemph_zi: float32 (C, 1))

    ``step(state, rf_block)`` takes a planar (N,) RF block (N % decimation
    == 0) and returns (state', audio (C, N/decimation) float32).
    """

    sample_rate: float
    tuning_frequency: float
    channel_frequencies: Tuple[float, ...]
    frequency_deviation: float
    decimation: int
    low_pass_taps: Tuple[float, ...]
    deemphasis_tau: float = 75e-6

    # -- derived (host-side) -------------------------------------------------
    @property
    def num_channels(self):
        return len(self.channel_frequencies)

    @property
    def num_taps(self):
        return len(self.low_pass_taps)

    @property
    def gain(self):
        """Discriminator gain Fs/(2*pi*deviation) — src/fm.cu:203."""
        return float(self.sample_rate) / (_TWO_PI * float(self.frequency_deviation))

    @property
    def audio_rate(self):
        return float(self.sample_rate) / self.decimation

    def _lo_table(self):
        """(C, 4) digit-fraction table for shift = tuning - channel
        (src/fm.cu:204: each channel mixes down by its offset from center)."""
        shifts = [
            float(self.tuning_frequency) - float(f)
            for f in self.channel_frequencies
        ]
        return phase_digit_table(shifts, self.sample_rate)

    def _deemph(self):
        return fm_deemphasis_coeffs(self.deemphasis_tau, self.audio_rate)

    # -- state ----------------------------------------------------------------
    def init(self, first_sample_index=0):
        c, t = self.num_channels, self.num_taps
        fs = int(round(self.sample_rate))
        return (
            jnp.asarray(int(first_sample_index) % fs, jnp.int32),
            ComplexArray.zeros((c, t - 1)),
            ComplexArray.zeros((c, 1)),
            jnp.zeros((c, 1), jnp.float32),
        )

    # -- one streaming step (pure; jit this) ----------------------------------
    def step(self, state, rf):
        if not is_planar(rf):
            rf = ComplexArray.from_complex(jnp.asarray(rf))
        n0, fir_tail, disc_carry, deemph_zi = state
        n = rf.shape[-1]
        if n % self.decimation != 0:
            raise ValueError("block length must be a multiple of decimation")

        # 1) LO bank + mix: (C, N) planar. Phase is exact from the global
        # sample index (utils/phase.py), no carried float phase.
        idx = n0 + jnp.arange(n, dtype=jnp.int32)
        table = jnp.asarray(self._lo_table())
        frac = phase_fraction_from_table(idx[None, :], table[:, None, :])
        lo = expj(_TWO_PI * frac)
        mixed = ComplexArray(
            rf.re[None, :] * lo.re - rf.im[None, :] * lo.im,
            rf.re[None, :] * lo.im + rf.im[None, :] * lo.re,
        )

        # 2) FIR low-pass + decimate with carried (C, T-1) tail
        # (overlap-save; stream.FirStream contract).
        buf = ComplexArray(
            jnp.concatenate([fir_tail.re, mixed.re], axis=-1),
            jnp.concatenate([fir_tail.im, mixed.im], axis=-1),
        )
        taps = jnp.asarray(self.low_pass_taps, jnp.float32)
        filt = fir(buf, taps, self.decimation)  # (C, N/D)
        new_tail = buf[..., buf.shape[-1] - (self.num_taps - 1):]

        # 3) discriminator with one-sample carried halo (the warp-shuffle
        # +1-sample contract, src/fm.cu:58-64, as functional state).
        disc_in = ComplexArray(
            jnp.concatenate([disc_carry.re, filt.re], axis=-1),
            jnp.concatenate([disc_carry.im, filt.im], axis=-1),
        )
        demod = quad_fm_demod(disc_in, self.gain)  # (C, N/D)
        new_carry = disc_in[..., disc_in.shape[-1] - 1:]

        # 4) de-emphasis IIR, exact blocked scan with carried state.
        (b, a) = self._deemph()
        audio, new_zi = iir_block(
            jnp.asarray(b, jnp.float32), jnp.asarray(a, jnp.float32),
            demod, zi=deemph_zi, block_len=256,
        )

        fs = int(round(self.sample_rate))
        n0_new = (n0 + jnp.int32(n % fs)) % fs
        return (n0_new, new_tail, new_carry, new_zi), audio
