"""Multi-channel FM broadcast receiver (channelizer) — the flagship model.

One wideband complex RF stream in; C demodulated (and de-emphasized) audio
channels out. This is the chain the reference fuses in gsdrFmDemod
(/root/reference/src/fm.cu:181-218) — mix -> FIR low-pass + decimate ->
quadrature discriminator — extended the way its dead 4-channel kernel
k_Fm4x intended (src/fm.cu:71-179, never launched): instead of 4 hand-written
LO/accumulator copies, the channel bank is a complex-tap conv
(gsdr_tpu.ops.channelize) that computes ALL channels' mix+FIR+decimate as a
single MXU matmul-shaped convolution over the raw RF block, with the LO
reduced to one phasor per decimated output. Added on top: IIR de-emphasis
per channel (the reference ships IIR but never wires it into the chain) and
an explicit streaming-state pytree (replacing the caller-managed
overlap/phase contracts, include/gsdr/fm.h:26).
"""

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from gsdr_tpu.backend import is_tpu_backend
from gsdr_tpu.carray import ComplexArray, is_planar
from gsdr_tpu.ops.channelize import (
    make_complex_tap_bank,
    mix_fir_decimate_bank,
    rotate_bank,
)
from gsdr_tpu.ops.iir import iir_block
from gsdr_tpu.ops.quad_demod import quad_fm_demod
from gsdr_tpu.utils.phase import phase_digit_table

_TWO_PI = 6.283185307179586


def fm_deemphasis_coeffs(tau_seconds, sample_rate):
    """First-order de-emphasis IIR (b, a) via bilinear transform of
    H(s)=1/(1+s*tau). tau = 75e-6 (US) / 50e-6 (EU); sample_rate is the
    post-decimation audio rate.

    Raises when the prewarp argument 1/(2*tau*fs) reaches pi/2 — past it
    tan() flips sign and the mapped pole leaves the unit circle, i.e.
    the discrete filter is UNSTABLE (hit in round 5 at a 4-kHz audio
    rate with the US 75-us tau: outputs diverge to ~1e21). The validity
    condition is tau > 1/(pi * audio_rate)."""
    arg = 1.0 / (2.0 * float(tau_seconds) * float(sample_rate))
    if arg >= math.pi / 2.0:
        raise ValueError(
            f"de-emphasis tau={tau_seconds} is below the bilinear "
            f"validity limit 1/(pi*audio_rate) = "
            f"{1.0 / (math.pi * float(sample_rate)):.3g} s at audio rate "
            f"{sample_rate:.6g} Hz — the mapped pole is unstable. Use a "
            "larger tau or a higher post-decimation audio rate.")
    k = math.tan(arg)
    b0 = k / (1.0 + k)
    a1 = (k - 1.0) / (k + 1.0)
    return (b0, b0), (1.0, a1)


@dataclass(frozen=True)
class FmChannelizer:
    """C-channel FM receiver: complex-tap-bank channelize -> discriminator
    -> de-emphasis.

    Config is static (hashable); state is a pytree:
      (n0_mod_fs: int32 scalar — global offset of the next block,
       rf_tail: ComplexArray (T-1,) — raw RF overlap-save history,
       disc_carry: ComplexArray (C, 1) — last filtered sample,
       deemph_zi: float32 (C, 1))

    ``step(state, rf_block)`` takes a planar (N,) RF block (N % decimation
    == 0) and returns (state', audio (C, N/decimation) float32).

    Phase continuity assumes integral sample_rate and integral channel
    offsets (tuning - channel): n0 is reduced mod round(Fs), which is exact
    only when frac(f*Fs/Fs) == 0 for every shift f (see MixerStream).
    Non-integral offsets incur a frac(f)-cycle LO jump every Fs samples;
    quantize offsets to 1 Hz to avoid it.
    """

    sample_rate: float
    tuning_frequency: float
    channel_frequencies: Tuple[float, ...]
    frequency_deviation: float
    decimation: int
    low_pass_taps: Tuple[float, ...]
    deemphasis_tau: float = 75e-6
    # 'auto' (fused single-kernel chain on TPU when the shape supports it)
    # | 'xla' | 'pallas' | 'pfb' (uniform-grid polyphase front-end —
    # fused PFB kernel on TPU, XLA fold+DFT elsewhere; 'pfb_pallas'
    # forces the fused PFB kernel, interpret off-TPU). 'pfb' requires
    # every channel shift on an Fs/K grid with D | K, and WINS when the
    # prototype filter is long relative to the grid and decimation is
    # near-critical (measured rule: Q = T/K >= 4 and P = K/D <= 8 — e.g.
    # the 64-channel critical 512-tap wideband receiver measures 64-96 us
    # vs the dense kernel's 117-123 at 2^20, and the P=8 oversampled
    # class 446-542 vs 743-750); P >= 16 oversampling stays faster on
    # the dense Toeplitz kernel (BASELINE.md round-4/5 PFB design-space
    # tables).
    impl: str = "auto"
    # fused-kernel contraction grade: 'bf16x3' (default) | 'bf16x2'
    # (fast: one fewer MXU pass; signal quantized to bf16 ~ -54 dB, below
    # RF ADC noise floors) | 'f32' (exact contraction). Measured v5e
    # (16ch/64tap/dec4/2^20, full-lane R=16 geometry): bf16x2 129 us
    # (8.1 Gsps), bf16x3 151 us (6.9 Gsps), f32 192 us (5.5 Gsps).
    # bf16x3 and f32 agree with the XLA f32 reference equally (~4e-5:
    # the floor is the polynomial atan2 ~1e-6 rad and rotor-table
    # evaluation order, not contraction precision); bf16x2 ~7e-4.
    precision: str = "bf16x3"

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

    def _shifts(self):
        """shift = tuning - channel (src/fm.cu:204): each channel mixes down
        by its offset from center."""
        return [
            float(self.tuning_frequency) - float(f)
            for f in self.channel_frequencies
        ]

    def _lo_table(self):
        return phase_digit_table(self._shifts(), self.sample_rate)

    def _tap_bank(self):
        return make_complex_tap_bank(
            self.low_pass_taps, self._shifts(), self.sample_rate)

    def _deemph(self):
        return fm_deemphasis_coeffs(self.deemphasis_tau, self.audio_rate)

    # -- state ----------------------------------------------------------------
    def init(self, first_sample_index=0):
        c, t = self.num_channels, self.num_taps
        fs = int(round(self.sample_rate))
        return (
            jnp.asarray(int(first_sample_index) % fs, jnp.int32),
            ComplexArray.zeros((t - 1,)),
            ComplexArray.zeros((c, 1)),
            jnp.zeros((c, 1), jnp.float32),
        )

    # -- one streaming step (pure; jit this) ----------------------------------
    def step(self, state, rf):
        if not is_planar(rf):
            rf = ComplexArray.from_complex(jnp.asarray(rf))
        n0, rf_tail, disc_carry, deemph_zi = state
        n = rf.shape[-1]
        t = self.num_taps
        fs = int(round(self.sample_rate))
        if n % self.decimation != 0:
            raise ValueError("block length must be a multiple of decimation")

        # 1+2) fused mix bank + FIR + decimate over the tail-prepended block:
        # one conv with complex taps, then one phasor per decimated output.
        # Window j starts at global index n0 - (T-1) + j*D.
        buf = ComplexArray(
            jnp.concatenate([rf_tail.re, rf.re], axis=-1),
            jnp.concatenate([rf_tail.im, rf.im], axis=-1),
        )

        from gsdr_tpu.kernels.fm_chain_pallas import (
            fm_chain_pallas,
            fused_chain_supported,
        )

        m_out = (buf.shape[-1] - t) // self.decimation + 1
        fused_ok = fused_chain_supported(self.decimation, t, m_out,
                                         self.num_channels)
        impl = self.impl
        pfb_plan = None  # validated plan carried into the dispatch below
        pfb_grid = None
        if impl == "auto" and is_tpu_backend():
            # prefer the PFB front where the measured win rule holds
            # (uniform grid, long filter, near-critical decimation) AND
            # the plan is actually feasible — pfb_preferred's rule does
            # not know the VMEM budget, and a silent auto flip must never
            # turn a previously-working config into an error
            from gsdr_tpu.kernels.fm_chain_pallas import pfb_fm_chain_plan
            from gsdr_tpu.ops.pfb import pfb_preferred

            grid = pfb_preferred(self._shifts(), self.sample_rate,
                                 self.decimation, t)
            if grid is not None:
                try:
                    b_, a_ = self._deemph()
                    pfb_plan = pfb_fm_chain_plan(
                        self.low_pass_taps, self.decimation, self.gain,
                        b_, a_, buf.shape[-1], tuple(self._shifts()),
                        self.sample_rate, grid[1], grid[0],
                        precision=self.precision)
                    pfb_grid = grid
                    impl = "pfb"
                except ValueError:
                    pass  # infeasible geometry: keep the dense auto path
        use_pallas = impl == "pallas" or (
            impl == "auto" and is_tpu_backend() and fused_ok)
        if impl == "auto" and is_tpu_backend() and not fused_ok:
            # Surface the perf cliff: the XLA chain is ~50x slower than
            # the fused kernel on this hardware (BASELINE.md).
            import warnings
            warnings.warn(
                f"FmChannelizer: shape (D={self.decimation}, T={t}, "
                f"M={m_out}) cannot run the fused Pallas chain "
                "(taps exceed the 128-coarse-column halo window); falling "
                "back to the ~50x slower XLA path.",
                stacklevel=2)
        if use_pallas:
            # single fused Pallas kernel: conv + rotor + discriminator +
            # de-emphasis, one HBM read and one write; state-compatible
            # with the unfused path below (kernels/fm_chain_pallas.py).
            rot0 = (n0 + jnp.int32(fs - (t - 1) % fs)) % fs
            b_, a_ = self._deemph()
            audio, new_carry, new_zi = fm_chain_pallas(
                buf, self._tap_bank(), self._lo_table(), rot0,
                self.decimation, self.gain, b_, a_,
                disc_carry, deemph_zi,
                shifts_hz=tuple(self._shifts()),
                sample_rate=self.sample_rate,
                precision=self.precision)
            new_tail = buf[..., buf.shape[-1] - (t - 1):]
            n0_new = (n0 + jnp.int32(n % fs)) % fs
            return (n0_new, new_tail, new_carry, new_zi), audio
        if impl in ("pfb", "pfb_pallas"):
            # uniform-grid polyphase front-end: fold + DFT-bank contraction
            # replaces the dense C*T tap-bank conv (ops/pfb.py). On TPU
            # (or with impl='pfb_pallas') the WHOLE chain runs as the
            # PFB-fronted fused kernel — state-compatible with every
            # other impl (kernels/fm_chain_pallas.pfb_fm_chain_plan).
            from gsdr_tpu.ops.pfb import (
                mix_fir_decimate_bank_uniform,
                uniform_grid,
            )

            grid = pfb_grid if pfb_grid is not None else uniform_grid(
                self._shifts(), self.sample_rate,
                multiple_of=self.decimation)
            # uniform_grid(multiple_of=D) lifts k to an lcm with D or
            # returns None, so D | grid[0] holds whenever grid exists.
            if grid is None:
                raise ValueError(
                    "impl='pfb' needs every channel shift on an Fs/K grid "
                    f"with D | K (shifts={self._shifts()[:4]}..., "
                    f"Fs={self.sample_rate}, D={self.decimation})")
            if impl == "pfb_pallas" or is_tpu_backend():
                from gsdr_tpu.kernels.fm_chain_pallas import (
                    fm_chain_apply,
                    pfb_fm_chain_plan,
                )

                rot0 = (n0 + jnp.int32(fs - (t - 1) % fs)) % fs
                if pfb_plan is None:  # auto already built + validated one
                    b_, a_ = self._deemph()
                    pfb_plan = pfb_fm_chain_plan(
                        self.low_pass_taps, self.decimation, self.gain,
                        b_, a_, buf.shape[-1], tuple(self._shifts()),
                        self.sample_rate, grid[1], grid[0],
                        precision=self.precision)
                audio, new_carry, new_zi = fm_chain_apply(
                    pfb_plan, buf, self._lo_table(), rot0,
                    disc_carry, deemph_zi)
                new_tail = buf[..., buf.shape[-1] - (t - 1):]
                n0_new = (n0 + jnp.int32(n % fs)) % fs
                return (n0_new, new_tail, new_carry, new_zi), audio
            y = mix_fir_decimate_bank_uniform(
                buf, self.low_pass_taps, grid[1], grid[0], self.decimation)
        else:
            y = mix_fir_decimate_bank(buf, self._tap_bank(), self.decimation)
        rot0 = (n0 + jnp.int32(fs - (t - 1) % fs)) % fs
        filt = rotate_bank(y, jnp.asarray(self._lo_table()), rot0,
                           self.decimation)  # (C, N/D)
        new_tail = buf[..., buf.shape[-1] - (t - 1):]

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

        n0_new = (n0 + jnp.int32(n % fs)) % fs
        return (n0_new, new_tail, new_carry, new_zi), audio
