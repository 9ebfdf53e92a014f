"""Benchmark: flagship FM channelizer chain throughput on the real chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Config (BASELINE.md / BASELINE.json config 3): 16-channel FM broadcast
chain -- mix bank -> 64-tap FIR with 4x decimation -> quadrature
discriminator -> IIR de-emphasis -- on 2^20 complex input samples per step.

Metric: complex input Msamples/s through the full chain (input-referred, so
comparable across channel counts at fixed work-per-sample). Timing rolls the
step loop into one jitted lax.scan and subtracts dispatch overhead
(gsdr_tpu.utils.timing: the tunnel backend neither honors block_until_ready
nor has cheap dispatch, so naive loops measure the wrong thing).

vs_baseline: the reference publishes no absolute numbers (BASELINE.md), so
the denominator is this repo's north-star target: 90% of the per-chip
compute roofline for this chain. Roofline model (documented, conservative):
the FIR bank dominates at C*T*8/D = 16*64*8/4 = 2048 f32 FLOP per input
sample; assumed per-chip f32 MXU peak 49 TFLOP/s (v5e: 197 TFLOP/s bf16 / 4)
gives ~24.0 Gsample/s; target = 0.9 * that. vs_baseline = value / target.
"""

import json

import numpy as np

import jax
import jax.numpy as jnp

from gsdr_tpu.carray import ComplexArray
from gsdr_tpu.utils.timing import time_step
from __graft_entry__ import _model

N_SAMPLES = 1 << 20
N_CHANNELS = 16
N_TAPS = 64
DECIMATION = 4
ITERS = 200  # iters*step (~85 ms) must dominate dispatch-overhead noise
             # (tens of ms, +-10-30% run to run) or the subtraction is junk
             # (60 iters still spread 2.0-4.4 Gsps across runs)

F32_PEAK_FLOPS = 49.2e12  # v5e MXU, f32 (bf16 peak 196.6 TFLOP/s / 4)
FLOP_PER_SAMPLE = N_CHANNELS * N_TAPS * 8 / DECIMATION
ROOFLINE_MSPS = F32_PEAK_FLOPS / FLOP_PER_SAMPLE / 1e6
TARGET_MSPS = 0.9 * ROOFLINE_MSPS

# Structural speed-of-light of the SHIPPED algorithm (bf16x3 stacked-MXU
# Toeplitz kernel at the flagship geometry) — the reachable bar that
# vs_baseline's idealized roofline is not. Round 5 replaced the old
# 90-us perfect-overlap figure (which assumed MXU/VPU/HBM overlap that
# four rounds of levers measured OUT — BASELINE.md "SoL derivation,
# round-5 revision") with the measured-structural SERIAL floor, each
# term measured directly:
#   grid+DMA   23 us  (ablate='grid' probe: identical grid/BlockSpecs/
#                      scratch, no compute — benchmarks/overhead_probe)
#   MXU phase  65 us  (derived bf16x3 floor at K=256; the measured
#                      dot-cut increment reads 64 on top of grid)
#   VPU serial 43 us  (rotor ~1 + disc ~23 + deemph ~19, the minimum
#                      measured stage increments, round-3/5 ablations)
# vs_sol = 1.0 means the step equals the sum of its stages' measured
# floors — reachable, and the honest "this kernel is perfect" bar.
# The stage floors are REFERENCE-SESSION numbers, and chip/tunnel
# conditions vary up to ~1.3x across sessions with bit-identical code
# (adjudicated by a round-3-tree worktree A/B, BASELINE round 5), so
# vs_sol carries that same band: readings in ~[0.75, 1.3] all mean "at
# the serial floor under current conditions" (1.25 was observed in a
# fast window the same day 0.95 was). Only excursions beyond the band
# signal a real kernel change; the grid+MXU terms alone bound the step
# below ~88 reference-us = 11.9 Gsps.
SOL_US = 131.0
SOL_MSPS = N_SAMPLES / (SOL_US * 1e-6) / 1e6


def _fm_signal(model, n, seed=7):
    """Real FM carriers on the model's channels. Accuracy comparisons need
    bounded discriminator phase steps — white noise puts samples on the
    atan2 +-pi branch cut where two correct implementations may differ by
    2*pi (CLAUDE.md testing note)."""
    r = np.random.default_rng(seed)
    t = np.arange(n) / model.sample_rate
    sig = np.zeros(n, np.complex128)
    for k, f in enumerate(model.channel_frequencies):
        msg = np.sin(2 * np.pi * (700.0 + 370.0 * k) * t + r.uniform(0, 6))
        sig += (0.5 / len(model.channel_frequencies)) * np.exp(
            1j * (2 * np.pi * f * t + 0.35 * msg))
    return ComplexArray(
        jnp.asarray(sig.real, jnp.float32), jnp.asarray(sig.imag, jnp.float32))


def hw_accuracy_check(model_pallas, model_xla, n=1 << 18):
    """Fused-vs-XLA max relative audio error on THIS backend (the on-HW
    accuracy gate: interpret-mode tests have twice missed hardware-only
    Mosaic behaviors — tiny-tile transpose miscompile, bf16 rounding)."""
    rf = _fm_signal(model_xla, n)
    _, y_x = jax.jit(model_xla.step)(model_xla.init(), rf)
    _, y_p = jax.jit(model_pallas.step)(model_pallas.init(), rf)
    y_x = np.asarray(y_x)
    y_p = np.asarray(y_p)
    scale = float(np.max(np.abs(y_x)))
    skip = 256  # zero-primed warmup + de-emphasis settle
    return float(np.max(np.abs(y_x[:, skip:] - y_p[:, skip:])) / scale)


def main():
    import dataclasses
    base = _model(num_channels=N_CHANNELS, num_taps=N_TAPS,
                  decimation=DECIMATION)
    model_xla = dataclasses.replace(base, impl="xla")
    model = dataclasses.replace(base, impl="pallas")  # fused kernel
    rng = np.random.default_rng(0)
    rf = ComplexArray(
        jnp.asarray(rng.standard_normal(N_SAMPLES), jnp.float32),
        jnp.asarray(rng.standard_normal(N_SAMPLES), jnp.float32),
    )
    state = model.init()
    # best of 3 independent timing passes: the tunnel occasionally has
    # sustained slow windows (one observed pass read 44% low while the
    # surrounding runs agreed); min-time across passes is the standard
    # noisy-benchmark practice and each pass is itself a 5-rep median.
    # Guard against fast-window ARTIFACTS too (one session read 27.7
    # us/step — below the 65-us MXU floor, physically impossible): only
    # accept the min among passes within 20% of the median pass.
    # Absolute physics floor: the bf16x3 dot alone is ~65 us/step at this
    # config (M*K*n_j*2*3 / bf16-peak); any pass below ~60 us is an
    # artifact even if a fast window spans the whole session.
    floor_sec = 60e-6
    secs = sorted(time_step(model.step, state, rf, iters=ITERS, reps=5)
                  for _ in range(3))
    ok = [s for s in secs if s >= max(0.8 * secs[1], floor_sec)]
    if not ok:
        raise RuntimeError(
            f"all timing passes below the physical floor: {secs}")
    sec = min(ok)
    msps = N_SAMPLES / sec / 1e6
    err = hw_accuracy_check(model, model_xla)
    print(json.dumps({
        "metric": "fm_channelizer_16ch_64tap_dec4_input_msps",
        "value": round(msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / TARGET_MSPS, 4),
        "vs_sol": round(msps / SOL_MSPS, 4),
        "hw_max_rel_err": round(err, 6),
    }))


if __name__ == "__main__":
    main()
