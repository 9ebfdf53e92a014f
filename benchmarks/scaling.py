"""Multi-chip scaling evidence, within a 1-chip environment's limits.

The deployment target (BASELINE.md north star) is >=85% multi-host scaling
efficiency, but this environment has exactly one TPU chip. What CAN be
measured honestly, and is, here:

(a) ``--hw``: the shard_map wrapper overhead on the real chip — a 1x1-mesh
    sharded fused FM step vs the unsharded fused step (the sharded path
    adds the halo ppermute/all_gather/psum plumbing and the split
    de-emphasis; on one device every collective is a self-copy). Target:
    within ~10%.
(b) default (CPU mesh): communication-volume audit — lower the sharded
    fused step at 2/4/8 devices and two block lengths, parse every
    collective op out of the StableHLO, and assert the per-step
    communicated element count is O(halo) — INDEPENDENT of the block
    length N. A time-sharded streaming DSP chain owes exactly: one
    (T-1+D)-sample halo ppermute, one (C_l,)-vector de-emphasis state
    all_gather, and two O(T+C) psums (stream tail + disc carry). Anything
    O(N) is a sharding bug.
(c) the ICI/DCN cost model documented below, with the measured per-chip
    step time plugged in.

## Cost model for the >=85% target (documented, not measurable here)

Per sharded step, each chip moves  B = 8*(T-1+D) + 4*C_l*t_sh + 8*(T-1)
+ 12*C_l  bytes (halo + z all_gather + tail/carry psums) — ~2.6 KB at the
flagship config. All of it rides ICI when the time axis is mapped to an
ICI ring (parallel/mesh.py docstring): v5e ICI ~ 45 GB/s/link each way,
~1-2 us collective latency; a 3-collective chain costs ~3-6 us
latency-bound (the volume is negligible). With the measured fused step at
~150 us / 2^20 samples per chip, time-sharding at constant per-chip block
size (weak scaling) models out to  eff = t_step / (t_step + t_comm)
~ 150/156 = 96% >> 85%; strong scaling stays >=85% while the per-chip
block keeps t_step >= ~6 us * 85/15 ~ 35 us, i.e. N_local >= ~2^18 at
measured rates. Channel sharding communicates nothing per step and is the
preferred DCN/host axis. These numbers are the model the >=85% target
rests on; validating them end-to-end needs real multi-chip hardware.

Usage:
    python -m benchmarks.scaling            # (b) comm-volume audit, CPU
    python -m benchmarks.scaling --hw       # (a) 1x1-mesh overhead, chip
Each prints one JSON line per measurement.
"""

import argparse
import json
import os
import re

# Must precede backend init: the CPU client reads the flag at creation
# (the axon sitecustomize pins JAX_PLATFORMS, so the comm-volume audit
# switches platform via jax.config in main()).
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np

import jax
import jax.numpy as jnp

_COLLECTIVES = (
    "collective_permute",
    "all_gather",
    "all_reduce",
    "all_to_all",
    "reduce_scatter",
)


def _lowpass(num_taps, cutoff_frac):
    n = np.arange(num_taps) - (num_taps - 1) / 2.0
    h = np.sinc(2 * cutoff_frac * n) * np.hamming(num_taps)
    return tuple((h / h.sum()).astype(np.float32).tolist())


def _model(nch=16, taps=64, dec=4, impl="pallas"):
    from gsdr_tpu.pipelines import FmChannelizer

    return FmChannelizer(
        sample_rate=1_000_000.0, tuning_frequency=0.0,
        channel_frequencies=tuple(
            -480_000.0 + (960_000.0 / nch) * i for i in range(nch)),
        frequency_deviation=75_000.0, decimation=dec,
        low_pass_taps=_lowpass(taps, 0.03), impl=impl)


def _elems(shape_str):
    dims = [int(p) for p in shape_str.split("x")[:-1] if p.isdigit()]
    return int(np.prod(dims)) if dims else 1


def collective_volume(hlo_text):
    """(total result elements, per-op counts) over all collective ops."""
    total = 0
    per_op = {}
    pat = re.compile(r"->\s*tensor<([^>]+)>")
    for line in hlo_text.splitlines():
        op = next((c for c in _COLLECTIVES
                   if f"stablehlo.{c}" in line), None)
        if op is None:
            continue
        m = pat.search(line)
        if not m:
            continue
        elems = _elems(m.group(1))
        total += elems
        per_op[op] = per_op.get(op, 0) + elems
    # all_reduce (psum) carries a reducer REGION, so its result type sits
    # lines after the op name — match it across lines separately
    for m in re.finditer(
            r"stablehlo\.all_reduce.*?\}\)\s*:\s*\([^)]*\)\s*->"
            r"\s*tensor<([^>]+)>", hlo_text, re.S):
        elems = _elems(m.group(1))
        total += elems
        per_op["all_reduce"] = per_op.get("all_reduce", 0) + elems
    return total, per_op


def _grid_model(nch=8, k=16, taps=128, dec=4, impl="pfb_pallas"):
    """Uniform-grid config for the PFB sharded path (round 4)."""
    from gsdr_tpu.pipelines import FmChannelizer

    fs = 1_024_000.0
    return FmChannelizer(
        sample_rate=fs, tuning_frequency=0.0,
        channel_frequencies=tuple(-fs / 2 + (fs / k) * i
                                  for i in range(nch)),
        frequency_deviation=75_000.0, decimation=dec,
        low_pass_taps=_lowpass(taps, 0.4 / k), impl=impl)


def comm_volume_audit():
    """(b): collective volume must be O(halo), independent of N — for
    both the dense Toeplitz and (round 4) PFB sharded fronts."""
    from gsdr_tpu.carray import ComplexArray
    from gsdr_tpu.parallel import make_mesh, make_sharded_fm_step

    results = []
    for t_sh in (2, 4, 8):
        for label, model in (
                ("fm", _model(nch=8, taps=64, dec=4, impl="pallas")),
                ("fm_pfb", _grid_model())):
            mesh = make_mesh(channel=1, time=t_sh,
                             devices=jax.devices()[:t_sh])
            step = make_sharded_fm_step(model, mesh)
            vols = {}
            for n in (1 << 14, 1 << 16):  # 4x apart: O(N) comm shows 4x
                rng = np.random.default_rng(0)
                rf = ComplexArray(
                    jnp.asarray(rng.standard_normal(n), jnp.float32),
                    jnp.asarray(rng.standard_normal(n), jnp.float32))
                lowered = jax.jit(step).lower(model.init(), rf)
                vols[n], per_op = collective_volume(lowered.as_text())
            n_small, n_big = sorted(vols)
            row = {
                "metric": f"sharded_{label}_collective_elems_per_step",
                "time_shards": t_sh,
                "elems_at_16k": vols[n_small],
                "elems_at_64k": vols[n_big],
                "per_op": per_op,
                "comm_is_o_halo": bool(vols[n_big] == vols[n_small]),
            }
            assert vols[n_big] == vols[n_small], (
                f"collective volume grew with N: {vols} — O(N) comm bug")
            assert vols[n_big] > 0, "no collectives found in lowered HLO"
            results.append(row)
            print(json.dumps(row), flush=True)
    return results


def hw_overhead():
    """(a): 1x1-mesh sharded fused steps vs unsharded, on the real chip —
    FM and (round 4) AM."""
    from gsdr_tpu.carray import ComplexArray
    from gsdr_tpu.parallel import (
        make_mesh,
        make_sharded_am_step,
        make_sharded_fm_step,
    )
    from gsdr_tpu.pipelines import AmReceiver
    from gsdr_tpu.utils.timing import time_step

    n = 1 << 20
    mesh = make_mesh(channel=1, time=1, devices=jax.devices()[:1])
    rng = np.random.default_rng(0)
    rf = ComplexArray(
        jnp.asarray(rng.standard_normal(n), jnp.float32),
        jnp.asarray(rng.standard_normal(n), jnp.float32))

    rows = []
    fm = _model(nch=16, taps=64, dec=4, impl="pallas")
    am = AmReceiver(
        sample_rate=1_000_000.0, tuning_frequency=0.0,
        channel_frequencies=tuple(
            -480_000.0 + 60_000.0 * i for i in range(16)),
        decimation=4, low_pass_taps=_lowpass(64, 0.03), impl="pallas")
    # round-5: the wideband PFB front (ns=2 per-shard plans) on real HW
    from gsdr_tpu.pipelines import FmChannelizer
    kw = 64
    fm_wb = FmChannelizer(
        sample_rate=1_000_000.0, tuning_frequency=0.0,
        channel_frequencies=tuple(-(1e6 / kw) * i for i in range(kw)),
        frequency_deviation=75_000.0, decimation=kw,
        low_pass_taps=_lowpass(512, 0.4 / kw), impl="pfb")
    for name, model, make in (("fm", fm, make_sharded_fm_step),
                              ("am", am, make_sharded_am_step),
                              ("fm_wb_pfb", fm_wb, make_sharded_fm_step)):
        sharded = make(model, mesh)
        sec_plain = min(time_step(model.step, model.init(), rf, iters=200,
                                  reps=5) for _ in range(2))
        sec_shard = min(time_step(sharded, model.init(), rf, iters=200,
                                  reps=5) for _ in range(2))
        row = {
            "metric": f"shardmap_1x1_overhead_{name}",
            "unsharded_msps": round(n / sec_plain / 1e6, 1),
            "sharded_1x1_msps": round(n / sec_shard / 1e6, 1),
            "overhead_pct": round((sec_shard / sec_plain - 1.0) * 100, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--hw", action="store_true",
                   help="run the real-chip 1x1-mesh overhead measurement")
    args = p.parse_args(argv)
    if args.hw:
        hw_overhead()
    else:
        # the audit only lowers (never executes), so the virtual CPU mesh
        # is the right backend even when a real chip is attached
        jax.config.update("jax_platforms", "cpu")
        comm_volume_audit()


if __name__ == "__main__":
    main()
