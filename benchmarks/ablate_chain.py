"""Stage ablation of the fused FM chain on the real chip.

Answers BASELINE.md's open question: of the ~490 us per 2^20-sample step
at 16 channels, how much is (a) the xq-prep relayout (XLA, outside the
kernel), (b) the stacked windows+dot contraction, (c) the VPU tail
(rotor + discriminator + de-emphasis scan), (d) the audio unstack
relayout, (e) precision grade of the dots, (f) block size?

Each variant is timed with utils.timing.time_step (scan-in-jit, overhead
subtraction — see its DCE notes; Pallas calls are opaque so their outputs
cannot be pruned, XLA-only variants thread full data dependence).

Run:  python -m benchmarks.ablate_chain [--only prep,chan,fm] [--n 20]
One JSON line per variant, flushed as it lands (remote compiles can take
minutes; progress visibility matters on this backend).
"""

import argparse
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

import jax
import jax.numpy as jnp

from gsdr_tpu.carray import ComplexArray
from gsdr_tpu.utils.timing import time_step

N_SAMPLES = 1 << 20
C, T, D = 16, 64, 4


def _model():
    from __graft_entry__ import _model as gm

    return gm(num_channels=C, num_taps=T, decimation=D)


def _buf(model):
    rng = np.random.default_rng(0)
    nb = N_SAMPLES + T - 1
    return ComplexArray(
        jnp.asarray(rng.standard_normal(nb), jnp.float32),
        jnp.asarray(rng.standard_normal(nb), jnp.float32),
    )


def _time(name, step, state, block, iters, unit_n=N_SAMPLES):
    sec = time_step(step, state, block, iters=iters)
    print(json.dumps({
        "variant": name,
        "us_per_step": round(sec * 1e6, 1),
        "input_msps": round(unit_n / sec / 1e6, 1),
    }), flush=True)
    return sec


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="", help="comma list of variant names")
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args(argv)
    only = set(filter(None, args.only.split(",")))

    def want(name):
        return not only or any(name.startswith(o) for o in only)

    model = _model()
    buf = _buf(model)
    bank = model._tap_bank()
    lo = model._lo_table()
    b_, a_ = model._deemph()
    shifts = tuple(model._shifts())
    fs = model.sample_rate
    zc = ComplexArray.zeros((C, 1))
    zi = jnp.zeros((C, 1), jnp.float32)

    from gsdr_tpu.kernels.fm_chain_pallas import (
        _stack_geometry, _xq_prep, am_chain_pallas, fm_chain_pallas)
    from gsdr_tpu.kernels.channelize_pallas import mix_fir_decimate_bank_pallas

    m = (buf.shape[-1] - T) // D + 1
    c_eff, r_stack, groups, _ = _stack_geometry(C, T, D, m)
    n_j = m // r_stack

    # (a) xq prep alone (XLA relayout into the kernel's input layout)
    if want("prep"):
        def prep_step(st, x):
            xq = _xq_prep(ComplexArray(x.re + st * 1e-30, x.im),
                          D, r_stack, n_j + 128)
            return jnp.sum(xq) * 1e-9, xq

        _time("prep_xq", prep_step, jnp.float32(0.0), buf, args.iters * 4)

    # (b) windows + dot (+ unstack): the stacked channelizer kernel
    for prec in ("bf16x3", "bf16x2", "f32"):
        if want(f"chan_{prec}"):
            def chan_step(st, x, _p=prec):
                y = mix_fir_decimate_bank_pallas(
                    ComplexArray(x.re + st * 1e-30, x.im), bank, D,
                    precision=_p)
                return (jnp.sum(y.re) + jnp.sum(y.im)) * 1e-9, y

            _time(f"chan_{prec}", chan_step, jnp.float32(0.0), buf,
                  args.iters)

    # (c) + envelope (AM fused kernel)
    if want("am"):
        def am_step(st, x):
            y = am_chain_pallas(ComplexArray(x.re + st * 1e-30, x.im),
                                bank, D)
            return jnp.sum(y) * 1e-9, y

        _time("am_fused", am_step, jnp.float32(0.0), buf, args.iters)

    # (d) full FM fused chain: precision grades and block sizes
    def fm_step_fn(prec, bn):
        def fm_step(st, x):
            audio, f, z = fm_chain_pallas(
                ComplexArray(x.re + st * 1e-30, x.im), bank, lo,
                jnp.int32(0), D, model.gain, b_, a_, zc, zi,
                shifts_hz=shifts, sample_rate=fs,
                block_n=bn, precision=prec)
            return jnp.sum(audio) * 1e-9, (audio, f.re, f.im, z)
        return fm_step

    for prec in ("bf16x3", "bf16x2", "f32"):
        if want(f"fm_{prec}"):
            _time(f"fm_{prec}_bn2048", fm_step_fn(prec, 2048),
                  jnp.float32(0.0), buf, args.iters)
    for bn in (512, 1024, 4096):
        if want(f"fmbn_{bn}"):
            _time(f"fm_bf16x3_bn{bn}", fm_step_fn("bf16x3", bn),
                  jnp.float32(0.0), buf, args.iters)

    # (e) the full pipeline step (adds tail-concat, state plumbing, n0 math)
    if want("step"):
        rf = buf[..., : N_SAMPLES]
        _time("pipeline_step", model.step, model.init(), rf, args.iters)


if __name__ == "__main__":
    main()
