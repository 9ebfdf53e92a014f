"""Stage ablation of the fused FM chain on the real chip.

Answers BASELINE.md's open question: of the ~320 us/step (2^20 samples,
16 ch), how much is MXU dots vs VPU stages (rotor/atan2/scan) vs the XLA
relayouts around the kernel (xq prep, audio unstack)?

Method: time_step (scan-in-jit, overhead-subtracted) on
  * xqadd        — st-injected elementwise add on the xq array (the data-
                   dependence injection all kernel rows share; its cost is
                   one HBM read+write of 8 MB, reported so deltas are clean)
  * kernel@dot   — injection + fused kernel cut after the window matmul
  * kernel@rotor — ... after the LO rotor
  * kernel@disc  — ... after the discriminator atan2
  * kernel@full  — ... the whole kernel
  * prep         — _xq_prep alone (planar RF -> (R*2D, n_coarse) relayout)
  * unstack      — _unstack alone ((R*C, M/R) r-major -> (C, M) relayout)
  * e2e          — model.step (everything, the bench.py number)
plus a block_n sweep of kernel@full.

Stage costs are consecutive differences; every step threads carried state
through its INPUT (x + st*1e-30) so scan iterations cannot be hoisted
(CLAUDE.md timing discipline).

Usage: python -m benchmarks.ablate_chain  (TPU; ~2 min)
"""

import dataclasses
import json

import numpy as np

import jax
import jax.numpy as jnp

from gsdr_tpu.carray import ComplexArray
from gsdr_tpu.kernels import fm_chain_pallas as fcp
from gsdr_tpu.utils.timing import time_step
from __graft_entry__ import _model

N_SAMPLES = 1 << 20
ITERS = 200


def _inputs(model):
    t = model.num_taps
    d = model.decimation
    rng = np.random.default_rng(0)
    n_buf = N_SAMPLES + t - 1
    buf = ComplexArray(
        jnp.asarray(rng.standard_normal(n_buf), jnp.float32),
        jnp.asarray(rng.standard_normal(n_buf), jnp.float32))
    c_cnt = model.num_channels
    m = (n_buf - t) // d + 1
    c_eff, r_stack, groups, _ = fcp._stack_geometry(c_cnt, t, d, m)
    rows = r_stack * 2 * d
    n_j = m // r_stack
    xq = fcp._xq_prep(buf, d, r_stack, n_j + fcp._LANE, mode="flat")
    kh = fcp._pad_bank(np.asarray(model._tap_bank()), c_eff)
    g = fcp._g_matrix_stacked(kh, d, c_eff, r_stack, groups)
    gh, gl, f32_dot = fcp._split_g(g, "bf16x3")
    geom = dict(groups=groups, rows=rows, c_eff=c_eff, r_stack=r_stack,
                f32_dot=f32_dot)
    return buf, xq, gh, gl, geom, m, n_j


def main():
    model = dataclasses.replace(
        _model(num_channels=16, num_taps=64, decimation=4), impl="pallas")
    buf, xq, gh, gl, geom, m, n_j = _inputs(model)
    d = model.decimation
    r_stack = geom["r_stack"]
    c_eff = geom["c_eff"]
    b_, a_ = model._deemph()
    b0 = float(b_[0]) / float(a_[0])
    b1 = float(b_[1]) / float(a_[0])
    a1 = float(a_[1]) / float(a_[0])
    chain_kw = dict(groups=geom["groups"], rows=geom["rows"], c_eff=c_eff,
                    r_stack=r_stack, gain=float(model.gain), b0=b0,
                    cc=b1 - a1 * b0, a1=a1, f32_dot=geom["f32_dot"],
                    interpret=False)

    shifts = tuple(model._shifts())
    results = {}

    def run(name, step, state, block, iters=ITERS):
        sec = time_step(step, state, block, iters=iters, reps=5)
        results[name] = sec * 1e6
        print(json.dumps({"stage": name, "us_per_step": round(sec * 1e6, 1)}),
              flush=True)

    # relayout-only steps are ~20-40 us: they need thousands of chained
    # iterations to rise above the ~35 ms dispatch floor
    CHEAP_ITERS = 2000

    # -- injection-cost baseline -------------------------------------------
    def step_xqadd(st, x):
        out = x + st * 1e-30
        return jnp.sum(out[:1, :128]) * 1e-30, out

    run("xqadd", step_xqadd, jnp.float32(0.0), xq, iters=CHEAP_ITERS)

    # -- kernel ablation ----------------------------------------------------
    def make_kernel_step(ablate, block_n=2048, xq_mode="flat"):
        gh_m, gl_m = gh, gl
        if xq_mode == "nt":
            g_m = fcp._g_matrix_stacked(
                fcp._pad_bank(np.asarray(model._tap_bank()), c_eff), d,
                c_eff, r_stack, geom["groups"], order="planar")
            gh_m, gl_m, _ = fcp._split_g(g_m, "bf16x3")
        # same VMEM-aware cap as the production FM wrapper
        k_rows = geom["groups"] * geom["rows"]
        cap = max(fcp._LANE,
                  3_500_000 // (9 * r_stack * 2 * c_eff // 2 + k_rows))
        bn = fcp._pick_bn(n_j, min(block_n, cap))
        n_blk = n_j // bn
        pj_np, bt_np = fcp._phasor_tables(
            tuple(shifts) + (0.0,) * (c_eff - len(shifts)),
            model.sample_rate, d, r_stack, bn, n_blk)
        pj = jnp.asarray(pj_np)
        bt = jnp.asarray(bt_np)
        base = jnp.concatenate(
            [jnp.ones((c_eff, 1), jnp.float32),
             jnp.zeros((c_eff, 1), jnp.float32)], axis=1)
        fcar0 = jnp.zeros((c_eff, 2), jnp.float32)
        zcar0 = jnp.zeros((c_eff, 1), jnp.float32)

        def step(st, x):
            if isinstance(x, tuple):
                x = (x[0] + st * 1e-30,) + x[1:]
            else:
                x = x + st * 1e-30
            audio, fcar, zcar = fcp._run_chain(
                base, x, gh_m, gl_m, bt, pj, fcar0, zcar0,
                block_n=bn, ablate=ablate, xq_mode=xq_mode, **chain_kw)
            return jnp.sum(fcar) * 1e-30, (audio, fcar, zcar)

        return step

    # kernel rows: ~100-200 us/step needs >=1000 chained iters — at 200 the
    # +-10 ms rep-to-rep overhead noise is +-50 us/iter, bigger than the
    # stage deltas being measured
    KERNEL_ITERS = 1000
    for ablate in ("dot", "rotor", "disc", "full"):
        run(f"kernel@{ablate}", make_kernel_step(ablate), jnp.float32(0.0),
            xq, iters=KERNEL_ITERS)

    # -- XLA relayouts around the kernel -------------------------------------
    def step_prep(st, b):
        b2 = ComplexArray(b.re + st * 1e-30, b.im)
        out = fcp._xq_prep(b2, d, r_stack, n_j + fcp._LANE)
        return jnp.sum(out[:1, :128]) * 1e-30, out

    run("prep", step_prep, jnp.float32(0.0), buf, iters=CHEAP_ITERS)

    audio_rmaj = jnp.zeros((r_stack * c_eff, n_j), jnp.float32)

    def step_unstack(st, a):
        out = fcp._unstack(a + st * 1e-30, c_eff, model.num_channels,
                           r_stack, m)
        return jnp.sum(out[:1, :128]) * 1e-30, out

    run("unstack", step_unstack, jnp.float32(0.0), audio_rmaj,
        iters=CHEAP_ITERS)

    # bare relayout reference: the (n_coarse, rows) -> (rows, n_coarse)
    # transpose is the suspected expensive part of prep
    xq_t = jnp.zeros(xq.shape[::-1], jnp.float32)

    def step_transpose(st, x):
        out = (x + st * 1e-30).T
        return jnp.sum(out[:1, :128]) * 1e-30, out

    run("transpose", step_transpose, jnp.float32(0.0), xq_t,
        iters=CHEAP_ITERS)

    # -- composites: localize what the standalone rows can't ---------------
    kernel_full = make_kernel_step("full")

    def make_prep_kernel(xq_mode, block_n=2048):
        k_step = make_kernel_step("full", block_n=block_n, xq_mode=xq_mode)

        def step(st, b):
            b2 = ComplexArray(b.re + st * 1e-30, b.im)
            x = fcp._xq_prep(b2, d, r_stack, n_j + fcp._LANE, mode=xq_mode)
            return k_step(jnp.float32(0.0), x)

        return step

    for xq_mode in ("flat", "nt"):
        run(f"prep+kernel@{xq_mode}", make_prep_kernel(xq_mode),
            jnp.float32(0.0), buf, iters=KERNEL_ITERS)

    def step_kernel_unstack(st, x):
        st2, (audio, fcar, zcar) = kernel_full(st, x)
        out = fcp._unstack(audio, c_eff, model.num_channels, r_stack, m)
        return st2, out

    run("kernel+unstack", step_kernel_unstack, jnp.float32(0.0), xq,
        iters=KERNEL_ITERS)

    def step_all(st, b):
        b2 = ComplexArray(b.re + st * 1e-30, b.im)
        x = fcp._xq_prep(b2, d, r_stack, n_j + fcp._LANE)
        st2, (audio, fcar, zcar) = kernel_full(jnp.float32(0.0), x)
        out = fcp._unstack(audio, c_eff, model.num_channels, r_stack, m)
        return st2, out

    run("prep+kernel+unstack", step_all, jnp.float32(0.0), buf,
        iters=KERNEL_ITERS)

    # -- end to end -----------------------------------------------------------
    rng = np.random.default_rng(1)
    rf = ComplexArray(
        jnp.asarray(rng.standard_normal(N_SAMPLES), jnp.float32),
        jnp.asarray(rng.standard_normal(N_SAMPLES), jnp.float32))
    run("e2e", model.step, model.init(), rf, iters=600)

    # -- block_n sweep on the full kernel (capped by the VMEM formula) ------
    for bn in (256, 512):
        try:
            run(f"kernel@full_bn{bn}", make_kernel_step("full", bn),
                jnp.float32(0.0), xq, iters=KERNEL_ITERS)
        except Exception as e:  # VMEM OOM at large bn — report, keep going
            print(json.dumps({"stage": f"kernel@full_bn{bn}",
                              "error": str(e)[:120]}), flush=True)

    inj = results["xqadd"]
    print(json.dumps({
        "summary_us": {
            "injection_add": round(inj, 1),
            "dot": round(results["kernel@dot"] - inj, 1),
            "rotor": round(results["kernel@rotor"] - results["kernel@dot"], 1),
            "disc": round(results["kernel@disc"] - results["kernel@rotor"], 1),
            "deemph": round(results["kernel@full"] - results["kernel@disc"], 1),
            "prep": round(results["prep"], 1),
            "unstack": round(results["unstack"], 1),
            "e2e": round(results["e2e"], 1),
        }}), flush=True)


if __name__ == "__main__":
    main()
