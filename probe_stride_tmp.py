"""Probe 2: does the in-kernel interleave compile at smaller block widths?"""
import json
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")
from gsdr_tpu.utils.timing import time_step

R = 16
C2 = 16
NJ = 16384


def make(kernel, bn):
    @jax.jit
    def run(y):
        return pl.pallas_call(
            kernel,
            grid=(NJ // bn,),
            in_specs=[pl.BlockSpec((R * C2, bn), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((C2, bn * R), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C2, NJ * R), jnp.float32),
        )(y)
    return run


def k_transpose(y_ref, out_ref):
    bn = y_ref.shape[1]
    z = y_ref[:, :].reshape(R, C2, bn)
    z = jnp.transpose(z, (1, 2, 0))
    out_ref[:, :] = z.reshape(C2, bn * R)


def k_stack(y_ref, out_ref):
    bn = y_ref.shape[1]
    ys = [y_ref[r * C2:(r + 1) * C2, :] for r in range(R)]
    z = jnp.stack(ys, axis=-1)
    out_ref[:, :] = z.reshape(C2, bn * R)


@jax.jit
def run_xla(y):
    a = y.reshape(R, C2, NJ)
    return jnp.transpose(a, (1, 2, 0)).reshape(C2, NJ * R)


rng = np.random.default_rng(0)
y = jnp.asarray(rng.standard_normal((R * C2, NJ)), jnp.float32)
ref = np.asarray(run_xla(y))

for name, kern in (("nd_transpose", k_transpose), ("stack", k_stack)):
    for bn in (256, 1024):
        try:
            run = make(kern, bn)
            got = np.asarray(run(y))
            ok = bool(np.array_equal(got, ref))
            print(json.dumps({"variant": name, "bn": bn, "compiles": True,
                              "bit_exact": ok}), flush=True)
            if not ok:
                continue

            def step(st, yy, run=run):
                out = run(yy + st * 1e-30)
                return jnp.sum(out[:, :1]) * 1e-30 + st * 0.5, out

            sec = time_step(step, jnp.float32(0.0), y, iters=1000, reps=5)
            print(json.dumps({"variant": name, "bn": bn,
                              "us": round(sec * 1e6, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "bn": bn, "compiles": False,
                              "error": str(e)[:160]}), flush=True)
