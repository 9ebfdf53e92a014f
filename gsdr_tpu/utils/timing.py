"""Trustworthy on-device timing for streaming steps.

Two quirks of the deployment backend make naive timing lie:

  * ``jax.block_until_ready`` returns immediately (the tunnel transport does
    not implement the readiness wait), so async-dispatch loops measure
    dispatch cost, not execution;
  * every dispatch pays a tens-of-ms host<->device RPC round trip, so
    per-call timing is overhead-dominated.

The fix for both: roll the iteration loop INTO the jitted program with
lax.scan (one dispatch, K chained steps, state threaded so nothing can be
dead-code-eliminated) and force completion by fetching a scalar reduction of
the final output to the host. Subtract the measured fixed overhead of an
empty (K=0-work) fetch.
"""

import time

import jax
import jax.numpy as jnp
from jax import lax


def time_step(step, state, block, iters=20, reps=3):
    """Median seconds per ``step(state, block)`` execution.

    ``step`` must be a pure (state, block) -> (state, out) function with
    pytree state. The K-step loop is jitted as one program; the returned
    time includes everything the step does, amortizing dispatch overhead
    over ``iters`` chained executions.
    """

    def k_steps(state, block):
        def body(carry, _):
            st, checksum = carry
            st, out = step(st, block)
            leaves = jax.tree_util.tree_leaves(out)
            checksum = checksum + jnp.sum(leaves[0][..., :1])
            return (st, checksum), None

        (st, checksum), _ = lax.scan(
            body, (state, jnp.float32(0.0)), None, length=iters)
        return checksum

    run = jax.jit(k_steps)
    _ = float(run(state, block))  # compile + warmup

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(run(state, block))
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]

    # fixed dispatch/fetch overhead: a 1-step program of the same shape
    def one_step(state, block):
        st, out = step(state, block)
        return jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1])

    run1 = jax.jit(one_step)
    _ = float(run1(state, block))
    t0 = time.perf_counter()
    _ = float(run1(state, block))
    overhead_plus_one = time.perf_counter() - t0

    per_iter = (med - overhead_plus_one) / (iters - 1)
    return max(per_iter, 1e-9)
