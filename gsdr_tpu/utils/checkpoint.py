"""Checkpoint / resume for streaming state pytrees.

The reference has no checkpoint subsystem; its moral equivalent is the
caller-managed streaming contract (overlap buffers + firstSampleIndex +
ignored IIR history pointers — SURVEY.md section 5). Here stream state is an
explicit pytree (gsdr_tpu.stream / pipelines), so checkpointing is just
serializing that pytree. Numpy .npz is the format: zero extra deps,
bit-exact float32 round-trip, and the tree structure is encoded in the
keys. For multi-host sharded state, gather with
jax.experimental.multihost_utils or use orbax; this module covers the
single-controller case.
"""

import numpy as np

import jax
import jax.numpy as jnp


def _flatten_with_paths(state):
    flat, treedef = jax.tree_util.tree_flatten_with_path(state)
    items = {}
    for path, leaf in flat:
        key = jax.tree_util.keystr(path)
        items[key] = np.asarray(leaf)
    return items, treedef


def save_state(path, state):
    """Serialize a streaming-state pytree to ``path`` (.npz).

    The pytree may contain jnp arrays, ComplexArray planes, and int/float
    scalars. Restores bit-exactly via load_state with the same-structured
    ``like`` template.
    """
    items, _ = _flatten_with_paths(state)
    np.savez(path, **items)


def load_state(path, like):
    """Load a state pytree saved by save_state.

    ``like`` is a template pytree with the same structure (e.g. a fresh
    ``model.init()``); leaf values are replaced by the stored arrays, cast
    to the template leaf dtypes and placed as jnp arrays.
    """
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for pathk, leaf in flat:
        key = jax.tree_util.keystr(pathk)
        if key not in data:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = data[key]
        tmpl = jnp.asarray(leaf)
        if tuple(arr.shape) != tuple(tmpl.shape):
            raise ValueError(
                f"leaf {key!r} shape {arr.shape} != template {tmpl.shape}")
        leaves.append(jnp.asarray(arr, dtype=tmpl.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
