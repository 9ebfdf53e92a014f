"""Mesh construction for the (channel, time) sharding model."""

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(channel=1, time=1, devices=None):
    """Build a Mesh with named axes ('channel', 'time').

    ``channel * time`` must equal the device count. On a multi-host pod
    slice, pass ``devices=jax.devices()`` after jax.distributed.initialize;
    the default uses all local/global devices. Channel sharding is the
    embarrassingly-parallel axis (prefer it across DCN/hosts); time sharding
    exchanges (T-1)-sample halos every block (keep it on ICI).
    """
    devices = jax.devices() if devices is None else list(devices)
    if channel * time != len(devices):
        raise ValueError(
            f"channel*time = {channel * time} != device count {len(devices)}"
        )
    arr = np.asarray(devices).reshape(channel, time)
    return Mesh(arr, ("channel", "time"))
