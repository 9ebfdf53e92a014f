"""Stream driver: pump framed RF blocks through a jitted streaming step.

The host-side event loop of a deployed receiver: a sample source (IQ file,
socket, SDR driver) feeds the native ring buffer; the runner frames fixed
blocks (overlap handled by the framework's carried state, NOT the framer —
pipeline steps carry their own tails) and drives ``model.step`` with the
state threaded through. Double-buffered: while the device crunches block k,
the host stages block k+1.
"""

import numpy as np

import jax
import jax.numpy as jnp

from gsdr_tpu.carray import ComplexArray
from gsdr_tpu.runtime.host import RingBuffer, int8_iq_to_planar, \
    int16_iq_to_planar


class IqFileSource:
    """Reads interleaved IQ recordings (int8 / int16 / float32) in chunks,
    staged to planar float32 via the native converters."""

    def __init__(self, path, fmt="int8", chunk_samples=1 << 16):
        if fmt not in ("int8", "int16", "float32"):
            raise ValueError(f"unknown IQ format {fmt}")
        self.path = path
        self.fmt = fmt
        self.chunk = int(chunk_samples)
        self._f = open(path, "rb")
        self._itemsize = {"int8": 1, "int16": 2, "float32": 4}[fmt]

    def read_planar(self):
        """Next chunk as (re, im) float32, or None at EOF."""
        raw = self._f.read(self.chunk * 2 * self._itemsize)
        if not raw:
            return None
        if self.fmt == "int8":
            return int8_iq_to_planar(np.frombuffer(raw, np.int8))
        if self.fmt == "int16":
            return int16_iq_to_planar(np.frombuffer(raw, np.int16))
        x = np.frombuffer(raw, np.float32)
        return x[0::2].copy(), x[1::2].copy()

    def close(self):
        self._f.close()


class StreamRunner:
    """Drives ``step(state, ComplexArray(block)) -> (state, out)`` over a
    source, jitting the step and carrying state.

    The runner is the deployment analog of the reference's application loop
    (the caller code its docs sketch around gsdrFmDemod — allocate buffers,
    manage overlap, call per block): here overlap/phase live in the state
    pytree, so the loop is just frame -> step -> emit.
    """

    def __init__(self, step, init_state, block_len, ring_capacity=None):
        self.block_len = int(block_len)
        self._step = jax.jit(step)
        self.state = init_state
        self.ring = RingBuffer(ring_capacity or 4 * self.block_len)
        # observability counters (the reference has no metrics at all,
        # SURVEY.md section 5)
        self.stats = {
            "samples_in": 0,
            "blocks_processed": 0,
            "ring_high_watermark": 0,
        }

    def feed_planar(self, re, im):
        """Stage planar samples into the transport ring."""
        inter = np.empty(2 * len(re), np.float32)
        inter[0::2] = re
        inter[1::2] = im
        written = self.ring.write(inter)
        if written < len(re):
            raise RuntimeError("ring overflow: consumer too slow")
        self.stats["samples_in"] += written
        self.stats["ring_high_watermark"] = max(
            self.stats["ring_high_watermark"], self.ring.readable)

    def pump(self):
        """Process as many full blocks as are buffered; returns list of
        device outputs (un-fetched: fetch with np.asarray when needed)."""
        outs = []
        while self.ring.readable >= self.block_len:
            re, im = self.ring.read_planar(self.block_len)
            block = ComplexArray(jnp.asarray(re), jnp.asarray(im))
            self.state, out = self._step(self.state, block)
            self.stats["blocks_processed"] += 1
            outs.append(out)
        return outs

    def run_file(self, source):
        """Stream an IqFileSource end-to-end; returns all outputs."""
        outs = []
        while True:
            chunk = source.read_planar()
            if chunk is None:
                break
            self.feed_planar(*chunk)
            outs.extend(self.pump())
        return outs
