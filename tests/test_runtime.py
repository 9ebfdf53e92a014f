"""Native host runtime: ring buffer, framer, staging, packing, stream driver.

The native .so builds from native/src at first use; these tests exercise
both the C++ path and (via monkeypatched unavailability) the numpy
fallback, plus an end-to-end IQ-file -> FmChannelizer -> audio run.
"""

import os
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

import gsdr_tpu.runtime.host as host
from gsdr_tpu.runtime import (
    Framer,
    IqFileSource,
    RingBuffer,
    StreamRunner,
    int8_iq_to_planar,
    int16_iq_to_planar,
    native_available,
    pack_2bit,
    unpack_2bit,
)

RNG = np.random.default_rng(5)


def test_native_library_builds():
    assert native_available(), "native toolchain present; .so must build"


class TestRingBuffer:
    def test_roundtrip(self):
        ring = RingBuffer(1024)
        z = RNG.standard_normal(400).astype(np.float32)
        inter = z.reshape(-1, 2).reshape(-1)
        assert ring.write(inter) == 200
        assert ring.readable == 200
        re, im = ring.read_planar(200)
        np.testing.assert_array_equal(re, inter[0::2])
        np.testing.assert_array_equal(im, inter[1::2])
        assert ring.readable == 0

    def test_wraparound_and_backpressure(self):
        ring = RingBuffer(256)  # rounds to 256
        total_in, total_out = [], []
        for _ in range(10):
            chunk = RNG.standard_normal(180).astype(np.float32)
            n = ring.write(chunk)
            total_in.append(chunk[:2 * n])
            re, im = ring.read_planar(70)
            total_out.append(np.stack([re, im], -1).reshape(-1))
        re, im = ring.read_planar(ring.readable)
        total_out.append(np.stack([re, im], -1).reshape(-1))
        np.testing.assert_array_equal(
            np.concatenate(total_in), np.concatenate(total_out))


class TestFramer:
    def test_overlap_save_blocks(self):
        ring = RingBuffer(4096)
        framer = Framer(block_len=128, history=16)
        data = RNG.standard_normal(2 * 512).astype(np.float32)
        ring.write(data)
        re_all = data[0::2]
        blocks = []
        while True:
            blk = framer.next(ring)
            if blk is None:
                break
            blocks.append(blk)
        assert len(blocks) == 4
        # first block: zero history
        np.testing.assert_array_equal(blocks[0][0][:16], np.zeros(16))
        np.testing.assert_array_equal(blocks[0][0][16:], re_all[:128])
        assert blocks[0][2] == 0
        # second block: history = tail of first
        np.testing.assert_array_equal(blocks[1][0][:16], re_all[112:128])
        np.testing.assert_array_equal(blocks[1][0][16:], re_all[128:256])
        assert blocks[1][2] == 128


class TestStaging:
    def test_int8_reference_edge_values(self):
        # include/gsdr/conversion.h:24-29: -128,-127 -> -1; 127 -> 1; 0 -> 0
        data = np.array([-128, -127, 127, 0, 64, -64], np.int8)
        re, im = int8_iq_to_planar(data)
        np.testing.assert_allclose(re, [-1.0, 1.0, 64 / 127], rtol=1e-6)
        np.testing.assert_allclose(im, [-1.0, 0.0, -64 / 127], rtol=1e-6)

    def test_int16(self):
        data = np.array([32767, -32768, 0, 16384], np.int16)
        re, im = int16_iq_to_planar(data)
        np.testing.assert_allclose(re, [1.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(im, [-1.0, 16384 / 32767], atol=1e-5)

    def test_matches_numpy_fallback(self, monkeypatch):
        data = RNG.integers(-128, 128, 64).astype(np.int8)
        re_n, im_n = int8_iq_to_planar(data)
        monkeypatch.setattr(host, "_load", lambda: None)
        re_f, im_f = host.int8_iq_to_planar(data)
        np.testing.assert_array_equal(re_n, re_f)
        np.testing.assert_array_equal(im_n, im_f)


class TestPacking:
    def test_roundtrip_and_lsb_first(self):
        syms = np.array([1, 2, 3, 0, 3, 3], np.uint8)
        packed = pack_2bit(syms)
        # LSB-first: byte0 = 1 | 2<<2 | 3<<4 | 0<<6 = 0b00111001
        assert packed[0] == 0b00111001
        assert packed[1] == 0b00001111
        back = unpack_2bit(packed, 6)
        np.testing.assert_array_equal(back, syms)

    def test_matches_jnp_ops(self):
        from gsdr_tpu.ops.qpsk import pack_2bit_symbols, unpack_2bit_symbols
        syms = RNG.integers(0, 4, 333).astype(np.uint8)
        native = pack_2bit(syms)
        jnp_packed = np.asarray(pack_2bit_symbols(jnp.asarray(syms, jnp.int32),
                                                  out_dtype=jnp.int32))
        np.testing.assert_array_equal(native, jnp_packed.astype(np.uint8))
        np.testing.assert_array_equal(
            unpack_2bit(native, 333),
            np.asarray(unpack_2bit_symbols(jnp.asarray(native, jnp.int32),
                                           333)).astype(np.uint8))


class TestStreamRunner:
    def test_iq_file_to_fm_audio(self, tmp_path):
        """End-to-end deployment path: int8 IQ recording -> runner ->
        channelizer -> audio containing the modulating tone."""
        from gsdr_tpu.pipelines import FmChannelizer

        fs = 256_000.0
        n = 1 << 16
        t = np.arange(n) / fs
        tone, dev, fc = 1000.0, 4000.0, 50_000.0
        rf = np.exp(1j * (2 * np.pi * fc * t
                          + (dev / tone) * np.sin(2 * np.pi * tone * t)))
        inter = np.empty(2 * n, np.float32)
        inter[0::2] = rf.real * 0.7
        inter[1::2] = rf.imag * 0.7
        raw = np.clip(np.round(inter * 127), -127, 127).astype(np.int8)
        path = tmp_path / "test.iq"
        path.write_bytes(raw.tobytes())

        taps_n = 65
        k = np.arange(taps_n) - (taps_n - 1) / 2.0
        h = np.sinc(2 * 0.04 * k) * np.hamming(taps_n)
        model = FmChannelizer(
            sample_rate=fs, tuning_frequency=0.0,
            channel_frequencies=(fc,), frequency_deviation=dev,
            decimation=4, low_pass_taps=tuple((h / h.sum()).tolist()),
        )
        runner = StreamRunner(model.step, model.init(), block_len=8192)
        src = IqFileSource(str(path), fmt="int8", chunk_samples=5000)
        outs = runner.run_file(src)
        src.close()
        audio = np.concatenate([np.asarray(o) for o in outs], -1)[0]
        assert audio.shape[0] == (n // 8192) * 2048
        a = audio[200:] - audio[200:].mean()
        spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
        peak = np.argmax(spec[5:]) + 5
        peak_hz = peak * (fs / 4) / len(a)
        assert abs(peak_hz - tone) < 50.0, peak_hz
