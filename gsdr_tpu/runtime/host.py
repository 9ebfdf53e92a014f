"""ctypes bindings for the native host runtime (native/src/gsdr_host.{h,cc}).

Builds libgsdr_host.so on first use (make -C native) and falls back to pure
numpy implementations when no toolchain is available, so the Python API is
always importable. The native path exists because these host-side loops
(ring transport, framing, int8 staging, bit packing) run per-block at
sample rate and must not pay Python-loop costs — the same reasoning that
put the reference's whole library behind a C ABI
(/root/reference/include/gsdr/util.h:19-29).
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libgsdr_host.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build():
    subprocess.run(
        ["make", "-C", _NATIVE_DIR, "-s"],
        check=True, capture_output=True, timeout=120,
    )


def _load():
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            # Always invoke make: it is a no-op when the .so is newer than
            # the sources, and it guarantees the loaded binary was built on
            # THIS machine (the .so is never committed; a foreign-arch
            # binary built with -march=native could SIGILL).
            _build()
            lib = ctypes.CDLL(_SO_PATH)
        except (OSError, subprocess.SubprocessError):
            _build_failed = True
            return None
        _declare(lib)
        _lib = lib
        return _lib


def _declare(lib):
    c = ctypes
    fp = c.POINTER(c.c_float)
    lib.gsdr_ring_create.restype = c.c_void_p
    lib.gsdr_ring_create.argtypes = [c.c_size_t]
    lib.gsdr_ring_destroy.argtypes = [c.c_void_p]
    lib.gsdr_ring_capacity.restype = c.c_size_t
    lib.gsdr_ring_capacity.argtypes = [c.c_void_p]
    lib.gsdr_ring_readable.restype = c.c_size_t
    lib.gsdr_ring_readable.argtypes = [c.c_void_p]
    lib.gsdr_ring_writable.restype = c.c_size_t
    lib.gsdr_ring_writable.argtypes = [c.c_void_p]
    lib.gsdr_ring_write.restype = c.c_size_t
    lib.gsdr_ring_write.argtypes = [c.c_void_p, fp, c.c_size_t]
    lib.gsdr_ring_read_planar.restype = c.c_size_t
    lib.gsdr_ring_read_planar.argtypes = [c.c_void_p, fp, fp, c.c_size_t]
    lib.gsdr_framer_create.restype = c.c_void_p
    lib.gsdr_framer_create.argtypes = [c.c_size_t, c.c_size_t]
    lib.gsdr_framer_destroy.argtypes = [c.c_void_p]
    lib.gsdr_framer_next.restype = c.c_int
    lib.gsdr_framer_next.argtypes = [
        c.c_void_p, c.c_void_p, fp, fp, c.POINTER(c.c_uint64)]
    i8p = c.POINTER(c.c_int8)
    i16p = c.POINTER(c.c_int16)
    u8p = c.POINTER(c.c_uint8)
    lib.gsdr_int8_iq_to_planar_f32.argtypes = [i8p, c.c_size_t, fp, fp]
    lib.gsdr_int16_iq_to_planar_f32.argtypes = [i16p, c.c_size_t, fp, fp]
    lib.gsdr_f32_iq_to_planar.argtypes = [fp, c.c_size_t, fp, fp]
    lib.gsdr_planar_to_f32_iq.argtypes = [fp, fp, c.c_size_t, fp]
    lib.gsdr_unpack_2bit.argtypes = [u8p, c.c_size_t, u8p]
    lib.gsdr_pack_2bit.argtypes = [u8p, c.c_size_t, u8p]


def native_available():
    """True when libgsdr_host.so is (or can be) loaded."""
    return _load() is not None


class HostLib:
    """Access point for the raw ctypes library (None => numpy fallback)."""

    @staticmethod
    def get():
        return _load()


def _fptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class RingBuffer:
    """SPSC complex-sample ring buffer (native; numpy deque fallback)."""

    def __init__(self, capacity_samples):
        self._lib = _load()
        if self._lib is not None:
            self._h = self._lib.gsdr_ring_create(capacity_samples)
            if not self._h:
                raise MemoryError("gsdr_ring_create failed")
        else:
            self._h = None
            self._buf = np.zeros((0,), np.complex64)
            self._capacity = capacity_samples

    @property
    def readable(self):
        if self._h:
            return self._lib.gsdr_ring_readable(self._h)
        return len(self._buf)

    def write(self, interleaved_f32):
        """Push interleaved (re, im, re, im, ...) float32; returns samples
        accepted."""
        x = np.ascontiguousarray(interleaved_f32, np.float32)
        n = len(x) // 2
        if self._h:
            return self._lib.gsdr_ring_write(self._h, _fptr(x), n)
        take = min(n, self._capacity - len(self._buf))
        z = x[:2 * take].view(np.complex64) if take else np.zeros(0, np.complex64)
        self._buf = np.concatenate([self._buf, z])
        return take

    def read_planar(self, n):
        """Pop up to n samples -> (re, im) float32 arrays."""
        if self._h:
            re = np.empty(n, np.float32)
            im = np.empty(n, np.float32)
            got = self._lib.gsdr_ring_read_planar(self._h, _fptr(re),
                                                  _fptr(im), n)
            return re[:got], im[:got]
        take = min(n, len(self._buf))
        z, self._buf = self._buf[:take], self._buf[take:]
        return z.real.copy(), z.imag.copy()

    def close(self):
        if self._h:
            self._lib.gsdr_ring_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class Framer:
    """Overlap-save framer: emits (history + block_len)-sample planar blocks
    from a RingBuffer, carrying the history tail natively."""

    def __init__(self, block_len, history):
        self.block_len = int(block_len)
        self.history = int(history)
        self._lib = _load()
        if self._lib is not None:
            self._h = self._lib.gsdr_framer_create(self.block_len, self.history)
        else:
            self._h = None
            self._tail_re = np.zeros(self.history, np.float32)
            self._tail_im = np.zeros(self.history, np.float32)
            self._next_idx = 0

    def next(self, ring):
        """(re, im, first_sample_index) or None when not enough data."""
        total = self.history + self.block_len
        re = np.empty(total, np.float32)
        im = np.empty(total, np.float32)
        if self._h:
            idx = ctypes.c_uint64()
            rc = self._lib.gsdr_framer_next(self._h, ring._h, _fptr(re),
                                            _fptr(im), ctypes.byref(idx))
            if rc != 0:
                return None
            return re, im, idx.value
        if ring.readable < self.block_len:
            return None
        r, i = ring.read_planar(self.block_len)
        re[:self.history] = self._tail_re
        im[:self.history] = self._tail_im
        re[self.history:] = r
        im[self.history:] = i
        idx = self._next_idx
        self._next_idx += self.block_len
        if self.history:
            self._tail_re = re[-self.history:].copy()
            self._tail_im = im[-self.history:].copy()
        return re, im, idx

    def close(self):
        if self._h:
            self._lib.gsdr_framer_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def int8_iq_to_planar(data):
    """int8 interleaved IQ bytes -> (re, im) normalized float32 planes.

    Reference semantics out = max(-1, x/127) (include/gsdr/conversion.h:
    24-29)."""
    x = np.ascontiguousarray(data, np.int8)
    n = len(x) // 2
    lib = _load()
    re = np.empty(n, np.float32)
    im = np.empty(n, np.float32)
    if lib is not None:
        lib.gsdr_int8_iq_to_planar_f32(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), n,
            _fptr(re), _fptr(im))
        return re, im
    v = np.maximum(-1.0, x.astype(np.float32) / 127.0)
    return v[0::2].copy(), v[1::2].copy()


def int16_iq_to_planar(data):
    """int16 interleaved IQ -> (re, im) float32 planes scaled by 1/32767."""
    x = np.ascontiguousarray(data, np.int16)
    n = len(x) // 2
    lib = _load()
    re = np.empty(n, np.float32)
    im = np.empty(n, np.float32)
    if lib is not None:
        lib.gsdr_int16_iq_to_planar_f32(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), n,
            _fptr(re), _fptr(im))
        return re, im
    v = np.maximum(-1.0, x.astype(np.float32) / 32767.0)
    return v[0::2].copy(), v[1::2].copy()


def unpack_2bit(packed, num_symbols):
    """Packed bytes -> symbol values 0..3 (LSB-first, src/qpsk.cu:121-123)."""
    b = np.ascontiguousarray(packed, np.uint8)
    lib = _load()
    out = np.empty(num_symbols, np.uint8)
    if lib is not None:
        lib.gsdr_unpack_2bit(
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            num_symbols,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out
    idx = np.arange(num_symbols)
    return ((b[idx >> 2] >> ((idx & 3) * 2)) & 0x3).astype(np.uint8)


def pack_2bit(symbols):
    """Symbol values 0..3 -> packed bytes."""
    s = np.ascontiguousarray(symbols, np.uint8)
    n = len(s)
    lib = _load()
    out = np.empty((n + 3) // 4, np.uint8)
    if lib is not None:
        lib.gsdr_pack_2bit(
            s.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out
    pad = (-n) % 4
    sp = np.concatenate([s & 0x3, np.zeros(pad, np.uint8)])
    grp = sp.reshape(-1, 4).astype(np.uint16)
    return (grp[:, 0] | (grp[:, 1] << 2) | (grp[:, 2] << 4)
            | (grp[:, 3] << 6)).astype(np.uint8)
