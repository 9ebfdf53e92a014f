"""Host-side runtime: native ring buffer / framer / staging + stream driver.

The native layer (native/src/gsdr_host.cc, C ABI, ctypes-bound here) owns
the GIL-free host work of a production SDR deployment — sample transport,
overlap-save framing, int8/int16 staging, QPSK byte packing — while the
device math stays in XLA/Pallas. gsdr_tpu.runtime.stream_runner pumps
framed blocks through a jitted streaming step with carried state.
"""

from gsdr_tpu.runtime.host import (
    HostLib,
    RingBuffer,
    Framer,
    int8_iq_to_planar,
    int16_iq_to_planar,
    pack_2bit,
    unpack_2bit,
    native_available,
)
from gsdr_tpu.runtime.stream_runner import StreamRunner, IqFileSource

__all__ = [
    "HostLib",
    "RingBuffer",
    "Framer",
    "int8_iq_to_planar",
    "int16_iq_to_planar",
    "pack_2bit",
    "unpack_2bit",
    "native_available",
    "StreamRunner",
    "IqFileSource",
]
