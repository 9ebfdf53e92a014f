"""End-to-end SDR pipelines composed from gsdr_tpu ops + streaming state.

These are the framework's "models": complete, jittable receive/transmit
chains covering the reference's intended application patterns (the fused
AM/FM chains src/am.cu, src/fm.cu — including the multi-channel direction
its dead k_Fm4x kernel documents, src/fm.cu:71-179 — and the QPSK/QPSK256
modems src/qpsk.cu, src/qpsk256.cu), each scalable over a device mesh via
gsdr_tpu.parallel.
"""

from gsdr_tpu.pipelines.fm_radio import FmChannelizer, fm_deemphasis_coeffs
from gsdr_tpu.pipelines.am_radio import AmReceiver
from gsdr_tpu.pipelines.qpsk_modem import QpskModem, Qpsk256Modem

__all__ = [
    "FmChannelizer",
    "fm_deemphasis_coeffs",
    "AmReceiver",
    "QpskModem",
    "Qpsk256Modem",
]
