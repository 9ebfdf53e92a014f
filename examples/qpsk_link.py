"""Example: QPSK + QPSK256 links with AWGN, BER/SER measurement.

    python examples/qpsk_link.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:  # force CPU before any backend init
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from gsdr_tpu.carray import ComplexArray
from gsdr_tpu.pipelines import QpskModem, Qpsk256Modem
from gsdr_tpu.ops.qpsk256 import CIRCULAR


def awgn(sig, snr_db, es, rng):
    sigma = np.sqrt(es / (2.0 * 10 ** (snr_db / 10.0)))
    return ComplexArray(
        sig.re + jnp.asarray(rng.standard_normal(sig.shape), jnp.float32) * sigma,
        sig.im + jnp.asarray(rng.standard_normal(sig.shape), jnp.float32) * sigma,
    )


def main():
    rng = np.random.default_rng(0)
    nbytes = 1 << 15

    modem = QpskModem()
    data = jnp.asarray(rng.integers(0, 256, nbytes), jnp.int32)
    tx = modem.tx(data)
    for snr in (4.0, 7.0, 10.0):
        rx = modem.rx(awgn(tx, snr, es=2.0, rng=rng))
        bits_tx = np.unpackbits(np.asarray(data, np.uint8)[:, None], axis=1)
        bits_rx = np.unpackbits(np.asarray(rx, np.uint8)[:, None], axis=1)
        print(f"QPSK   {snr:4.1f} dB SNR: BER = {np.mean(bits_tx != bits_rx):.2e}")

    for ctype, name in ((None, "rect"), (CIRCULAR, "circ")):
        m256 = Qpsk256Modem() if ctype is None else Qpsk256Modem(ctype)
        syms = jnp.asarray(rng.integers(0, 256, nbytes), jnp.int32)
        tx = m256.tx(syms)
        es = float(jnp.mean(tx.re ** 2 + tx.im ** 2))
        for snr in (20.0, 26.0):
            rx = m256.rx(awgn(tx, snr, es=es, rng=rng))
            print(f"QPSK256/{name} {snr:4.1f} dB SNR: "
                  f"SER = {np.mean(np.asarray(rx) != np.asarray(syms)):.2e}")


if __name__ == "__main__":
    main()
