"""Sharded pipeline steps: FIR and the AM/FM channelizers over a mesh.

Builds shard_map'd versions of the gsdr_tpu.pipelines step functions over a
(channel, time) mesh (gsdr_tpu.parallel.mesh):

  * channels shard with zero communication — each chip holds the rows of the
    complex-tap-bank conv kernel (gsdr_tpu.ops.channelize) for its channels
    (the reference's Nx multi-stream families, embarrassingly parallel);
  * the time axis shards the raw RF stream with one (T-1)-sample left-halo
    ppermute for the fused channelizer window, a 1-sample halo for the FM
    discriminator (the reference's warp-shuffle contract,
    /root/reference/src/fm.cu:58-64, now over ICI), an all-gather of order-m
    IIR states (gsdr_tpu.parallel.iir), and a psum-masked broadcast of the
    stream tail for the carried state;
  * oscillator phase is communication-free: every chip mints its exact LO
    rotors from global sample indices (gsdr_tpu.utils.phase).

Streaming state lives replicated over 'time' (the RF tail is channel-
agnostic) with per-channel state sharded over 'channel', so a sharded step
composes exactly like the single-chip step: same state pytree, same
semantics, N/decimation outputs per N-sample block.
"""

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map as _shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map

from gsdr_tpu.carray import ComplexArray
from gsdr_tpu.ops.channelize import mix_fir_decimate_bank, rotate_bank
from gsdr_tpu.ops.fir import fir
from gsdr_tpu.ops.iir import iir_block
from gsdr_tpu.ops.quad_demod import quad_am_demod, quad_fm_demod
from gsdr_tpu.parallel.halo import left_halo, last_shard_tail
from gsdr_tpu.parallel.iir import sharded_iir


def _shmap(f, mesh, in_specs, out_specs):
    return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                      check_vma=False)


def sharded_fir(x, taps, mesh, decimation=1, tail=None):
    """FIR + decimation with x (C, N) sharded over ('channel', 'time').

    Streaming convention: output j uses the input window *ending* at j*D
    (history prepended), so each shard needs a (T-1)-sample left halo; shard
    0 uses ``tail`` (the carried stream history, (C, T-1)) or zeros. Returns
    (C, N/D) with the same sharding as x.
    """
    taps = jnp.asarray(taps, jnp.float32)
    nt = int(taps.shape[0])
    t_shards = mesh.shape["time"]
    if x.shape[-1] % (t_shards * decimation) != 0:
        raise ValueError("N must divide by time_shards * decimation")
    if tail is None:
        tail = ComplexArray.zeros(x.shape[:-1] + (nt - 1,)) \
            if isinstance(x, ComplexArray) else \
            jnp.zeros(x.shape[:-1] + (nt - 1,), jnp.float32)

    def body(x_l, tail_l):
        buf = left_halo(x_l, "time", nt - 1, fill=tail_l)
        return fir(buf, taps, decimation)

    return _shmap(
        body, mesh,
        in_specs=(P("channel", "time"), P("channel", None)),
        out_specs=P("channel", "time"),
    )(x, tail)


def _channelize_local(rf_l, tail, kernel_l, table_l, n0, nt, dec, fs):
    """Shared shard-local fused channelize: halo'd raw RF -> rotated (C_l, M).

    Returns (filt, new_tail): the conv consumes the (T-1)-sample left halo
    (shard 0 takes the carried stream tail), and rotor phases come from the
    global window-start index n0 - (T-1) + s*n_local + j*D — exact, no comm.
    """
    s = lax.axis_index("time")
    n_local = rf_l.shape[-1]
    buf = left_halo(rf_l, "time", nt - 1, fill=tail)
    y = mix_fir_decimate_bank(buf, kernel_l, dec)
    rot0 = (n0 + jnp.int32(fs - (nt - 1) % fs)
            + (s * jnp.int32(n_local % fs)) % fs) % fs
    filt = rotate_bank(y, table_l, rot0, dec)
    new_tail = last_shard_tail(rf_l, "time", nt - 1)
    return filt, new_tail


def make_sharded_fm_step(model, mesh):
    """shard_map'd FmChannelizer.step over a ('channel', 'time') mesh.

    Returns ``step(state, rf_planar)`` with the same signature/state pytree
    as the single-chip model.step. rf is a planar (N,) block sharded over
    'time'; audio comes back (C, N/D) sharded over ('channel', 'time').
    """
    t_shards = mesh.shape["time"]
    nt = model.num_taps
    dec = model.decimation
    gain = model.gain
    fs = int(round(model.sample_rate))
    b, a = model._deemph()
    kernel_host = model._tap_bank()          # (2C, 2, T)
    table_host = jnp.asarray(model._lo_table())  # (C, 4)

    def body(n0, tail_re, tail_im, car_re, car_im, zi, kernel, table,
             rf_re, rf_im):
        rf_l = ComplexArray(rf_re, rf_im)
        tail = ComplexArray(tail_re, tail_im)
        filt, new_tail = _channelize_local(
            rf_l, tail, kernel, table, n0, nt, dec, fs)

        carry = ComplexArray(car_re, car_im)
        disc_in = left_halo(filt, "time", 1, fill=carry)
        demod = quad_fm_demod(disc_in, gain)
        new_carry = last_shard_tail(filt, "time", 1)

        audio, new_zi = sharded_iir(b, a, demod, zi, "time", t_shards,
                                    block_len=256)

        n_total = rf_re.shape[-1] * t_shards
        n0_new = (n0 + jnp.int32(n_total % fs)) % fs
        return (n0_new, new_tail.re, new_tail.im, new_carry.re,
                new_carry.im, new_zi, audio)

    rep = P()  # replicated
    chan = P("channel", None)
    mapped = _shmap(
        body, mesh,
        in_specs=(rep, rep, rep, chan, chan, chan,
                  P("channel", None, None), chan, P("time"), P("time")),
        out_specs=(rep, rep, rep, chan, chan, chan, P("channel", "time")),
    )

    def step(state, rf):
        n0, tail, carry, zi = state
        if rf.shape[-1] % (t_shards * dec) != 0:
            raise ValueError("N must divide by time_shards * decimation")
        (n0n, tre, tim, cre, cim, zin, audio) = mapped(
            n0, tail.re, tail.im, carry.re, carry.im, zi,
            kernel_host, table_host, rf.re, rf.im,
        )
        return (n0n, ComplexArray(tre, tim), ComplexArray(cre, cim), zin), audio

    return step


def make_sharded_am_step(model, mesh):
    """shard_map'd AmReceiver.step over a ('channel', 'time') mesh."""
    t_shards = mesh.shape["time"]
    nt = model.num_taps
    dec = model.decimation
    fs = int(round(model.sample_rate))
    kernel_host = model._tap_bank()
    table_host = jnp.asarray(model._lo_table())

    def body(n0, tail_re, tail_im, kernel, table, rf_re, rf_im):
        rf_l = ComplexArray(rf_re, rf_im)
        tail = ComplexArray(tail_re, tail_im)
        filt, new_tail = _channelize_local(
            rf_l, tail, kernel, table, n0, nt, dec, fs)
        audio = quad_am_demod(filt)
        n_total = rf_re.shape[-1] * t_shards
        n0_new = (n0 + jnp.int32(n_total % fs)) % fs
        return n0_new, new_tail.re, new_tail.im, audio

    rep = P()
    chan = P("channel", None)
    mapped = _shmap(
        body, mesh,
        in_specs=(rep, rep, rep, P("channel", None, None), chan,
                  P("time"), P("time")),
        out_specs=(rep, rep, rep, P("channel", "time")),
    )

    def step(state, rf):
        n0, tail = state
        n0n, tre, tim, audio = mapped(n0, tail.re, tail.im, kernel_host,
                                      table_host, rf.re, rf.im)
        return (n0n, ComplexArray(tre, tim)), audio

    return step
