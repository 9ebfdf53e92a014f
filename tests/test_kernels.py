"""Pallas kernels, validated in interpreter mode on CPU.

Correctness bar: bit-level agreement structure with the XLA tap-bank conv
(the bf16x3 contraction carries ~1e-4 relative error by design — inside
the reference CUDA library's f32 test tolerances, SURVEY.md section 4).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gsdr_tpu.carray import ComplexArray
from gsdr_tpu.kernels.channelize_pallas import (
    mix_fir_decimate_bank_pallas,
    pallas_supported,
)
from gsdr_tpu.ops.channelize import make_complex_tap_bank, \
    mix_fir_decimate_bank

RNG = np.random.default_rng(17)
FS = 1_000_000.0


def _planar(n):
    z = RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
    return ComplexArray.from_complex(z.astype(np.complex64))


class TestChannelizePallas:
    @pytest.mark.parametrize("n,t,d,shifts", [
        (5000, 64, 4, [12_345.0, -5_000.0, 0.0, 99_000.0]),
        (4096, 32, 4, [250_000.0]),
        (9000, 128, 8, [1_000.0, -1_000.0]),
        (700, 16, 4, [44_100.0, 0.0, 3.0]),
        # round-2: D in {1, 2} (the old layout required 2D % 8 == 0)
        (3000, 64, 1, [10_000.0, -7_000.0]),
        (3000, 32, 2, [50_000.0]),
        # round-4: T % D != 0 (trailing-zero tap pad, output-identical;
        # reference accepts any T, include/gsdr/fir.h:30-68)
        (5000, 65, 4, [12_345.0, -5_000.0]),
        (3000, 30, 8, [1_000.0]),
        (2000, 7, 3, [44_100.0, 0.0]),
    ])
    def test_matches_xla_conv(self, n, t, d, shifts):
        assert pallas_supported(d, t)
        x = _planar(n)
        taps = RNG.standard_normal(t).astype(np.float32) * 0.2
        kernel = make_complex_tap_bank(taps, shifts, FS)
        want = mix_fir_decimate_bank(x, kernel, d)
        got = mix_fir_decimate_bank_pallas(x, kernel, d, interpret=True)
        assert got.shape == want.shape
        scale = np.max(np.abs(want.to_numpy())) + 1e-9
        err = np.max(np.abs(got.to_numpy() - want.to_numpy())) / scale
        assert err < 3e-4, err

    @pytest.mark.parametrize("xq_mode", ["flat", "nt"])
    def test_xq_modes_agree(self, xq_mode):
        """The two kernel input layouts compute identical windows (the
        losing t32/tiled modes were dropped in round 3)."""
        x = _planar(5000)
        taps = RNG.standard_normal(64).astype(np.float32) * 0.2
        kernel = make_complex_tap_bank(taps, [12_345.0, -5_000.0], FS)
        want = mix_fir_decimate_bank(x, kernel, 4)
        got = mix_fir_decimate_bank_pallas(x, kernel, 4, interpret=True,
                                           xq_mode=xq_mode)
        scale = np.max(np.abs(want.to_numpy())) + 1e-9
        err = np.max(np.abs(got.to_numpy() - want.to_numpy())) / scale
        assert err < 3e-4, (xq_mode, err)

    def test_unsupported_configs_rejected(self):
        # round-4: T % D != 0 pads taps and IS supported now
        assert pallas_supported(3, 64)
        # round-2 stacked layout: D in {1, 2} ARE supported now
        assert pallas_supported(2, 64)
        assert pallas_supported(1, 64)
        # genuinely unfusable: taps outrun the 128-coarse-column halo
        assert not pallas_supported(1, 40_000)
        x = _planar(50_000)
        kernel = make_complex_tap_bank(np.ones(40_000, np.float32), [0.0],
                                       FS)
        with pytest.raises(ValueError):
            mix_fir_decimate_bank_pallas(x, kernel, 1, interpret=True)

    def test_impl_pallas_dispatch(self):
        """ops.channelize impl='pallas' routes through the kernel."""
        x = _planar(2048)
        taps = RNG.standard_normal(64).astype(np.float32)
        kernel = make_complex_tap_bank(taps, [10_000.0], FS)
        a = mix_fir_decimate_bank(x, kernel, 4, impl="xla")
        # interpret path not reachable through impl; compare pallas
        # interpret directly for CPU-hermetic testing
        b = mix_fir_decimate_bank_pallas(x, kernel, 4, interpret=True)
        scale = np.max(np.abs(a.to_numpy())) + 1e-9
        assert np.max(np.abs(a.to_numpy() - b.to_numpy())) / scale < 3e-4


class TestFusedFmChain:
    def _models(self, nch=4, decimation=4, nt=64):
        from gsdr_tpu.pipelines import FmChannelizer

        def lowpass(nt, cf):
            n = np.arange(nt) - (nt - 1) / 2.0
            h = np.sinc(2 * cf * n) * np.hamming(nt)
            return tuple((h / h.sum()).astype(np.float32).tolist())

        m = FmChannelizer(
            sample_rate=FS, tuning_frequency=0.0,
            channel_frequencies=tuple(
                100_000.0 + 61_000.0 * i for i in range(nch)),
            frequency_deviation=75_000.0, decimation=decimation,
            low_pass_taps=lowpass(nt, min(0.04, 0.4 / decimation)),
        )
        import dataclasses as dc
        return m, dc.replace(m, impl="pallas")

    @staticmethod
    def _fm_rf(model, n, seed=0):
        """Proper FM carriers on the model's channels: keeps discriminator
        phase increments well away from the atan2 +-pi branch cut, where
        two correct implementations may legitimately differ by 2*pi (noise
        input puts random samples exactly on the cut)."""
        r = np.random.default_rng(seed)
        t = np.arange(n) / model.sample_rate
        sig = np.zeros(n, np.complex128)
        for k, f in enumerate(model.channel_frequencies):
            msg = np.sin(2 * np.pi * (700.0 + 400.0 * k) * t + r.uniform(0, 6))
            phase = 2 * np.pi * f * t + 0.3 * msg
            sig += (0.5 / len(model.channel_frequencies)) * np.exp(1j * phase)
        return ComplexArray.from_complex(sig.astype(np.complex64))

    def test_matches_unfused_with_state_continuation(self):
        m_xla, m_pal = self._models()
        rf = self._fm_rf(m_xla, 8192)
        st_x, st_p = m_xla.init(), m_pal.init()
        # skip the zero-primed warmup + de-emphasis settle region in block
        # 0: the first filtered sample is near-zero there, its phase is
        # arbitrary, and an atan2 branch flip between two correct
        # implementations injects a decaying (|a|~0.95) transient.
        for blk, skip in ((0, 256), (1, 0)):
            part = rf[..., blk * 4096:(blk + 1) * 4096]
            st_x, y_x = m_xla.step(st_x, part)
            st_p, y_p = m_pal.step(st_p, part)
            y_x, y_p = np.asarray(y_x), np.asarray(y_p)
            scale = np.max(np.abs(y_x))
            assert np.max(
                np.abs(y_x[:, skip:] - y_p[:, skip:])) / scale < 2e-3, blk
        # state pytrees interchangeable: continue the fused stream with
        # the unfused step
        st_mixed = (st_p[0], st_p[1], st_p[2], st_p[3])
        _, y_cont = m_xla.step(st_mixed, rf[..., :4096])
        _, y_ref = m_xla.step(st_x, rf[..., :4096])
        scale = np.max(np.abs(np.asarray(y_ref)))
        assert np.max(
            np.abs(np.asarray(y_cont) - np.asarray(y_ref))) / scale < 5e-3

    def test_fast_precision_grade(self):
        """precision='bf16x2' on the model config: one fewer MXU pass and
        a bf16 window scratch; audio within bf16-signal tolerance."""
        import dataclasses as dc
        m_xla, m_pal = self._models()
        m_fast = dc.replace(m_pal, precision="bf16x2")
        rf = self._fm_rf(m_xla, 4096)
        _, y_ref = m_xla.step(m_xla.init(), rf)
        _, y_fast = m_fast.step(m_fast.init(), rf)
        y_ref, y_fast = np.asarray(y_ref), np.asarray(y_fast)
        scale = np.max(np.abs(y_ref))
        assert np.max(np.abs(y_ref[:, 256:] - y_fast[:, 256:])) / scale \
            < 2e-2

    @pytest.mark.parametrize("nch", [1, 3, 8, 20])
    def test_channel_count_coverage(self, nch):
        """Geometry sweep over channel counts (incl. non-multiples of the
        8-sublane padding): fused output matches the XLA chain. Guards
        the _pick_r / padding / VMEM-cap interplay, which is shape-
        dependent."""
        m_xla, m_pal = self._models(nch=nch)
        rf = self._fm_rf(m_xla, 8192)
        _, y_x = m_xla.step(m_xla.init(), rf)
        _, y_p = m_pal.step(m_pal.init(), rf)
        y_x, y_p = np.asarray(y_x), np.asarray(y_p)
        assert y_p.shape == (nch, 2048)
        scale = np.max(np.abs(y_x))
        assert np.max(np.abs(y_x[:, 256:] - y_p[:, 256:])) / scale < 2e-3

    @pytest.mark.parametrize("decimation", [1, 2, 8])
    def test_decimation_coverage(self, decimation):
        """Round-2 gap closure: D in {1, 2} run fused (round 1 required
        2D % 8 == 0, /root/reference/src/fir.cu:85-93 has a dedicated
        D == 1 path); D == 8 exercises R == 1-adjacent geometry."""
        m_xla, m_pal = self._models(nch=4, decimation=decimation)
        n = 8192
        rf = self._fm_rf(m_xla, n, seed=decimation)
        st_x, st_p = m_xla.init(), m_pal.init()
        for blk, skip in ((0, 512 // decimation + 8), (1, 0)):
            part = rf[..., blk * (n // 2):(blk + 1) * (n // 2)]
            st_x, y_x = m_xla.step(st_x, part)
            st_p, y_p = m_pal.step(st_p, part)
            y_x, y_p = np.asarray(y_x), np.asarray(y_p)
            scale = np.max(np.abs(y_x))
            assert np.max(
                np.abs(y_x[:, skip:] - y_p[:, skip:])) / scale < 2e-3, \
                (decimation, blk)

    def test_odd_tap_count_fused(self):
        """Round-4 gap closure: T % D != 0 runs fused via trailing-zero
        tap padding (output-identical) with exact streaming-state
        continuation — the reference accepts any tap count
        (include/gsdr/fir.h:30-68)."""
        m_xla, m_pal = self._models(nch=4, decimation=4, nt=65)
        rf = self._fm_rf(m_xla, 8192)
        st_x, st_p = m_xla.init(), m_pal.init()
        for blk, skip in ((0, 256), (1, 0)):
            part = rf[..., blk * 4096:(blk + 1) * 4096]
            st_x, y_x = m_xla.step(st_x, part)
            st_p, y_p = m_pal.step(st_p, part)
            y_x, y_p = np.asarray(y_x), np.asarray(y_p)
            scale = np.max(np.abs(y_x))
            assert np.max(
                np.abs(y_x[:, skip:] - y_p[:, skip:])) / scale < 2e-3, blk

    def test_ntc_mode_bit_exact(self):
        """xq_mode='ntc' ([re|im] lane-concat done once in XLA instead of
        per grid step in VMEM) must be bit-exact vs 'nt' — same G' column
        order, same windows (round 4; measured a perf wash on HW, kept as
        the single-operand layout option)."""
        from gsdr_tpu.kernels import fm_chain_pallas as fcp
        from gsdr_tpu.ops.channelize import make_complex_tap_bank
        from gsdr_tpu.utils.phase import phase_digit_table

        t, d = 64, 4
        n_buf = 131072 + t - 1
        rng = np.random.default_rng(5)
        taps = np.hamming(t) / np.hamming(t).sum()
        shifts = [12_345.0, -5_000.0]
        bank = make_complex_tap_bank(taps, shifts, FS)
        buf = ComplexArray(
            jnp.asarray(rng.standard_normal(n_buf), jnp.float32),
            jnp.asarray(rng.standard_normal(n_buf), jnp.float32))
        lo = phase_digit_table(shifts, FS)
        cf = ComplexArray(jnp.zeros((2, 1), jnp.float32),
                          jnp.zeros((2, 1), jnp.float32))
        outs = {}
        for mode in ("nt", "ntc"):
            plan = fcp.fm_chain_plan(bank, d, 1.0, (1.0, 0.4), (1.0, -0.5),
                                     n_buf, shifts, FS, xq_mode=mode,
                                     _force_bn=1024)
            au, f, z = fcp.fm_chain_apply(
                plan, buf, lo, jnp.asarray(0, jnp.int32), cf,
                jnp.zeros((2, 1), jnp.float32))
            outs[mode] = (np.asarray(au), np.asarray(f.re), np.asarray(z))
        for a, b in zip(outs["nt"], outs["ntc"]):
            assert np.array_equal(a, b)

    def test_n_sub_split_parity(self):
        """The intra-step overlap split (n_sub sub-blocks, all window dots
        issued before any VPU stage) must be numerically inert: exported
        streaming carries EXACT vs n_sub=1 (same association), audio
        within 1 ulp (the de-emphasis lane scan re-associates at sub
        boundaries). Covers a pad-and-mask (non-grid-aligned) length, a
        second streaming step from the carried state, and a multi-grid-
        step geometry. Uses _force_bn: at test-sized inputs the block
        chooser caps bn at 128, which silently demotes every n_sub>1 to 1
        (a committed earlier version of this test was vacuous that way —
        assert plan.n_sub to prove the split actually ran)."""
        from gsdr_tpu.kernels import fm_chain_pallas as fcp
        from gsdr_tpu.ops.channelize import make_complex_tap_bank
        from gsdr_tpu.ops.fm import fm_demod_gain
        from gsdr_tpu.pipelines.fm_radio import fm_deemphasis_coeffs
        from gsdr_tpu.utils.phase import phase_digit_table

        t, d, c = 32, 4, 4
        n_buf = 6000 * d + t - 1   # m=6000: pads and masks to the grid
        rng = np.random.default_rng(0)
        taps = (np.hamming(t) / np.hamming(t).sum()).astype(np.float64)
        shifts = [1000.0 * (k + 1) for k in range(c)]
        bank = make_complex_tap_bank(taps, shifts, FS)
        lo = phase_digit_table(shifts, FS)
        gain = fm_demod_gain(FS, 75000.0)
        b, a = fm_deemphasis_coeffs(75e-6, FS / d)
        buf = ComplexArray(
            jnp.asarray(rng.standard_normal(n_buf), jnp.float32),
            jnp.asarray(rng.standard_normal(n_buf), jnp.float32))

        def run(bn, ns):
            plan = fcp.fm_chain_plan(bank, d, gain, b, a, n_buf, shifts,
                                     FS, n_sub=ns, _force_bn=bn)
            assert plan.n_sub == ns and plan.bn == bn, (plan.bn,
                                                       plan.n_sub)
            cf = ComplexArray(jnp.zeros((c, 1), jnp.float32),
                              jnp.zeros((c, 1), jnp.float32))
            au, f1, z1 = fcp.fm_chain_apply(
                plan, buf, lo, jnp.asarray(5, jnp.int32), cf,
                jnp.zeros((c, 1), jnp.float32))
            au2, _, z2 = fcp.fm_chain_apply(
                plan, buf, lo,
                jnp.asarray(5 + n_buf - (t - 1), jnp.int32), f1, z1)
            return tuple(np.asarray(v) for v in
                         (au, f1.re, f1.im, z1, au2, z2))

        # bn=512: one padded grid step (n_j=375), subs 2/4 real;
        # bn=256/ns=2: two grid steps — cross-grid-step carry under split
        for bn, base_ns, split_ns in ((512, 1, (2, 4)), (256, 1, (2,))):
            ref = run(bn, base_ns)
            for ns in split_ns:
                got = run(bn, ns)
                errs = [np.max(np.abs(x - y)) for x, y in zip(ref, got)]
                assert errs[0] < 1e-5 and errs[4] < 1e-5, (bn, ns, errs)
                assert errs[1] == errs[2] == errs[3] == errs[5] == 0.0, \
                    (bn, ns, errs)

    def test_r_stack_override_parity(self):
        """The r_stack geometry override (smaller R shrinks the Toeplitz
        span K, trading MXU FLOPs against W-build lane width — a tuning
        knob for MXU-bound channel counts) must compute the same chain:
        audio within re-association tolerance of the default geometry and
        carries matching the carried-state contract across a streaming
        step."""
        from gsdr_tpu.kernels import fm_chain_pallas as fcp
        from gsdr_tpu.ops.channelize import make_complex_tap_bank
        from gsdr_tpu.ops.fm import fm_demod_gain
        from gsdr_tpu.pipelines.fm_radio import fm_deemphasis_coeffs
        from gsdr_tpu.utils.phase import phase_digit_table

        t, d, c = 32, 4, 4
        n_buf = 6000 * d + t - 1
        rng = np.random.default_rng(1)
        taps = (np.hamming(t) / np.hamming(t).sum()).astype(np.float64)
        shifts = [1000.0 * (k + 1) for k in range(c)]
        bank = make_complex_tap_bank(taps, shifts, FS)
        lo = phase_digit_table(shifts, FS)
        gain = fm_demod_gain(FS, 75000.0)
        b, a = fm_deemphasis_coeffs(75e-6, FS / d)
        buf = ComplexArray(
            jnp.asarray(rng.standard_normal(n_buf), jnp.float32),
            jnp.asarray(rng.standard_normal(n_buf), jnp.float32))

        def run(r):
            plan = fcp.fm_chain_plan(bank, d, gain, b, a, n_buf, shifts,
                                     FS, r_stack=r)
            if r is not None:
                assert plan.r_stack == r, plan.r_stack
            cf = ComplexArray(jnp.zeros((c, 1), jnp.float32),
                              jnp.zeros((c, 1), jnp.float32))
            au, f1, z1 = fcp.fm_chain_apply(
                plan, buf, lo, jnp.asarray(5, jnp.int32), cf,
                jnp.zeros((c, 1), jnp.float32))
            au2, _, z2 = fcp.fm_chain_apply(
                plan, buf, lo,
                jnp.asarray(5 + n_buf - (t - 1), jnp.int32), f1, z1)
            return tuple(np.asarray(v) for v in
                         (au, f1.re, f1.im, z1, au2, z2))

        ref = run(None)   # default geometry (R=16 at D=4)
        for r in (4, 8):
            got = run(r)
            errs = [np.max(np.abs(x - y)) for x, y in zip(ref, got)]
            # different R re-associates the FIR dot and the de-emphasis
            # (J, r) decomposition — close, not bit-equal
            assert max(errs) < 5e-5, (r, errs)

        import pytest
        with pytest.raises(ValueError):
            fcp.fm_chain_plan(bank, d, gain, b, a, n_buf, shifts, FS,
                              r_stack=3)

    def test_n_sub_explicit_demotion_warns(self):
        """An explicit n_sub the chosen bn cannot honor must warn (a
        silent demotion once made an A/B ladder — and this file's own
        parity test — measure n_sub=1 against itself)."""
        import warnings as w
        from gsdr_tpu.kernels import fm_chain_pallas as fcp
        from gsdr_tpu.ops.channelize import make_complex_tap_bank
        bank = make_complex_tap_bank(
            (np.hamming(32) / np.hamming(32).sum()), [1000.0], FS)
        with w.catch_warnings(record=True) as rec:
            w.simplefilter("always")
            plan = fcp.fm_chain_plan(bank, 4, 2.0, (0.1, 0.1),
                                     (1.0, -0.8), 4096 + 31, [1000.0],
                                     FS, n_sub=4)
        assert plan.n_sub == 1  # bn=128 cannot split lane-aligned
        assert any("n_sub=4" in str(r.message) for r in rec), \
            [str(r.message) for r in rec]

    def test_nonzero_first_sample_index(self):
        m_xla, m_pal = self._models(nch=2)
        rf = self._fm_rf(m_xla, 4096, seed=3)
        st_x = m_xla.init(first_sample_index=123_456)
        st_p = m_pal.init(first_sample_index=123_456)
        _, y_x = m_xla.step(st_x, rf)
        _, y_p = m_pal.step(st_p, rf)
        y_x, y_p = np.asarray(y_x), np.asarray(y_p)
        scale = np.max(np.abs(y_x))
        # skip warmup/settle (see test above)
        assert np.max(np.abs(y_x[:, 256:] - y_p[:, 256:])) / scale < 2e-3


class TestPfbFusedChain:
    """Round-4 PFB front: polyphase fold + DFT-bank dot replacing the
    Toeplitz window contraction for uniform channel grids, sharing the
    whole VPU back-end (rotor/disc/de-emphasis, carries, pad-and-mask)
    with the dense fused kernel."""

    FS = 1_024_000.0

    def _model(self, k=16, d=4, t=128, impl="pfb_pallas"):
        from gsdr_tpu.pipelines import FmChannelizer

        def lp(nt, cf):
            n = np.arange(nt) - (nt - 1) / 2.0
            h = np.sinc(2 * cf * n) * np.hamming(nt)
            return tuple((h / h.sum()).astype(np.float32).tolist())

        return FmChannelizer(
            sample_rate=self.FS, tuning_frequency=0.0,
            channel_frequencies=tuple(-self.FS / 2 + (self.FS / k) * i
                                      for i in range(k)),
            frequency_deviation=75_000.0, decimation=d,
            low_pass_taps=lp(t, 0.4 / k), impl=impl)

    def _rf(self, model, n, seed=0):
        r = np.random.default_rng(seed)
        tt = np.arange(n) / model.sample_rate
        sig = np.zeros(n, np.complex128)
        for c, f in enumerate(model.channel_frequencies):
            msg = np.sin(2 * np.pi * (500.0 + 37.0 * c) * tt
                         + r.uniform(0, 6))
            sig += 0.03 * np.exp(1j * (2 * np.pi * f * tt + 0.3 * msg))
        return ComplexArray.from_complex(sig.astype(np.complex64))

    @pytest.mark.parametrize("d,t", [(4, 128), (16, 128), (8, 65)])
    def test_matches_xla_with_state_continuation(self, d, t):
        import dataclasses as dc

        m_p = self._model(k=16, d=d, t=t)
        m_x = dc.replace(m_p, impl="xla")
        rf = self._rf(m_x, 16384)
        st_x, st_p = m_x.init(), m_p.init()
        for blk, skip in ((0, 512 // d + 8), (1, 0)):
            part = rf[..., blk * 8192:(blk + 1) * 8192]
            st_x, y_x = m_x.step(st_x, part)
            st_p, y_p = m_p.step(st_p, part)
            y_x, y_p = np.asarray(y_x), np.asarray(y_p)
            scale = np.max(np.abs(y_x))
            assert np.max(
                np.abs(y_x[:, skip:] - y_p[:, skip:])) / scale < 2e-3, \
                (d, t, blk)
        np.testing.assert_allclose(st_p[2].to_numpy(), st_x[2].to_numpy(),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(st_p[3]), np.asarray(st_x[3]),
                                   atol=5e-5)

    def test_wide_grid_p8_matches_xla(self):
        """K=64 / D=8 (P=8): the phase count the round-5 win rule newly
        auto-dispatches, at the wide-grid K the suite never covered
        (every channel excited — silent-channel discriminator
        comparisons are ill-posed, CLAUDE.md testing note)."""
        import dataclasses as dc

        m_p = self._model(k=64, d=8, t=512)
        m_x = dc.replace(m_p, impl="xla")
        rf = self._rf(m_x, 16384, seed=5)
        _, y_x = m_x.step(m_x.init(), rf)
        _, y_p = m_p.step(m_p.init(), rf)
        y_x, y_p = np.asarray(y_x), np.asarray(y_p)
        scale = np.max(np.abs(y_x))
        skip = 512 // 8 + 192
        assert np.max(np.abs(y_x[:, skip:] - y_p[:, skip:])) / scale < 2e-3

    def test_k128_grid_matches_xla(self):
        """K=128 critical (2K = 256-lane DFT bank): the widest grid class,
        measured 2.7x faster than dense in round 5 — every channel
        excited, parity vs the XLA chain."""
        import dataclasses as dc

        m_p = self._model(k=128, d=128, t=1024)
        m_x = dc.replace(m_p, impl="xla")
        rf = self._rf(m_x, 32768, seed=9)
        _, y_x = m_x.step(m_x.init(), rf)
        _, y_p = m_p.step(m_p.init(), rf)
        y_x, y_p = np.asarray(y_x), np.asarray(y_p)
        scale = np.max(np.abs(y_x))
        skip = 1024 // 128 + 64
        assert np.max(np.abs(y_x[:, skip:] - y_p[:, skip:])) / scale < 2e-3

    def test_k256_grid_matches_xla(self):
        """K=256 critical, T=2048 (2K = 512-lane DFT bank): the round-4
        'T < K loses structurally' verdict applies only to SHORT
        filters — at production T = 8K the PFB front measured 3.5x
        faster than dense (round 5). Parity with every channel excited.

        tau=300us: at D=256 the audio rate is Fs/256 = 4 kHz and the
        US 75-us de-emphasis sits past the bilinear prewarp validity
        limit tau > 1/(pi*f_audio) ~ 80 us (tan argument > pi/2 -> an
        unstable pole; BOTH implementations diverge identically-ish).
        A real 256-channel receiver runs a wider Fs; the kernel
        geometry under test is independent of tau."""
        import dataclasses as dc

        m_p = dc.replace(self._model(k=256, d=256, t=2048),
                         deemphasis_tau=300e-6)
        m_x = dc.replace(m_p, impl="xla")
        rf = self._rf(m_x, 65536, seed=11)
        _, y_x = m_x.step(m_x.init(), rf)
        _, y_p = m_p.step(m_p.init(), rf)
        y_x, y_p = np.asarray(y_x), np.asarray(y_p)
        scale = np.max(np.abs(y_x))
        skip = 2048 // 256 + 96
        assert np.max(np.abs(y_x[:, skip:] - y_p[:, skip:])) / scale < 2e-3

    def test_interchangeable_with_dense_fused(self):
        """The PFB-fronted and Toeplitz-fronted fused kernels share the
        state pytree: a stream may switch between them mid-flight."""
        import dataclasses as dc

        m_p = self._model(k=16, d=4, t=128)
        m_d = dc.replace(m_p, impl="pallas")
        rf = self._rf(m_p, 8192, seed=3)
        st = m_p.init()
        st, _ = m_p.step(st, rf)
        st, y2 = m_d.step(st, rf)      # dense fused continues the stream
        st_r = m_p.init()
        st_r, _ = m_d.step(st_r, rf)
        st_r, y_ref = m_d.step(st_r, rf)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y_ref),
                                   rtol=2e-3, atol=2e-4)

    def test_n_sub_split_and_pad_mask(self):
        """Plan-level: the overlap split and a non-grid-aligned M must be
        numerically inert for the PFB front too (carries exact vs
        n_sub=1, audio <= 1 ulp re-association)."""
        from gsdr_tpu.kernels import fm_chain_pallas as fcp
        from gsdr_tpu.utils.phase import phase_digit_table

        k, d, t, c = 16, 4, 128, 16
        bins = list(range(c))
        shifts = [b * self.FS / k for b in bins]
        n_buf = 100_000 + t - 1          # M=25000: off the P*128 grid
        rng = np.random.default_rng(7)
        buf = ComplexArray(
            jnp.asarray(rng.standard_normal(n_buf), jnp.float32),
            jnp.asarray(rng.standard_normal(n_buf), jnp.float32))
        lo = phase_digit_table(shifts, self.FS)
        cf = ComplexArray(jnp.zeros((c, 1), jnp.float32),
                          jnp.zeros((c, 1), jnp.float32))
        outs = {}
        for ns in (1, 2):
            plan = fcp.pfb_fm_chain_plan(
                np.hamming(t) / np.hamming(t).sum(), d, 2.0,
                (0.3, 0.3), (1.0, -0.4), n_buf, shifts, self.FS, bins, k,
                n_sub=ns, _force_bn=256)
            assert plan.n_sub == ns and plan.front == "pfb"
            au, f2, z2 = fcp.fm_chain_apply(
                plan, buf, lo, jnp.asarray(11, jnp.int32), cf,
                jnp.zeros((c, 1), jnp.float32))
            assert au.shape == (c, 25_000)
            outs[ns] = (np.asarray(au), np.asarray(f2.re),
                        np.asarray(f2.im), np.asarray(z2))
        for a, b in zip(outs[1][1:], outs[2][1:]):
            assert np.array_equal(a, b)          # carries bit-exact
        assert np.allclose(outs[1][0], outs[2][0], atol=1e-5)


class TestAblateCuts:
    """Round-5 measurement hooks: ablate='grid' (pure grid/DMA probe —
    the direct overhead measurement VERDICT #3 asked for) and the PFB
    front's ablate='dot' (VERDICT #1 stage accounting) must trace and run
    on both fronts; 'full' must equal the default exactly."""

    FS = 1_024_000.0

    def _apply_args(self, c, t, n_buf, seed=0):
        from gsdr_tpu.utils.phase import phase_digit_table

        rng = np.random.default_rng(seed)
        buf = ComplexArray(
            jnp.asarray(rng.standard_normal(n_buf), jnp.float32),
            jnp.asarray(rng.standard_normal(n_buf), jnp.float32))
        shifts = [b * self.FS / 16 for b in range(c)]
        lo = phase_digit_table(shifts, self.FS)
        cf = ComplexArray(jnp.zeros((c, 1), jnp.float32),
                          jnp.zeros((c, 1), jnp.float32))
        return buf, shifts, lo, cf

    @pytest.mark.parametrize("front", ["toeplitz", "pfb"])
    def test_cuts_run_and_full_matches_default(self, front):
        from gsdr_tpu.kernels import fm_chain_pallas as fcp

        c, d = 8, 4
        t = 128 if front == "pfb" else 32
        n_buf = 8192 + t - 1
        buf, shifts, lo, cf = self._apply_args(c, t, n_buf)
        taps = np.hamming(t) / np.hamming(t).sum()
        if front == "pfb":
            plan = fcp.pfb_fm_chain_plan(
                taps, d, 2.0, (0.3, 0.3), (1.0, -0.4), n_buf, shifts,
                self.FS, list(range(c)), 16)
        else:
            from gsdr_tpu.ops.channelize import make_complex_tap_bank

            plan = fcp.fm_chain_plan(
                make_complex_tap_bank(taps, shifts, self.FS), d, 2.0,
                (0.3, 0.3), (1.0, -0.4), n_buf, shifts, self.FS)
        zi = jnp.zeros((c, 1), jnp.float32)
        want, f_w, z_w = fcp.fm_chain_apply(
            plan, buf, lo, jnp.asarray(3, jnp.int32), cf, zi)
        m = (n_buf - t) // d + 1
        for ab in ("grid", "dot", "rotor", "disc", "full"):
            au, f2, z2 = fcp.fm_chain_apply(
                plan, buf, lo, jnp.asarray(3, jnp.int32), cf, zi,
                ablate=ab)
            assert au.shape == (c, m), (front, ab)
        np.testing.assert_array_equal(np.asarray(au), np.asarray(want))
        np.testing.assert_array_equal(np.asarray(f2.re), np.asarray(f_w.re))
        np.testing.assert_array_equal(np.asarray(z2), np.asarray(z_w))


class TestFusedChainFuzz:
    """Randomized geometry sweep (seeded): the fused FM chain must match
    the XLA chain with exact state continuation across arbitrary
    (C, T, D, N) combinations — guards the _pick_r / tap-pad / pad-and-
    mask / VMEM-cap interplay, which is shape-dependent and has bitten
    at specific shapes twice (rounds 2-3)."""

    @pytest.mark.parametrize("seed", range(6))
    def test_random_config_parity(self, seed):
        from gsdr_tpu.pipelines import FmChannelizer

        r = np.random.default_rng(100 + seed)
        d = int(r.choice([1, 2, 4, 8, 16]))
        t = int(r.integers(8, 131))
        nch = int(r.integers(1, 12))
        n = d * int(r.integers(192, 1200))

        def lowpass(nt, cf):
            nn = np.arange(nt) - (nt - 1) / 2.0
            h = np.sinc(2 * cf * nn) * np.hamming(nt)
            return tuple((h / h.sum()).astype(np.float32).tolist())

        m = FmChannelizer(
            sample_rate=FS, tuning_frequency=0.0,
            channel_frequencies=tuple(
                30_000.0 + 41_000.0 * i for i in range(nch)),
            frequency_deviation=75_000.0, decimation=d,
            low_pass_taps=lowpass(t, min(0.04, 0.35 / d)), impl="xla")
        import dataclasses as dc
        mp = dc.replace(m, impl="pallas")
        rf = TestFusedFmChain._fm_rf(m, 2 * n, seed=seed)
        st_x, st_p = m.init(), mp.init()
        # block-0 skip: the zero-primed warmup can flip an atan2 branch,
        # injecting a de-emphasis transient that decays as |a1|^j — skip
        # until it falls ~4 orders below the signal (pole depends on the
        # audio rate, so the length is d-dependent)
        _, (one, a1) = m._deemph()
        decay = int(np.ceil(np.log(1e4) / -np.log(min(abs(a1), 0.999))))
        skip0 = min(n // d - 64, t // d + decay + 64)
        for blk, skip in ((0, skip0), (1, 0)):
            part = rf[..., blk * n:(blk + 1) * n]
            st_x, y_x = m.step(st_x, part)
            st_p, y_p = mp.step(st_p, part)
            y_x, y_p = np.asarray(y_x), np.asarray(y_p)
            assert y_p.shape == (nch, n // d)
            scale = np.max(np.abs(y_x)) + 1e-9
            assert np.max(
                np.abs(y_x[:, skip:] - y_p[:, skip:])) / scale < 3e-3, \
                (seed, d, t, nch, n, blk)


class TestPfbChainFuzz:
    """Seeded random ON-GRID geometry sweep for the PFB-fronted fused FM
    chain (the dense fuzz above cannot reach this front): random
    (K, D | K, Q, C) with every channel excited, pfb_pallas vs the XLA
    chain with exact state continuation — guards the fold/roll span,
    DFT-bank slicing, phasor tables and pad-and-mask interplay across
    the round-5-extended dispatch region (P up to 8, odd Q, C < K)."""

    @pytest.mark.parametrize("seed", range(4))
    def test_random_grid_parity(self, seed):
        import dataclasses as dc

        from gsdr_tpu.pipelines import FmChannelizer

        r = np.random.default_rng(500 + seed)
        k = int(r.choice([8, 16, 32, 64]))
        p = int(r.choice([1, 2, 4, 8]))
        if k // p < 1 or k % p != 0:
            p = 1
        d = k // p
        q = int(r.integers(4, 10))
        t = q * k - int(r.integers(0, k // 2))   # ragged fold tail too
        nch = int(r.integers(max(1, k // 2), k + 1))  # C >= K/2 (rule)
        fs = 1_024_000.0
        n = d * int(r.integers(600, 1600))

        def lowpass(nt, cf):
            nn = np.arange(nt) - (nt - 1) / 2.0
            h = np.sinc(2 * cf * nn) * np.hamming(nt)
            return tuple((h / h.sum()).astype(np.float32).tolist())

        m = FmChannelizer(
            sample_rate=fs, tuning_frequency=0.0,
            channel_frequencies=tuple(
                -fs / 2 + (fs / k) * i for i in range(nch)),
            frequency_deviation=75_000.0, decimation=d,
            low_pass_taps=lowpass(t, 0.4 / k), impl="xla")
        mp = dc.replace(m, impl="pfb_pallas")
        # every channel excited (silent-channel discriminator comparisons
        # are ill-posed — CLAUDE.md testing note / round-5 incident)
        tt = np.arange(2 * n) / fs
        sig = np.zeros(2 * n, np.complex128)
        for c, f in enumerate(m.channel_frequencies):
            msg = np.sin(2 * np.pi * (300.0 + 29.0 * c) * tt
                         + r.uniform(0, 6))
            sig += (0.5 / nch) * np.exp(
                1j * (2 * np.pi * f * tt + 0.3 * msg))
        rf = ComplexArray.from_complex(sig.astype(np.complex64))
        st_x, st_p = m.init(), mp.init()
        _, (one, a1) = m._deemph()
        decay = int(np.ceil(np.log(1e4) / -np.log(min(abs(a1), 0.999))))
        skip0 = min(n // d - 64, t // d + decay + 64)
        for blk, skip in ((0, max(skip0, 1)), (1, 0)):
            part = rf[..., blk * n:(blk + 1) * n]
            st_x, y_x = m.step(st_x, part)
            st_p, y_p = mp.step(st_p, part)
            y_x, y_p = np.asarray(y_x), np.asarray(y_p)
            assert y_p.shape == (nch, n // d)
            scale = np.max(np.abs(y_x)) + 1e-9
            assert np.max(
                np.abs(y_x[:, skip:] - y_p[:, skip:])) / scale < 3e-3, \
                (seed, k, d, t, nch, n, blk)


class TestKernelMath:
    def test_atan2_poly_accuracy(self):
        from gsdr_tpu.kernels.kmath import atan2_poly
        y = RNG.standard_normal(10000).astype(np.float32) * 3
        x = RNG.standard_normal(10000).astype(np.float32) * 3
        got = np.asarray(atan2_poly(jnp.asarray(y), jnp.asarray(x)))
        want = np.arctan2(y, x)
        assert np.max(np.abs(got - want)) < 3e-6

    def test_atan2_poly_order7_accuracy(self):
        """The bf16x2 fast grade's 7th-order fit: ~8.2e-5 rad minimax
        bound (its dot quantization error ~7e-4 dominates)."""
        from gsdr_tpu.kernels.kmath import atan2_poly
        y = RNG.standard_normal(10000).astype(np.float32) * 3
        x = RNG.standard_normal(10000).astype(np.float32) * 3
        got = np.asarray(atan2_poly(jnp.asarray(y), jnp.asarray(x),
                                    order=7))
        want = np.arctan2(y, x)
        assert np.max(np.abs(got - want)) < 1e-4

    def test_atan2_poly_edges(self):
        from gsdr_tpu.kernels.kmath import atan2_poly
        pts = [(0.0, 0.0), (0.0, 1.0), (0.0, -1.0), (1.0, 0.0),
               (-1.0, 0.0), (1e-30, 1e-30)]
        for yv, xv in pts:
            got = float(atan2_poly(jnp.float32(yv), jnp.float32(xv)))
            want = float(np.arctan2(np.float32(yv), np.float32(xv)))
            assert abs(got - want) < 3e-6, (yv, xv, got, want)


class TestFusedAmChain:
    def test_matches_unfused(self):
        import dataclasses as dc
        from gsdr_tpu.pipelines import AmReceiver

        def lowpass(nt, cf):
            n = np.arange(nt) - (nt - 1) / 2.0
            h = np.sinc(2 * cf * n) * np.hamming(nt)
            return tuple((h / h.sum()).astype(np.float32).tolist())

        m = AmReceiver(sample_rate=FS, tuning_frequency=0.0,
                       channel_frequencies=(120_000.0, -50_000.0),
                       decimation=4, low_pass_taps=lowpass(64, 0.04))
        mp = dc.replace(m, impl="pallas")
        z = 0.3 * (RNG.standard_normal(8192)
                   + 1j * RNG.standard_normal(8192))
        rf = ComplexArray.from_complex(z.astype(np.complex64))
        st1 = m.init()
        st2 = mp.init()
        for blk in range(2):
            part = rf[..., blk * 4096:(blk + 1) * 4096]
            st1, y1 = m.step(st1, part)
            st2, y2 = mp.step(st2, part)
            err = np.max(np.abs(np.asarray(y1) - np.asarray(y2)))
            assert err < 2e-3, (blk, err)
        # envelope is magnitude-only, so unlike FM there is no branch-cut
        # sensitivity and noise input is a fair comparison

    def test_odd_tap_count_fused(self):
        """Round-4: T % D != 0 runs the fused AM chain (trailing-zero tap
        pad; the AM chain is stateless past the window so only the
        envelope needs to match)."""
        import dataclasses as dc
        from gsdr_tpu.pipelines import AmReceiver

        def lowpass(nt, cf):
            n = np.arange(nt) - (nt - 1) / 2.0
            h = np.sinc(2 * cf * n) * np.hamming(nt)
            return tuple((h / h.sum()).astype(np.float32).tolist())

        m = AmReceiver(sample_rate=FS, tuning_frequency=0.0,
                       channel_frequencies=(120_000.0, -50_000.0),
                       decimation=4, low_pass_taps=lowpass(65, 0.04))
        mp = dc.replace(m, impl="pallas")
        z = 0.3 * (RNG.standard_normal(4096)
                   + 1j * RNG.standard_normal(4096))
        rf = ComplexArray.from_complex(z.astype(np.complex64))
        _, y1 = m.step(m.init(), rf)
        _, y2 = mp.step(mp.init(), rf)
        assert np.asarray(y1).shape == np.asarray(y2).shape
        assert np.max(np.abs(np.asarray(y1) - np.asarray(y2))) < 2e-3

    def test_pfb_front_matches_xla(self):
        """Round-4 AM PFB front (uniform grid): fold + DFT-bank dot +
        envelope matches the XLA chain; the AM envelope has no branch-cut
        sensitivity so noise input is fair."""
        import dataclasses as dc
        from gsdr_tpu.pipelines import AmReceiver

        fs = 1_024_000.0
        k = 16

        def lowpass(nt, cf):
            n = np.arange(nt) - (nt - 1) / 2.0
            h = np.sinc(2 * cf * n) * np.hamming(nt)
            return tuple((h / h.sum()).astype(np.float32).tolist())

        for d, t in ((4, 128), (16, 128), (8, 65)):
            m = AmReceiver(sample_rate=fs, tuning_frequency=0.0,
                           channel_frequencies=tuple(
                               -fs / 2 + (fs / k) * i for i in range(10)),
                           decimation=d, low_pass_taps=lowpass(t, 0.4 / k),
                           impl="xla")
            mp = dc.replace(m, impl="pfb_pallas")
            z = 0.3 * (RNG.standard_normal(8192)
                       + 1j * RNG.standard_normal(8192))
            rf = ComplexArray.from_complex(z.astype(np.complex64))
            st1, st2 = m.init(), mp.init()
            for blk in range(2):
                part = rf[..., blk * 4096:(blk + 1) * 4096]
                st1, y1 = m.step(st1, part)
                st2, y2 = mp.step(st2, part)
                err = np.max(np.abs(np.asarray(y1) - np.asarray(y2)))
                assert err < 2e-3, (d, t, blk, err)

    def test_n_sub_split_parity(self):
        """The AM kernel's overlap split must be bit-identical to the
        unsplit kernel (no cross-column state in AM — the sub-blocks
        compute disjoint columns of the same dots). Sized so bn=256
        genuinely splits (small shapes demote n_sub to 1 and would test
        nothing)."""
        from gsdr_tpu.kernels import fm_chain_pallas as fcp
        from gsdr_tpu.ops.channelize import make_complex_tap_bank

        t, d = 64, 4
        n_buf = 131072 + t - 1
        rng = np.random.default_rng(3)
        taps = (np.hamming(t) / np.hamming(t).sum())
        bank = make_complex_tap_bank(taps, [12_345.0], FS)
        buf = ComplexArray(
            jnp.asarray(rng.standard_normal(n_buf), jnp.float32),
            jnp.asarray(rng.standard_normal(n_buf), jnp.float32))
        outs = {}
        for ns in (1, 2):
            plan = fcp.am_chain_plan(bank, d, n_buf, n_sub=ns)
            assert plan.n_sub == ns, (plan.bn, plan.n_sub)
            outs[ns] = np.asarray(fcp.am_chain_apply(plan, buf))
        assert np.array_equal(outs[1], outs[2])

    def test_r_stack_override_parity(self):
        """Forcing a smaller stacking factor re-associates the window dot
        but must compute the same envelope."""
        from gsdr_tpu.kernels import fm_chain_pallas as fcp
        from gsdr_tpu.ops.channelize import make_complex_tap_bank

        t, d = 64, 4
        n_buf = 65536 + t - 1
        rng = np.random.default_rng(4)
        taps = (np.hamming(t) / np.hamming(t).sum())
        bank = make_complex_tap_bank(taps, [12_345.0], FS)
        buf = ComplexArray(
            jnp.asarray(rng.standard_normal(n_buf), jnp.float32),
            jnp.asarray(rng.standard_normal(n_buf), jnp.float32))
        ref = np.asarray(fcp.am_chain_apply(
            fcp.am_chain_plan(bank, d, n_buf), buf))
        plan8 = fcp.am_chain_plan(bank, d, n_buf, r_stack=8)
        assert plan8.r_stack == 8
        got = np.asarray(fcp.am_chain_apply(plan8, buf))
        assert np.max(np.abs(ref - got)) < 5e-5


class TestFusedAmChainPadding:
    def test_arbitrary_block_length(self):
        """AM is stateless past the filter window, so the fused kernel pads
        M to the stacking grid and slices — any block length works."""
        import dataclasses as dc
        from gsdr_tpu.pipelines import AmReceiver

        def lowpass(nt, cf):
            n = np.arange(nt) - (nt - 1) / 2.0
            h = np.sinc(2 * cf * n) * np.hamming(nt)
            return tuple((h / h.sum()).astype(np.float32).tolist())

        m = AmReceiver(sample_rate=FS, tuning_frequency=0.0,
                       channel_frequencies=(120_000.0,),
                       decimation=4, low_pass_taps=lowpass(64, 0.04),
                       impl="xla")
        mp = dc.replace(m, impl="pallas")
        z = 0.3 * (RNG.standard_normal(4100)
                   + 1j * RNG.standard_normal(4100))
        rf = ComplexArray.from_complex(z.astype(np.complex64))
        _, y1 = m.step(m.init(), rf)
        _, y2 = mp.step(mp.init(), rf)
        assert np.asarray(y2).shape == np.asarray(y1).shape == (1, 1025)
        assert np.max(np.abs(np.asarray(y1) - np.asarray(y2))) < 2e-3
