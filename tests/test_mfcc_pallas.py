"""Fused Pallas MFCC kernel: numerics parity with the slices path.

Runs in interpreter mode on CPU (the kernel itself targets TPU); the
reference is FeatureExtractor's GEMM/slices path, whose Kaldi fidelity
is pinned by tests/test_frontend.py and the golden fixtures.
"""

import numpy as np
import pytest

from sepi_tpu.config import FrontendConfig
from sepi_tpu.ops.features import FeatureExtractor
from sepi_tpu.ops.framing import num_frames
from sepi_tpu.ops.mfcc_pallas import mfcc_fused, reduced_spectral_consts, supported

CONFIGS = {
    "sre8k": FrontendConfig(dither=0.0),
    "snip": FrontendConfig(dither=0.0, snip_edges=True),
    "hires16k": FrontendConfig(
        dither=0.0, sample_rate=16000, num_mel_bins=40, num_ceps=40,
        low_freq=40.0, high_freq=-200.0,
    ),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_parity_with_slices_path(name):
    import jax.numpy as jnp

    cfg = CONFIGS[name]
    assert supported(cfg)
    rng = np.random.default_rng(hash(name) % 2**31)
    b = 3
    n = 3 * cfg.sample_rate + 123
    samples = (rng.normal(size=(b, n)) * 3000).astype(np.float32)
    lengths = np.array([n, int(0.61 * n), cfg.frame_length + 7], np.int32)
    tmax = int(num_frames(n, cfg))
    fe = FeatureExtractor(cfg)
    ref, mref = fe._mfcc_impl(jnp.asarray(samples), jnp.asarray(lengths), tmax, None)
    out, mout = mfcc_fused(
        jnp.asarray(samples), jnp.asarray(lengths), cfg, tmax, interpret=True
    )
    assert np.array_equal(np.asarray(mref), np.asarray(mout))
    err = np.abs(np.asarray(ref) - np.asarray(out)).max()
    assert err < 2e-3, f"{name}: max abs err {err:.3e}"


def test_short_utterance_single_tile():
    """max_frames < T_TILE exercises the single-tile grid + tail patch."""
    import jax.numpy as jnp

    cfg = FrontendConfig(dither=0.0)
    rng = np.random.default_rng(9)
    n = 8000  # 1 s -> 100 frames
    samples = (rng.normal(size=(2, n)) * 100).astype(np.float32)
    lengths = np.array([n, 4321], np.int32)
    tmax = int(num_frames(n, cfg))
    fe = FeatureExtractor(cfg)
    ref, _ = fe._mfcc_impl(jnp.asarray(samples), jnp.asarray(lengths), tmax, None)
    out, _ = mfcc_fused(jnp.asarray(samples), jnp.asarray(lengths), cfg, tmax,
                        interpret=True)
    assert np.abs(np.asarray(ref) - np.asarray(out)).max() < 2e-3


def test_dc_bin_carries_no_mel_weight():
    """The kernel drops spectrum bin 0; its mel weight must be zero."""
    for cfg in CONFIGS.values():
        basis, mel, dct, lift = reduced_spectral_consts(cfg)
        nfft = cfg.padded_window_size
        assert basis.shape == (cfg.frame_length, nfft)  # 2*(nfft/2) lanes
        assert mel.shape[0] == nfft // 2


def test_unsupported_geometries_fall_back():
    # 9.125 ms shift at 8 kHz -> 73 samples: gcd(200, 73) = 1
    assert not supported(FrontendConfig(dither=0.0, frame_shift_ms=9.125))
    assert not supported(FrontendConfig(dither=0.0, raw_energy=False))


class TestDither:
    """The in-kernel counter-hash dither (Kaldi MfccOptions default
    dither=1.0).  The kernel's waveform-level stream differs from the
    stepwise per-frame stream, so parity is statistical: the
    dither-induced perturbation of the cepstra must match the stepwise
    path's in scale, the noise must be deterministic per seed AND
    invariant to batch composition, and masked frames must stay zero."""

    cfg = FrontendConfig(dither=1.0)
    cfg0 = FrontendConfig(dither=0.0)

    def _run(self, seeds=None):
        import jax.numpy as jnp

        rng = np.random.default_rng(77)
        b, n = 3, 2 * 8000
        samples = (rng.normal(size=(b, n)) * 3000).astype(np.float32)
        lengths = np.array([n, n - 777, 8000], np.int32)
        tmax = int(num_frames(n, self.cfg))
        out, mask = mfcc_fused(
            jnp.asarray(samples), jnp.asarray(lengths), self.cfg, tmax,
            interpret=True,
            seeds=None if seeds is None else np.asarray(seeds, np.int32),
        )
        return samples, lengths, tmax, np.asarray(out), np.asarray(mask)

    def test_supported_and_gated_by_seeds(self):
        import jax.numpy as jnp

        assert supported(self.cfg)  # dither no longer disqualifies
        # seeds=None => bit-identical to the dither-free kernel
        s, l, tmax, out_none, _ = self._run(seeds=None)
        clean, _ = mfcc_fused(jnp.asarray(s), jnp.asarray(l), self.cfg0, tmax,
                              interpret=True)
        assert np.array_equal(out_none, np.asarray(clean))

    def test_statistics_match_stepwise_path(self):
        import jax.numpy as jnp

        seeds = np.array([11, 22, 33], np.int32)
        s, l, tmax, out, mask = self._run(seeds=seeds)
        clean, _ = mfcc_fused(jnp.asarray(s), jnp.asarray(l), self.cfg0, tmax,
                              interpret=True)
        d = out - np.asarray(clean)
        assert np.abs(d[~mask]).max() == 0.0  # masked frames stay zero
        # stepwise (per-frame counter-hash) perturbation as scale oracle
        fe = FeatureExtractor(self.cfg, spectral_mode="slices")
        step, _ = fe._mfcc_impl(jnp.asarray(s), jnp.asarray(l), tmax,
                                jnp.asarray(seeds))
        ds = np.asarray(step) - np.asarray(clean)
        scale_k = np.abs(d[mask]).mean()
        scale_s = np.abs(ds[mask]).mean()
        assert scale_k > 0.0
        assert 0.8 < scale_k / scale_s < 1.25, (scale_k, scale_s)

    def test_deterministic_per_seed(self):
        out_a = self._run(seeds=[1, 2, 3])[3]
        out_a2 = self._run(seeds=[1, 2, 3])[3]
        out_b = self._run(seeds=[4, 5, 6])[3]
        assert np.array_equal(out_a, out_a2)
        assert not np.array_equal(out_a, out_b)

    def test_invariant_to_batch_composition(self):
        """The per-utterance seed design's contract: an utterance's
        features do not depend on what else is in the batch, how long
        the batch padding is, or its row position."""
        import jax.numpy as jnp

        rng = np.random.default_rng(5)
        n = 16000
        x = (rng.normal(size=(n,)) * 3000).astype(np.float32)
        other = (rng.normal(size=(2 * n,)) * 3000).astype(np.float32)
        tmax_a = int(num_frames(n, self.cfg))
        tmax_b = int(num_frames(2 * n, self.cfg))
        solo, _ = mfcc_fused(jnp.asarray(x[None]), jnp.asarray([n]),
                             self.cfg, tmax_a, interpret=True,
                             seeds=np.array([99], np.int32))
        batch = np.zeros((2, 2 * n), np.float32)
        batch[0] = other
        batch[1, :n] = x
        both, _ = mfcc_fused(jnp.asarray(batch), jnp.asarray([2 * n, n]),
                             self.cfg, tmax_b, interpret=True,
                             seeds=np.array([7, 99], np.int32))
        np.testing.assert_array_equal(np.asarray(solo)[0],
                                      np.asarray(both)[1, :tmax_a])
        # and on the stepwise path
        fe = FeatureExtractor(self.cfg, spectral_mode="slices")
        solo_s, _ = fe._mfcc_impl(jnp.asarray(x[None]), jnp.asarray([n]),
                                  tmax_a, jnp.asarray([99], jnp.int32))
        both_s, _ = fe._mfcc_impl(jnp.asarray(batch),
                                  jnp.asarray([2 * n, n]), tmax_b,
                                  jnp.asarray([7, 99], jnp.int32))
        np.testing.assert_array_equal(np.asarray(solo_s)[0],
                                      np.asarray(both_s)[1, :tmax_a])

    def test_hash_uniforms_are_gaussian_after_boxmuller(self):
        """Distribution check on the raw in-kernel stream: dither deltas
        on a pure-DC signal isolate the noise; its frame energies must
        track chi-square expectations (catches a broken mixer that,
        e.g., returns constants or correlated draws)."""
        import jax.numpy as jnp

        n = 8000
        # digital silence: the dither IS the signal, so frame log-energy
        # log(sum z^2 - (sum z)^2/flen) ~ log(dither^2 * chi2(flen-1))
        s = np.zeros((2, n), np.float32)
        l = np.array([n, n], np.int32)
        tmax = int(num_frames(n, self.cfg))
        out, mask = mfcc_fused(jnp.asarray(s), jnp.asarray(l), self.cfg, tmax,
                               interpret=True, seeds=np.array([3, 4], np.int32))
        flen = self.cfg.frame_length
        log_e = np.asarray(out)[..., 0][np.asarray(mask)]
        # E[chi2(flen-1)] = flen-1; log of it concentrates hard for flen=200
        expected = np.log(flen - 1)
        assert abs(np.mean(log_e) - expected) < 0.05, (np.mean(log_e), expected)
        assert np.std(log_e) < 0.2
