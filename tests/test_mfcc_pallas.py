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
