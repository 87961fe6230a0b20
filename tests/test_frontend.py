"""Frontend DSP tests: vectorized TPU kernels vs direct NumPy oracles.

The oracles are loop-level transcriptions of the Kaldi definitions
(framing/window/preemph order, mel bank construction, sliding CMVN window
shifting, VAD voting), written independently of the JAX implementations so
vectorization bugs can't hide (SURVEY.md §4 test plan).
"""

import math

import numpy as np
import pytest

from sepi_tpu.config import CmvnConfig, FrontendConfig, VadConfig
from sepi_tpu.ops import (
    FeatureExtractor,
    add_deltas,
    energy_vad,
    mel_banks,
    num_frames,
    select_voiced_counts,
    select_voiced_frames,
    sliding_cmvn,
    splice_frames,
)
from sepi_tpu.ops.features import dct_matrix, lifter_coeffs
from sepi_tpu.ops.framing import frame_signal, window_function

CFG = FrontendConfig(dither=0.0)  # deterministic for oracles
CFG_SNIP = CFG.replace(snip_edges=True)


# ---------------------------------------------------------------- oracles
def oracle_frames(x, cfg):
    """Direct transcription of Kaldi frame extraction."""
    flen, shift = cfg.frame_length, cfg.frame_shift
    n = len(x)
    if cfg.snip_edges:
        t_max = (n - flen) // shift + 1 if n >= flen else 0
        starts = [t * shift for t in range(t_max)]
    else:
        t_max = (n + shift // 2) // shift
        starts = [t * shift + shift // 2 - flen // 2 for t in range(t_max)]
    out = np.zeros((t_max, flen), dtype=np.float64)
    for t, s in enumerate(starts):
        for j in range(flen):
            i = s + j
            if i < 0:
                i = -i - 1
            if i >= n:
                i = 2 * n - 1 - i
            out[t, j] = x[i]
    return out


def oracle_mfcc(x, cfg):
    frames = oracle_frames(x, cfg)
    w = window_function(cfg).astype(np.float64)
    nfft = cfg.padded_window_size
    feats = []
    for f in frames:
        f = f.copy()
        if cfg.remove_dc_offset:
            f -= f.mean()
        log_e = math.log(max(np.dot(f, f), np.finfo(np.float32).tiny))
        if cfg.preemphasis:
            g = f.copy()
            g[1:] -= cfg.preemphasis * f[:-1]
            g[0] -= cfg.preemphasis * f[0]
            f = g
        f = f * w
        padded = np.zeros(nfft)
        padded[: len(f)] = f
        spec = np.fft.rfft(padded)
        power = np.abs(spec) ** 2
        mel = power @ mel_banks(cfg).astype(np.float64)
        log_mel = np.log(np.maximum(mel, np.finfo(np.float32).tiny))
        ceps = log_mel @ dct_matrix(cfg.num_ceps, cfg.num_mel_bins).astype(np.float64)
        ceps *= lifter_coeffs(cfg.num_ceps, cfg.cepstral_lifter)
        if cfg.use_energy:
            ceps[0] = log_e
        feats.append(ceps)
    return np.array(feats)


def oracle_vad(log_e, cfg):
    n = len(log_e)
    thr = cfg.energy_threshold + cfg.energy_mean_scale * np.mean(log_e)
    out = np.zeros(n, dtype=bool)
    for t in range(n):
        num = den = 0
        for t2 in range(t - cfg.frames_context, t + cfg.frames_context + 1):
            if 0 <= t2 < n:
                den += 1
                if log_e[t2] > thr:
                    num += 1
        out[t] = num >= cfg.proportion_threshold * den
    return out


def oracle_sliding_cmvn(feats, cfg):
    t_max = len(feats)
    out = np.zeros_like(feats)
    w = min(cfg.window, t_max)
    for t in range(t_max):
        start = t - cfg.window // 2 if cfg.center else t - cfg.window + 1
        start = min(max(start, 0), t_max - w)
        window = feats[start : start + w]
        out[t] = feats[t] - window.mean(axis=0)
        if cfg.normalize_variance:
            out[t] /= np.sqrt(np.maximum(window.var(axis=0), 1e-10))
    return out


def oracle_deltas(feats, order=2, window=2):
    t_max = len(feats)
    i = np.arange(-window, window + 1)
    taps = i / np.sum(i * i)
    outs = [feats]
    cur = feats
    for _ in range(order):
        nxt = np.zeros_like(cur)
        for t in range(t_max):
            for k, c in zip(i, taps):
                nxt[t] += c * cur[np.clip(t + k, 0, t_max - 1)]
        outs.append(nxt)
        cur = nxt
    return np.concatenate(outs, axis=1)


# ----------------------------------------------------------------- tests
@pytest.mark.parametrize("cfg", [CFG, CFG_SNIP], ids=["center", "snip"])
@pytest.mark.parametrize("n", [8000, 8123])
def test_framing_matches_oracle(rng, cfg, n):
    x = rng.normal(size=n).astype(np.float32)
    t_max = int(num_frames(n, cfg))
    windowed, log_e, mask = frame_signal(
        x[None], np.array([n], np.int32), cfg, t_max
    )
    assert bool(np.all(np.asarray(mask[0])))
    oracle = oracle_frames(x, cfg)
    w = window_function(cfg).astype(np.float64)
    proc = []
    for f in oracle:
        f = f - f.mean()
        g = f.copy()
        g[1:] -= cfg.preemphasis * f[:-1]
        g[0] -= cfg.preemphasis * f[0]
        proc.append(g * w)
    np.testing.assert_allclose(np.asarray(windowed[0]), np.array(proc), rtol=2e-4, atol=2e-4)


def test_framing_padded_batch_matches_unpadded(rng):
    """Key batching invariant: padding must not change valid frames."""
    n1, n2 = 8000, 5000
    x1 = rng.normal(size=n1).astype(np.float32)
    x2 = rng.normal(size=n2).astype(np.float32)
    batch = np.zeros((2, n1), np.float32)
    batch[0], batch[1, :n2] = x1, x2
    t_max = int(num_frames(n1, CFG))
    w_b, e_b, m_b = frame_signal(batch, np.array([n1, n2], np.int32), CFG, t_max)
    t2 = int(num_frames(n2, CFG))
    w_s, e_s, m_s = frame_signal(x2[None], np.array([n2], np.int32), CFG, t2)
    assert int(np.sum(np.asarray(m_b[1]))) == t2
    np.testing.assert_allclose(
        np.asarray(w_b[1, :t2]), np.asarray(w_s[0]), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("cfg", [CFG, CFG.replace(use_energy=False), CFG_SNIP])
def test_mfcc_matches_oracle(rng, cfg):
    """Float32 parity with the f64 oracle.

    The fused f64 spectral basis keeps the f32 path within ~5e-5 of the
    double-precision oracle across every coefficient (measured over
    seeds); asserted at 1e-3 absolute per bin — tight enough that any
    real semantic regression (window, preemph ordering, mel edges,
    lifter) fails loudly, with 20x margin over observed float noise."""
    x = rng.normal(size=8000).astype(np.float32) * 100
    feats, mask = FeatureExtractor(cfg).mfcc(x, None)
    oracle = oracle_mfcc(x, cfg)
    assert feats.shape == oracle.shape
    np.testing.assert_allclose(np.asarray(feats), oracle, atol=1e-3, rtol=0)
    # C0/energy tighter still
    np.testing.assert_allclose(
        np.asarray(feats[:, 0]), oracle[:, 0], rtol=1e-4, atol=1e-4
    )


def test_dft_basis_exact_in_f64(rng):
    """The GEMM-DFT basis is algebraically the rfft (checked in f64)."""
    from sepi_tpu.ops.features import dft_basis

    cfg = CFG
    frames = rng.normal(size=(7, cfg.frame_length))
    basis = dft_basis(cfg).astype(np.float64)
    # rebuild basis in f64 from definition to avoid f32 storage error
    import math

    nfft = cfg.padded_window_size
    k = np.arange(nfft // 2 + 1)
    n = np.arange(cfg.frame_length)
    ang = 2 * math.pi * np.outer(n, k) / nfft
    b64 = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1)
    spec = frames @ b64
    kk = nfft // 2 + 1
    power = spec[:, :kk] ** 2 + spec[:, kk:] ** 2
    padded = np.zeros((7, nfft))
    padded[:, : cfg.frame_length] = frames
    ref = np.abs(np.fft.rfft(padded, axis=1)) ** 2
    np.testing.assert_allclose(power, ref, rtol=1e-9, atol=1e-9)
    # and the f32-stored basis is elementwise close to the f64 one
    np.testing.assert_allclose(basis, b64, atol=1e-6)


def test_fbank_tone_peaks_at_right_bin(rng):
    """A pure tone's energy lands in the mel bin containing its frequency."""
    cfg = CFG
    freq = 1000.0
    t = np.arange(16000) / cfg.sample_rate
    x = np.sin(2 * np.pi * freq * t).astype(np.float32) * 1000
    feats, _ = FeatureExtractor(cfg).fbank(x, None)
    mean_spec = np.asarray(feats).mean(axis=0)
    # find which mel bin center is nearest 1 kHz
    m = mel_banks(cfg)
    centers = np.argmax(m, axis=0) * cfg.sample_rate / cfg.padded_window_size
    expect = int(np.argmin(np.abs(centers - freq)))
    assert abs(int(np.argmax(mean_spec)) - expect) <= 1


def test_mel_banks_shape_and_partition():
    m = mel_banks(CFG)
    assert m.shape == (CFG.padded_window_size // 2 + 1, CFG.num_mel_bins)
    assert np.all(m >= 0)
    # interior fft bins (inside [low, high]) should have total weight ~1
    freqs = np.arange(m.shape[0]) * CFG.sample_rate / CFG.padded_window_size
    # away from the band edges the triangles tile to ~1
    interior = (freqs > 400) & (freqs < 3000)
    np.testing.assert_allclose(m[interior].sum(axis=1), 1.0, atol=0.05)


def test_vad_matches_oracle(rng):
    cfg = VadConfig()
    log_e = rng.normal(size=200) * 3 + 4
    voiced = energy_vad(log_e, np.ones(200, bool), cfg)
    np.testing.assert_array_equal(np.asarray(voiced), oracle_vad(log_e, cfg))


def test_vad_batched_respects_mask(rng):
    cfg = VadConfig()
    e1 = rng.normal(size=150) * 3 + 4
    batch = np.zeros((2, 200), np.float32)
    batch[0, :150] = e1
    batch[1] = rng.normal(size=200) * 3 + 4
    mask = np.zeros((2, 200), bool)
    mask[0, :150] = True
    mask[1] = True
    v = energy_vad(batch, mask, cfg)
    np.testing.assert_array_equal(np.asarray(v[0, :150]), oracle_vad(e1, cfg))
    assert not np.any(np.asarray(v[0, 150:]))


@pytest.mark.parametrize("t_len", [50, 300, 700])
@pytest.mark.parametrize("norm_vars", [False, True])
def test_sliding_cmvn_matches_oracle(rng, t_len, norm_vars):
    cfg = CmvnConfig(normalize_variance=norm_vars)
    feats = rng.normal(size=(t_len, 5)).astype(np.float32) * 3 + 1
    out = sliding_cmvn(feats, np.ones(t_len, bool), cfg)
    np.testing.assert_allclose(
        np.asarray(out), oracle_sliding_cmvn(feats.astype(np.float64), cfg),
        rtol=1e-3, atol=1e-3,
    )


def test_sliding_cmvn_batched_masked(rng):
    cfg = CmvnConfig()
    t1 = 120
    feats = rng.normal(size=(2, 400, 4)).astype(np.float32)
    mask = np.zeros((2, 400), bool)
    mask[0, :t1] = True
    mask[1] = True
    out = sliding_cmvn(feats, mask, cfg)
    np.testing.assert_allclose(
        np.asarray(out[0, :t1]),
        oracle_sliding_cmvn(feats[0, :t1].astype(np.float64), cfg),
        rtol=1e-3, atol=1e-3,
    )
    assert np.all(np.asarray(out[0, t1:]) == 0)


def test_sliding_cmvn_short_utt_in_short_pad(rng):
    """Regression: an utterance with half < n < window frames, padded to
    T < window, selects the 'interior' stats branch at exactly t = half
    with an upper prefix-sum index past T.  The prefix sum must saturate
    at the total (edge padding) — a zero there left that one frame
    silently unnormalized (caught as a pad-length-dependent feature
    mismatch once geometric shape buckets changed batch pad widths)."""
    cfg = CmvnConfig()  # window 300, center
    n = 175
    for t_pad in (n, 200, 299, 360):
        feats = np.zeros((1, t_pad, 4), np.float32)
        body = rng.normal(size=(n, 4)).astype(np.float32) * 2 + 1
        feats[0, :n] = body
        mask = np.zeros((1, t_pad), bool)
        mask[0, :n] = True
        out = np.asarray(sliding_cmvn(feats, mask, cfg))[0, :n]
        np.testing.assert_allclose(
            out, oracle_sliding_cmvn(body.astype(np.float64), cfg),
            rtol=1e-3, atol=1e-3, err_msg=f"t_pad={t_pad}",
        )


def test_deltas_match_oracle(rng):
    feats = rng.normal(size=(40, 6)).astype(np.float32)
    out = add_deltas(feats, np.ones(40, bool))
    np.testing.assert_allclose(np.asarray(out), oracle_deltas(feats), rtol=1e-4, atol=1e-5)


def test_splice_clamps_edges(rng):
    feats = rng.normal(size=(10, 2)).astype(np.float32)
    out = np.asarray(splice_frames(feats, np.ones(10, bool), (-2, 0, 1)))
    assert out.shape == (10, 6)
    np.testing.assert_allclose(out[0, :2], feats[0])  # t-2 clamped to 0
    np.testing.assert_allclose(out[5, :2], feats[3])
    np.testing.assert_allclose(out[9, 4:], feats[9])  # t+1 clamped to 9


def test_select_voiced_frames(rng):
    feats = rng.normal(size=(7, 3)).astype(np.float32)
    voiced = np.array([1, 0, 1, 1, 0, 0, 1], bool)
    out, mask = select_voiced_frames(feats, voiced)
    assert int(mask.sum()) == 4
    np.testing.assert_allclose(np.asarray(out[:4]), feats[[0, 2, 3, 6]])
    assert np.all(np.asarray(out[4:]) == 0)


def test_select_voiced_ali_parity(rng):
    """select-voiced-ali semantics: ali and feats stay aligned."""
    ali = np.arange(7, dtype=np.int32) * 10
    voiced = np.array([1, 0, 1, 1, 0, 0, 1], bool)
    out, mask = select_voiced_counts(ali, voiced)
    np.testing.assert_array_equal(np.asarray(out[:4]), [0, 20, 30, 60])
    assert np.all(np.asarray(out[4:]) == -1)


@pytest.mark.parametrize("cfg", [
    pytest.param(__import__("sepi_tpu.config", fromlist=["MFCC_HIRES"]).MFCC_HIRES.replace(dither=0.0), id="hires40"),
    pytest.param(__import__("sepi_tpu.config", fromlist=["MFCC_SRE_IVECTOR"]).MFCC_SRE_IVECTOR.replace(dither=0.0), id="ivec20"),
])
def test_named_config_presets_match_oracle(rng, cfg):
    """The reference conf-file presets (hires 40-bin, i-vector 20-cep)
    run through the fused path and match the oracle."""
    x = rng.normal(size=6000).astype(np.float32) * 100
    feats, mask = FeatureExtractor(cfg).mfcc(x, None)
    oracle = oracle_mfcc(x, cfg)
    assert feats.shape == oracle.shape
    np.testing.assert_allclose(np.asarray(feats), oracle, atol=0.5, rtol=0)
    # hires: high_freq=-200 means nyquist-200
    if cfg.high_freq < 0:
        assert cfg.high_freq_hz == cfg.nyquist + cfg.high_freq


def test_mfcc_dither_path(rng):
    """Dithered extraction: stochastic per key, near the clean features."""
    import jax

    cfg = FrontendConfig(dither=1.0)
    fe = FeatureExtractor(cfg)
    x = (rng.normal(size=8000) * 1000).astype(np.float32)
    f1, _ = fe.mfcc(x, None, key=jax.random.PRNGKey(0))
    f2, _ = fe.mfcc(x, None, key=jax.random.PRNGKey(1))
    clean, _ = FeatureExtractor(cfg.replace(dither=0.0)).mfcc(x, None)
    a1, a2, c = map(np.asarray, (f1, f2, clean))
    assert np.all(np.isfinite(a1))
    assert not np.array_equal(a1, a2)  # different keys, different noise
    # dither of 1.0 on int16-scale audio is a tiny perturbation
    np.testing.assert_allclose(a1, c, atol=0.2)


# ------------------------------------------------ GMM-based VAD variant


def test_gmm_vad_rejects_loud_nonspeech(rng):
    """compute_vad_decision_gmm.sh capability: class-GMM frame likes beat
    the energy VAD on loud non-speech.  Speech and noise are equally loud
    (energy VAD accepts both); the class GMMs separate them spectrally."""
    import jax.numpy as jnp

    from sepi_tpu.config import VadConfig
    from sepi_tpu.ops import energy_vad, gmm_vad, merge_vads, train_vad_gmms, vad_from_frame_likes

    d = 6
    speech_mu = np.array([10.0, 3, 0, 0, 0, 0])
    noise_mu = np.array([10.0, 0, 0, 0, 0, 3])  # same energy (dim 0), different shape
    sil_mu = np.array([2.0, 0, 0, 0, 0, 0])
    n = 300
    speech = speech_mu + rng.normal(size=(n, d)) * 0.4
    noise = noise_mu + rng.normal(size=(n, d)) * 0.4
    sil = sil_mu + rng.normal(size=(n, d)) * 0.4

    # class GMMs trained supervised (the reference's pretrained GMM dirs)
    from sepi_tpu.ops.vad import train_vad_gmms as _t

    speech_gmm, _ = _t(np.concatenate([speech, sil]),
                       np.concatenate([np.ones(n, bool), np.zeros(n, bool)]),
                       num_comps=2)
    noise_gmm, _ = _t(np.concatenate([noise, sil]),
                      np.concatenate([np.ones(n, bool), np.zeros(n, bool)]),
                      num_comps=2)

    utt = np.concatenate([speech[:80], noise[:80], sil[:40]]).astype(np.float32)
    mask = np.ones(len(utt), bool)
    voiced = gmm_vad(jnp.asarray(utt), jnp.asarray(mask), [speech_gmm, noise_gmm],
                     speech_classes=(0,))
    v = np.asarray(voiced)
    assert v[:80].mean() > 0.9  # speech kept
    assert v[80:160].mean() < 0.1  # loud noise rejected
    # energy VAD alone accepts the loud noise
    ev = np.asarray(energy_vad(jnp.asarray(utt[:, 0]), jnp.asarray(mask), VadConfig()))
    assert ev[80:160].mean() > 0.9
    # merged decision = intersection
    merged = np.asarray(merge_vads(voiced, jnp.asarray(ev)))
    assert merged[80:160].mean() < 0.1 and merged[:80].mean() > 0.9


def test_vad_from_frame_likes_priors_shift_decision(rng):
    import jax.numpy as jnp

    from sepi_tpu.ops import vad_from_frame_likes

    t = 50
    likes = np.zeros((2, t), np.float32)  # perfectly ambiguous
    mask = np.ones(t, bool)
    v0 = np.asarray(vad_from_frame_likes(jnp.asarray(likes), jnp.asarray(mask),
                                         speech_classes=(0,), priors=[1.0, 0.0]))
    v1 = np.asarray(vad_from_frame_likes(jnp.asarray(likes), jnp.asarray(mask),
                                         speech_classes=(0,), priors=[0.0, 1.0]))
    assert v0.all() and not v1.any()


def test_train_vad_gmms_bootstrap_separates_classes(rng):
    from sepi_tpu.ops import train_vad_gmms

    loud = np.array([8.0, 1, 1]) + rng.normal(size=(400, 3)) * 0.3
    quiet = np.array([1.0, 0, 0]) + rng.normal(size=(400, 3)) * 0.3
    frames = np.concatenate([loud, quiet]).astype(np.float32)
    voiced = np.concatenate([np.ones(400, bool), np.zeros(400, bool)])
    sp, ns = train_vad_gmms(frames, voiced, num_comps=2)
    assert float(np.asarray(sp.means)[:, 0].mean()) > float(np.asarray(ns.means)[:, 0].mean())


def test_spectral_conv_matches_slices_path(rng):
    """The strided-conv fused spectral path must match the block-row
    slices + GEMM path (both exact) on a padded batch incl. short rows."""
    from sepi_tpu.ops.features import FeatureExtractor

    for cfg in [CFG, CFG_SNIP, CFG.replace(use_energy=False)]:
        n1, n2 = 8000, 5120
        batch = np.zeros((2, n1), np.float32)
        batch[0] = rng.normal(size=n1).astype(np.float32) * 100
        batch[1, :n2] = rng.normal(size=n2).astype(np.float32) * 100
        lengths = np.array([n1, n2], np.int32)
        fe_conv = FeatureExtractor(cfg, spectral_mode="conv")
        fe_sli = FeatureExtractor(cfg, spectral_mode="slices")
        fc, mc = fe_conv.mfcc(batch, lengths)
        fs, ms = fe_sli.mfcc(batch, lengths)
        np.testing.assert_array_equal(np.asarray(mc), np.asarray(ms))
        np.testing.assert_allclose(np.asarray(fc), np.asarray(fs), atol=2e-3, rtol=1e-4)
