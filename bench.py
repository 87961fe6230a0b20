"""Headline benchmark: embedding-extraction throughput, audio-seconds/s/chip.

Runs the COMPLETE extraction path of the v2 recipe on-device as one jitted
program — raw samples -> MFCC (GEMM DFT) -> energy VAD -> sliding CMVN ->
voiced-frame compaction -> full-size x-vector TDNN -> embedding — i.e.
what `extract_xvectors_new.sh` does with five Kaldi binaries and 32
processes (SURVEY.md §3.4), in one XLA program.

Baseline: the reference publishes no speed numbers (BASELINE.md); its
target is ">=10x Kaldi-CPU per host".  We anchor Kaldi-CPU extraction at
~100x realtime per host (typical nnet3-xvector-compute on a multicore
host), so vs_baseline is measured against 1000 audio-seconds/s.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sepi_tpu.config import CmvnConfig, FrontendConfig, VadConfig
    from sepi_tpu.models import V2_XVECTOR, XVector
    from sepi_tpu.ops import energy_vad, select_voiced_frames, sliding_cmvn
    from sepi_tpu.ops.features import FeatureExtractor
    from sepi_tpu.ops.framing import num_frames
    import dataclasses

    platform = jax.devices()[0].platform
    print(f"# bench device: {jax.devices()[0]}", file=sys.stderr)

    sr = 8000
    batch, secs = 16, 100.0  # 16 x 100 s utterances per step
    n_samples = int(sr * secs)
    fcfg = FrontendConfig(dither=0.0)
    fe = FeatureExtractor(fcfg)
    t_max = int(num_frames(n_samples, fcfg))
    vcfg, ccfg = VadConfig(), CmvnConfig()

    cfg = dataclasses.replace(V2_XVECTOR, num_speakers=5000)
    model = XVector(cfg)
    rng = np.random.default_rng(0)
    probe = jnp.zeros((1, 200, 23), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), probe, train=False))()

    @jax.jit
    def extract(variables, samples, lengths):
        feats, mask = fe._mfcc_impl(samples, lengths, t_max, None)
        voiced = energy_vad(feats[..., 0], mask, vcfg)
        normed = sliding_cmvn(feats, mask, ccfg)
        sel, sel_mask = select_voiced_frames(normed, voiced)
        out = model.apply(variables, sel, frame_mask=sel_mask, train=False)
        return out["embedding_a"]

    samples = jnp.asarray(
        rng.normal(size=(batch, n_samples)).astype(np.float32) * 3000.0
    )
    lengths = jnp.full((batch,), n_samples, jnp.int32)
    samples = jax.device_put(samples)

    # Measure with the iteration loop ON DEVICE (fori_loop) and sync via
    # host transfer: per-dispatch overhead through remote-device tunnels
    # otherwise dominates, and async-dispatch timing under-reports.
    iters = 10

    @jax.jit
    def extract_loop(variables, samples, lengths):
        def body(i, acc):
            emb = extract(variables, samples + i.astype(jnp.float32) * 1e-12, lengths)
            return acc + jnp.sum(emb)

        return jax.lax.fori_loop(0, iters, body, 0.0)

    np.asarray(extract_loop(variables, samples, lengths))  # compile+warm
    t0 = time.perf_counter()
    np.asarray(extract_loop(variables, samples, lengths))
    dt = (time.perf_counter() - t0) / iters
    audio_sec_per_s = batch * secs / dt
    print(f"# {dt*1e3:.1f} ms / batch of {batch}x{secs:.0f}s audio", file=sys.stderr)

    baseline = 1000.0  # 10x an assumed 100x-realtime Kaldi-CPU host
    print(
        json.dumps(
            {
                "metric": "xvector_extraction_throughput",
                "value": round(audio_sec_per_s, 1),
                "unit": "audio_seconds_per_second_per_chip",
                "vs_baseline": round(audio_sec_per_s / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
