"""Fused MFCC as ONE Pallas TPU kernel: framing + DFT + mel + DCT in VMEM.

The GEMM-native frontend (features.py) is algorithmically right for the
MXU but its framing stage materializes a (B, T, flen) frames tensor in
HBM (128 MB for a 16x100 s batch) via stride-s_blocks row slices, which
XLA lowers poorly (~7 ms of a 13 ms extraction step — gather-class, not
bandwidth-bound).  This kernel never materializes frames: each grid
program DMAs one contiguous (T_TILE, s_blocks*g) row-block of the padded
signal into VMEM (plus a tiny halo block for the frames that straddle
the tile edge), assembles the (T_TILE, flen) frame tile from *static
contiguous row slices* in registers, and runs the whole spectral chain —
fused dc/preemph/window DFT basis -> |.|^2 -> mel -> log -> DCT ->
lifter -> energy C0 — on MXU/VPU, writing only the (T_TILE, num_ceps)
result.  HBM traffic drops from ~260 MB to ~55 MB (the raw samples once
plus the tiny output), with zero gathers.

Frame-assembly math (same gcd trick as framing._gather_frames_fast):
with g = gcd(flen, shift), s = shift/g, frame i is the concatenation of
k = flen/g g-sample blocks, block j living at g-row j + s*i.  Viewing
the padded signal as rows of s*g samples (one reshape, free: the buffer
is contiguous), g-row (j + s*i) is row (i + j//s), lane slice
(j%s)*g:(j%s+1)*g — so part j of ALL frames in a tile is one contiguous
row slice of one static lane slice.  No strides, no index vectors.

Semantics are identical to the 'slices' path (same fused basis, same
raw-energy definition, same Kaldi left-mirror); the few frames whose
window crosses each utterance's true end are recomputed exactly outside
and patched in (features-level selects), as the conv path does.

Precision: the kernel's dots default to Precision.DEFAULT (single-pass
MXU, bf16-class f32) — the SAME accuracy class as the XLA 'slices' path
it replaces, whose f32 GEMMs XLA also runs at the MXU default (measured
~1.5 max abs deviation from exact f32 in the cepstra, on either path).
precision='highest' (6-pass, true f32) matches the exact interpreter to
2e-5 but costs ~40% more (v5e, 16x100 s batch: default 4.7 ms, highest
6.6 ms, XLA slices 5.2 ms).  Mosaic supports only HIGHEST and DEFAULT.

Reference parity: replaces `compute-mfcc-feats` (steps/make_mfcc.sh:107)
on the extraction hot path, including Kaldi-default dithered configs
(waveform-level Gaussian dither drawn in-kernel; see mfcc_fused).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import FrontendConfig

_EPS = float(np.finfo(np.float32).tiny)
T_TILE = 256  # frames per grid program (default; see mfcc_fused(t_tile=))
_HALO_ROWS = 8  # sublane-aligned halo block (>= ceil(k_blocks/s_blocks))


def _geometry(cfg: FrontendConfig):
    flen, shift = cfg.frame_length, cfg.frame_shift
    g = math.gcd(flen, shift)
    return g, shift // g, flen // g  # g, s_blocks, k_blocks


def supported(cfg: FrontendConfig) -> bool:
    """Static config gate for the fused kernel (else: slices path)."""
    g, s_blocks, k_blocks = _geometry(cfg)
    if g < 8 or s_blocks > 8:  # degenerate framing geometries
        return False
    if (k_blocks + s_blocks - 1) // s_blocks > _HALO_ROWS:
        return False
    if cfg.frame_shift > cfg.frame_length:  # no overlap: slices path fine
        return False
    if not cfg.raw_energy:
        return False  # windowed energy needs the windowed frames tensor
    nfft = cfg.padded_window_size
    return nfft % 2 == 0


def reduced_spectral_consts(cfg: FrontendConfig):
    """(fused_basis[:, bins 1..K-1], mel[1:K], dct, lifter) as np arrays.

    Bin 0 (DC) and nothing else is dropped so the basis lane count is
    2*(nfft/2) — a multiple of 128 for the standard 256/512-point FFTs.
    Dropping bin 0 is exact: its mel weight is identically zero for any
    low_freq >= 0 (the first triangle rises from mel(low_freq)), and C0
    comes from the energy/DCT, not the spectrum.
    """
    from .features import dct_matrix, fused_dft_basis, lifter_coeffs, mel_banks

    mel = mel_banks(cfg)  # (K, M)
    if not np.all(mel[0] == 0.0):  # pragma: no cover - defensive
        raise ValueError("DC bin carries mel weight; kernel assumption broken")
    k = mel.shape[0]  # nfft//2 + 1
    fused = fused_dft_basis(cfg)  # (flen, 2K) [cos | -sin]
    basis = np.concatenate([fused[:, 1:k], fused[:, k + 1 :]], axis=1)
    dct = dct_matrix(cfg.num_ceps, cfg.num_mel_bins)
    lift = lifter_coeffs(cfg.num_ceps, cfg.cepstral_lifter)
    return basis, mel[1:], dct, lift[None, :]


def _kernel(x_ref, halo_ref, seed_ref, basis_ref, mel_ref, dct_ref, lift_ref,
            out_ref, *, cfg: FrontendConfig, km: int, t_tile: int, prec,
            dithered: bool):
    g, s_blocks, k_blocks = _geometry(cfg)
    flen = cfg.frame_length
    extra = (k_blocks + s_blocks - 1) // s_blocks
    # (T_TILE + extra, s_blocks*g) signal rows for this tile
    rows = jnp.concatenate([x_ref[0], halo_ref[0, :extra]], axis=0)
    T_TILE = t_tile
    if dithered:
        # WAVEFORM-level dither: one N(0, dither²) draw per signal sample
        # of this tile's row block, added BEFORE framing — so overlapping
        # frames share their common samples' noise (Kaldi re-draws per
        # frame window; the per-frame-sample marginal law is identical,
        # only the cross-frame noise correlation differs — documented in
        # docs/PARITY.md).  Dither precedes dc/preemph/window in Kaldi's
        # order; those are linear and folded into the basis applied
        # after the addition, so the composition is exact, and the raw
        # energy accumulators below see the dithered parts, matching the
        # stepwise path.
        #
        # Cost shape: Box-Muller's log/sqrt/trig are long VPU polynomial
        # chains, so draw count is the whole dither cost — hence one
        # fmix32 per uniform, BOTH Box-Muller outputs used (r·cos /
        # r·sin are independent by construction; the two halves of the
        # row block are stacked on the sublane dim), and 2.5× fewer
        # draws than per-frame dither at the SRE framing's 200/80
        # overlap.
        #
        # Determinism: the (B, 1) per-UTTERANCE seed table lives in
        # SMEM; the tile index remixes it, and counters are tile-local —
        # every noise value is a pure function of (utt_seed, absolute
        # sample position), so features do not depend on how utterances
        # were batched or padded (ops/dither.py).
        from .dither import _fmix32, hash_normal_pair

        # scalar mixing stays in int32 (Mosaic's tpu.bitcast is
        # vector-only); GOLDEN as its two's-complement int32, wrapping
        # multiply — identical bits to the uint32 computation
        useed = seed_ref[pl.program_id(0), 0]
        mixed = useed ^ (pl.program_id(1) * jnp.int32(0x9E3779B9 - 2**32))
        rows_n = T_TILE + extra
        half = (rows_n + 1) // 2
        row_w = s_blocks * g
        seed = _fmix32(jax.lax.bitcast_convert_type(
            jnp.full((half, row_w), mixed, jnp.int32), jnp.uint32))
        cell = (
            jax.lax.broadcasted_iota(jnp.uint32, (half, row_w), 0) * row_w
            + jax.lax.broadcasted_iota(jnp.uint32, (half, row_w), 1)
        )
        z1, z2 = hash_normal_pair(seed, cell, half * row_w)
        rows = rows + cfg.dither * jnp.concatenate([z1, z2], axis=0)[:rows_n]
    # The frame tile is never materialized: part j of every frame (the
    # j-th g-sample block, one contiguous row/lane slice) contracts
    # against its own g rows of the fused basis, accumulating the
    # spectrum — Σ_j part_j @ basis[j*g:(j+1)*g].  (A lane-concat of the
    # parts into (T_TILE, flen) is also what Mosaic cannot relayout:
    # slices at different sublane offsets can't concat on the lane dim.)
    spec = jnp.zeros((T_TILE, 2 * km), jnp.float32)
    s1 = jnp.zeros((T_TILE, 1), jnp.float32)
    s2 = jnp.zeros((T_TILE, 1), jnp.float32)
    for j in range(k_blocks):
        lane = (j % s_blocks) * g
        off = j // s_blocks
        part = rows[off : off + T_TILE, lane : lane + g]
        spec = spec + jnp.dot(part, basis_ref[j * g : (j + 1) * g, :],
                              preferred_element_type=jnp.float32,
                              precision=prec)
        if cfg.use_energy:
            s1 = s1 + jnp.sum(part, axis=-1, keepdims=True)
            s2 = s2 + jnp.sum(part * part, axis=-1, keepdims=True)
    power = spec[:, :km] ** 2 + spec[:, km:] ** 2  # (T_TILE, km)
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                  precision=prec)
    log_mel = jnp.log(jnp.maximum(mel, _EPS))
    ceps = jnp.dot(log_mel, dct_ref[:], preferred_element_type=jnp.float32,
                   precision=prec)
    ceps = ceps * lift_ref[:]

    if cfg.use_energy:
        e = s2 - s1 * s1 / flen if cfg.remove_dc_offset else s2
        log_e = jnp.log(jnp.maximum(e, _EPS))
        if cfg.energy_floor > 0.0:
            log_e = jnp.maximum(log_e, math.log(cfg.energy_floor))
        ceps = jnp.concatenate([log_e, ceps[:, 1:]], axis=-1)
    out_ref[0] = ceps


@partial(jax.jit,
         static_argnames=("cfg", "max_frames", "interpret", "t_tile", "precision"))
def mfcc_fused(
    samples: jnp.ndarray,
    lengths: jnp.ndarray,
    cfg: FrontendConfig,
    max_frames: int,
    interpret: bool = False,
    t_tile: int = T_TILE,
    precision: str = "default",
    seeds: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched MFCC via the fused kernel: (B, N) -> ((B, T, C), mask).

    Identical numerics to FeatureExtractor's 'slices' path for
    dither-free raw-energy configs (tests/test_mfcc_pallas.py).  With
    ``seeds`` ((B,) int32, one per utterance — ops/dither.utt_seeds)
    and ``cfg.dither > 0``, N(0, dither²) waveform dither is drawn
    IN-KERNEL from a counter-based murmur3/Box-Muller generator — same
    per-frame-sample law as the stepwise path (which re-draws per frame
    window; see the deviation note in _kernel and docs/PARITY.md),
    a pure function of (seed, absolute sample position) so features are
    invariant to batching/padding, and bit-identical between Mosaic and
    the interpreter (ops/dither.py).
    """
    from .framing import num_frames

    cfg_key = cfg
    T_TILE = t_tile
    dithered = seeds is not None and cfg.dither != 0.0
    # Mosaic lowers only HIGHEST (6-pass f32) and DEFAULT (1-pass bf16).
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT}[precision]
    b, n = samples.shape
    flen, shift = cfg.frame_length, cfg.frame_shift
    g, s_blocks, k_blocks = _geometry(cfg)
    row_w = s_blocks * g  # == shift
    n_t = max(-(-max_frames // T_TILE), 1)
    t_pad = n_t * T_TILE

    # padded signal: [left mirror | samples | zeros], row-aligned with
    # capacity for the last tile's halo block.
    pad_l = 0 if cfg.snip_edges else flen // 2 - shift // 2
    rows_total = n_t * T_TILE + _HALO_ROWS
    n_pad = rows_total * row_w
    samples = samples.astype(jnp.float32)
    pieces = []
    if pad_l:
        pieces.append(samples[:, :pad_l][:, ::-1])
    pieces.append(samples)
    pad_r = n_pad - pad_l - n
    if pad_r < 0:
        pieces[-1] = samples[:, : n + pad_r]
    else:
        pieces.append(jnp.zeros((b, pad_r), jnp.float32))
    x_rows = jnp.concatenate(pieces, axis=1).reshape(b, rows_total, row_w)

    basis, mel, dct, lift = (
        jnp.asarray(a) for a in reduced_spectral_consts(cfg)
    )
    km = mel.shape[0]
    c = cfg.num_ceps

    # (B, 1) per-utterance seed table; zeros when dither is off (the
    # kernel branch is static, the operand keeps the signature uniform)
    if dithered:
        seed_tab = jnp.asarray(seeds, jnp.int32).reshape(b, 1)
    else:
        seed_tab = jnp.zeros((b, 1), jnp.int32)

    grid = (b, n_t)
    out = pl.pallas_call(
        partial(_kernel, cfg=cfg_key, km=km, t_tile=T_TILE, prec=prec,
                dithered=dithered),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T_TILE, row_w), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _HALO_ROWS, row_w),
                         lambda i, t: (i, (t + 1) * (T_TILE // _HALO_ROWS), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((flen, 2 * km), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((km, cfg.num_mel_bins), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.num_mel_bins, c), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T_TILE, c), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t_pad * (flen * 2 * km + km * cfg.num_mel_bins
                                   + cfg.num_mel_bins * c),
            bytes_accessed=b * n_pad * 4 + b * t_pad * c * 4,
            transcendentals=b * t_pad * (cfg.num_mel_bins + 1),
        ),
        interpret=interpret,
    )(x_rows, x_rows, seed_tab, basis, mel, dct, lift)
    out = out[:, :max_frames]

    # Exact right-edge fix-up: the ~3 frames whose window crosses each
    # utterance's true length need the mirror; recompute those rows with
    # the exact gather and patch with branch-free selects (scatter-free).
    n_fix = min(-(-(flen - shift // 2) // shift) + 1, max_frames)
    t_u = num_frames(lengths, cfg)
    t0 = jnp.clip(t_u - n_fix, 0, max_frames - n_fix)

    def tail_exact(s, length, start):
        tt = start + jnp.arange(n_fix, dtype=jnp.int32)[:, None]
        nn = jnp.arange(flen, dtype=jnp.int32)[None, :]
        if cfg.snip_edges:
            idx = tt * shift + nn
        else:
            idx = tt * shift + shift // 2 - flen // 2 + nn
        idx = jnp.where(idx < 0, -idx - 1, idx)
        idx = jnp.where(idx >= length, 2 * length - 1 - idx, idx)
        idx = jnp.where(idx < 0, -idx - 1, idx)
        return s[jnp.clip(idx, 0, length - 1)]

    exact = jax.vmap(tail_exact)(samples[:, :n], lengths, t0)  # (B,n_fix,flen)
    if dithered:
        # the patched tail frames draw per-frame noise from a distinct
        # per-utterance hash domain (same law as the kernel's waveform
        # stream, disjoint seeds; t0 is a function of utterance length
        # only, so the patch too is batch-invariant)
        from .dither import _fmix32, hash_normal

        pseed = _fmix32(
            jax.lax.bitcast_convert_type(
                jnp.asarray(seeds, jnp.int32), jnp.uint32)
            ^ jnp.uint32(0x7F4A7C15))[:, None, None]
        cnt = jnp.arange(n_fix * flen, dtype=jnp.uint32).reshape(
            1, n_fix, flen)
        exact = exact + cfg.dither * hash_normal(pseed, cnt, n_fix * flen)
    exact = jax.lax.optimization_barrier(exact)
    spec_e = jnp.einsum("bnf,fk->bnk", exact, basis,
                        preferred_element_type=jnp.float32)
    power_e = spec_e[..., :km] ** 2 + spec_e[..., km:] ** 2
    mel_e = jnp.dot(power_e, mel, preferred_element_type=jnp.float32)
    ceps_e = jnp.dot(jnp.log(jnp.maximum(mel_e, _EPS)), dct,
                     preferred_element_type=jnp.float32) * lift
    if cfg.use_energy:
        s1 = jnp.sum(exact, axis=-1)
        s2 = jnp.sum(exact * exact, axis=-1)
        e = s2 - s1 * s1 / flen if cfg.remove_dc_offset else s2
        log_e = jnp.log(jnp.maximum(e, _EPS))
        if cfg.energy_floor > 0.0:
            log_e = jnp.maximum(log_e, math.log(cfg.energy_floor))
        ceps_e = jnp.concatenate([log_e[..., None], ceps_e[..., 1:]], axis=-1)
    rel = jnp.arange(max_frames, dtype=jnp.int32)[None, :] - t0[:, None]
    for j in range(n_fix):
        cond = (rel == j)[:, :, None]
        out = jnp.where(cond, ceps_e[:, j][:, None, :], out)

    mask = jnp.arange(max_frames)[None, :] < t_u[:, None]
    return out * mask[..., None], mask
