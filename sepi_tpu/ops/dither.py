"""Counter-based Gaussian noise for dither: deterministic per utterance.

Kaldi's dither draws from one global srand stream, so features change
when the scp order does.  This framework makes dither a pure function of
(utt_id, config, seed): each utterance gets a 32-bit seed hashed from
its id (`utt_seed`), and every noise value is murmur3-fmix32(seed ^
counter) pushed through Box-Muller — so features are bitwise-stable
across batch composition, corpus subsetting, and backend (the same
plain-uint32 chain lowers through Mosaic in the fused Pallas kernel,
XLA on the stepwise path, and the Pallas interpreter in CI).

Replaces: the Dither() stage of compute-mfcc-feats
(`steps/make_mfcc.sh:107`; Kaldi feat/feature-window.cc Dither) with a
per-frame-sample law identical to Kaldi's N(0, dither^2).
"""

from __future__ import annotations

import hashlib
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_TWO_PI = 6.283185307179586
_INV_2_24 = 2.0 ** -24


def _fmix32(h: jnp.ndarray) -> jnp.ndarray:
    """MurmurHash3 32-bit finalizer (public domain): bijective avalanche
    mix of sequential counters — exactly the job it has in murmur3.
    Plain uint32 shifts/xors/multiplies, so it lowers identically through
    Mosaic (VPU), XLA, and the Pallas interpreter; statistical quality is
    far beyond what additive dither needs."""
    h = (h ^ (h >> 16)) * jnp.uint32(0x85EBCA6B)
    h = (h ^ (h >> 13)) * jnp.uint32(0xC2B2AE35)
    return h ^ (h >> 16)


def _u24(seed: jnp.ndarray, counter: jnp.ndarray) -> jnp.ndarray:
    """Top 24 hash bits as f32 in [0, 2^24) — via int32, because Mosaic
    has no u32->f32 cast (the value fits in 24 bits, so it is exact)."""
    bits = _fmix32(seed ^ counter)
    return jax.lax.bitcast_convert_type(bits >> 8, jnp.int32).astype(
        jnp.float32)


def hash_normal_pair(seed: jnp.ndarray, counter: jnp.ndarray, span: int):
    """TWO independent standard-normal arrays at `counter` positions:
    one Box-Muller transform over two 24-bit counter-hash uniforms,
    using BOTH outputs (r·cos and r·sin are independent by
    construction) — halving draws and transcendentals vs the textbook
    single-output loop.  ``span`` must upper-bound the counter range so
    the second uniform's counters (counter + span) stay disjoint.
    Traceable everywhere (Mosaic kernel, XLA, interpreter)."""
    u1 = (_u24(seed, counter) + 1.0) * _INV_2_24  # (0, 1]: log-safe
    ang = (_TWO_PI * _INV_2_24) * _u24(seed, counter + jnp.uint32(span))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(ang), r * jnp.sin(ang)


def hash_normal(seed: jnp.ndarray, counter: jnp.ndarray,
                span: int) -> jnp.ndarray:
    """Single standard-normal array (first Box-Muller output)."""
    return hash_normal_pair(seed, counter, span)[0]


def utt_seed(utt_id: str, base_seed: int = 0) -> int:
    """Stable 31-bit seed for an utterance: md5 of the id mixed with the
    corpus-level base seed (no PYTHONHASHSEED dependence)."""
    h = hashlib.md5(f"{base_seed}:{utt_id}".encode()).digest()
    return int.from_bytes(h[:4], "little") & 0x7FFFFFFF


def utt_seeds(utt_ids: Sequence[str], base_seed: int = 0,
              key: Optional[jax.Array] = None) -> np.ndarray:
    """(B,) int32 per-utterance dither seeds.  ``key`` (optional) salts
    the whole corpus — the analog of compute-mfcc-feats' srand(seed) —
    while per-utterance stability within one (key, config) is kept."""
    salt = base_seed
    if key is not None:
        salt ^= int(jax.random.randint(key, (), 0, np.iinfo(np.int32).max))
    return np.asarray([utt_seed(u, salt) for u in utt_ids], np.int32)
