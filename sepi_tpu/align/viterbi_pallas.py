"""Batched banded Viterbi as a Pallas TPU kernel.

Corpus-scale forced alignment is the one hot op here that XLA handles
poorly: `lax.scan` over T time steps pays the XLA while-loop's
per-iteration latency for a few VPU ops of real work, leaving the chip
mostly idle.  This kernel runs the whole batch in ONE program:

- the batch x state matrix (B, S) fills VPU lanes and lives in VMEM
  scratch that persists across grid steps,
- the grid walks *time blocks*, so Pallas's pipeline machinery
  double-buffers the emission reads and backpointer writes against HBM
  automatically,
- the banded recursion (every predecessor is {s, s-1, s-skip} in the
  linear alignment graph) is three `pltpu.roll` shifts + max — no
  gathers; wrap-around is masked by the -inf transitions.

Layout: emissions are time-major (T, B, S) so a time block is one
contiguous (BLK, B, S) tile.  Outputs match align.mono._viterbi /
viterbi_batch_reference bit-for-bit (tests/test_align.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_BLK = 256  # max time-block; shrunk adaptively so tiles fit VMEM


def _pick_blk(b: int, s: int, bp_bytes: int = 4,
              budget_bytes: int = 7 << 20) -> int:
    """Largest power-of-two time block fitting the VMEM budget.

    Both the (blk, B, S) emission tile (f32 in) and the backpointer tile
    (bp_bytes out) are double-buffered by the pipeline, so the resident
    VMEM is ~2*blk*B*S*(4+bp_bytes); at tied-senone scale (S=512+) an
    unbudgeted 256-step block exceeds the ~16 MB scoped VMEM and Mosaic
    fails to compile.  Counting the bp tile (r2 fix) keeps bp32 at
    S=512 compiling (blk 64) while int8 backpointers earn blk 128."""
    blk = _BLK
    while blk > 8 and blk * b * s * (4 + bp_bytes) > budget_bytes:
        blk //= 2
    return blk


def _make_kernel(skip: int, blk_len: int, bp_dtype, unroll: int):
    def kernel(emit_ref, trans_ref, tlen_ref, bp_ref, delta_out_ref, delta_ref):
        blk = pl.program_id(0)
        _blk_len = blk_len
        b, s = delta_ref.shape

        t0 = trans_ref[0]
        t1 = trans_ref[1]
        t2 = trans_ref[2]
        tl = tlen_ref[:]  # (B, S) per-utt lengths broadcast over lanes

        @pl.when(blk == 0)
        def _():
            col = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
            delta_ref[:] = jnp.where(col == 0, emit_ref[0], _NEG)

        def body(j, _):
            t = blk * _blk_len + j
            d = delta_ref[:]  # (B, S)
            c0 = d + t0
            c1 = pltpu.roll(d, 1, axis=1) + t1
            c2 = pltpu.roll(d, skip, axis=1) + t2
            best = jnp.maximum(jnp.maximum(c0, c1), c2)
            # argmax tie-breaking: first maximum wins (match jnp.argmax)
            bp = jnp.where(c0 >= jnp.maximum(c1, c2), 0, jnp.where(c1 >= c2, 1, 2))
            # t == 0 is the init frame (delta set above, bp row unused)
            live = (t >= 1) & (t < tl)
            # leading (time) dim of a 3D ref is untiled: dynamic row
            # indexing is legal there, unlike sublane rows of a 2D ref
            bp_ref[j] = jnp.where(live, bp, 0).astype(bp_dtype)
            delta_ref[:] = jnp.where(live, best + emit_ref[j], d)
            return 0

        jax.lax.fori_loop(0, _blk_len, body, 0, unroll=unroll)

        @pl.when(blk == pl.num_programs(0) - 1)
        def _():
            delta_out_ref[:] = delta_ref[:]

    return kernel


@partial(jax.jit, static_argnames=("skip", "interpret", "bp_bits", "unroll"))
def viterbi_batch(
    state_emit: jnp.ndarray,  # (B, T, S) per-state log emissions
    t_len: jnp.ndarray,  # (B,) true frame counts
    trans: jnp.ndarray,  # (B, 3, S) transition log-probs per arc kind
    skip: int = 4,
    interpret: bool = False,
    bp_bits: int | None = None,
    unroll: int | None = None,
):
    """Returns (bps (B, T-1, S) int8, delta (B, S) final scores).

    ``bp_bits`` (None = auto): backpointer HBM width.  int8 quarters the
    write traffic and VMEM tile, buying a deeper pipeline at large S
    (v5e, B=16 T=2048 S=512: 0.90 vs FAIL-to-compile us/step), but its
    (32, 128) tiling wastes lanes when S pads badly (S=144: 1.21 vs
    1.04), so auto picks int8 only when S fills lane tiles.
    ``unroll`` (None = full): Mosaic supports only unroll=1 or the full
    block; full unrolling removes the loop-carried overhead (v5e:
    S=512 1.84 -> 1.61 ms, S=144 2.13 -> 1.99 ms at B=16 T=2048).
    """
    b, t, s = state_emit.shape
    s_real = s
    if s % 128:
        # Lane-align the state axis with dead (-inf) states: Mosaic fails
        # to compile some non-128-multiple (B, S) roll tiles (B=32, S=144
        # reproducibly crashes the TPU compiler), and VMEM pads lanes to
        # 128 anyway so the explicit pad costs nothing extra.  Dead
        # states stay -inf forever (-inf transitions in their lanes and
        # into lane 0's wrap), so outputs sliced back to S are exact.
        pad = 128 - s % 128
        state_emit = jnp.pad(state_emit, ((0, 0), (0, 0), (0, pad)),
                             constant_values=_NEG)
        trans = jnp.pad(trans, ((0, 0), (0, 0), (0, pad)),
                        constant_values=_NEG)
        s += pad
    if bp_bits is None:
        bp_bits = 8 if s >= 256 else 32
    blk_len = _pick_blk(b, s, bp_bytes=bp_bits // 8)
    if unroll is None:
        # interpret mode (CPU tests) would pay blk_len x trace time
        unroll = 1 if interpret else blk_len
    t_pad = -(-t // blk_len) * blk_len
    # time-major so each grid step reads one contiguous (BLK, B, S) tile
    emit_tm = jnp.moveaxis(state_emit, 1, 0)  # (T, B, S)
    if t_pad != t:
        emit_tm = jnp.pad(emit_tm, ((0, t_pad - t), (0, 0), (0, 0)))
    trans_bm = jnp.moveaxis(trans, 1, 0)  # (3, B, S)
    tlen2d = jnp.broadcast_to(t_len.astype(jnp.int32)[:, None], (b, s))
    n_blocks = t_pad // blk_len

    bp_dtype = {32: jnp.int32, 8: jnp.int8}[bp_bits]
    bps_tm, delta = pl.pallas_call(
        _make_kernel(skip, blk_len, bp_dtype, unroll),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((blk_len, b, s), lambda i: (i, 0, 0)),
            pl.BlockSpec((3, b, s), lambda i: (0, 0, 0)),
            pl.BlockSpec((b, s), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((blk_len, b, s), lambda i: (i, 0, 0)),
            pl.BlockSpec((b, s), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, b, s), bp_dtype),
            jax.ShapeDtypeStruct((b, s), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b, s), jnp.float32)],
        interpret=interpret,
    )(emit_tm, trans_bm, tlen2d)
    # bp row t holds the backpointer for step t; row 0 is unused
    bps = jnp.moveaxis(bps_tm[1:t, :, :s_real], 0, 1).astype(jnp.int8)
    return bps, delta[:, :s_real]  # (B, T-1, S), (B, S)


def viterbi_batch_reference(state_emit, t_len, trans, skip=4):
    """The lax.scan equivalent (same math) for cross-checking/fallback."""
    b, t, s = state_emit.shape
    neg1 = jnp.full((b, 1), _NEG)
    negk = jnp.full((b, skip), _NEG)

    init = jnp.full((b, s), _NEG).at[:, 0].set(state_emit[:, 0, 0])

    def scan_fn(carry, xs):
        delta, tt = carry
        emit_t, = xs  # (B, S)
        c0 = delta + trans[:, 0]
        c1 = jnp.concatenate([neg1, delta[:, :-1]], axis=1) + trans[:, 1]
        c2 = jnp.concatenate([negk, delta[:, :-skip]], axis=1) + trans[:, 2]
        cand = jnp.stack([c0, c1, c2], axis=2)
        best = jnp.max(cand, axis=2)
        bp = jnp.argmax(cand, axis=2).astype(jnp.int8)
        keep = (tt < t_len)[:, None]
        delta = jnp.where(keep, best + emit_t, delta)
        bp = jnp.where(keep, bp, jnp.zeros_like(bp))
        return (delta, tt + 1), bp

    (delta, _), bps = jax.lax.scan(
        scan_fn, (init, jnp.ones((), jnp.int32)),
        (jnp.moveaxis(state_emit[:, 1:], 1, 0),),
    )
    return jnp.moveaxis(bps, 0, 1), delta
