"""Batched beam search as a single ``lax.scan`` with fixed shapes.

Decision-parity with the reference beam search (models/caption/transformer.py:75-254):

- timestep 0 expands from one beam: we tile features up-front but initialize
  ``seq_logprob`` to 0 for beam 0 and -inf for the rest, so the first top-k
  necessarily selects beam 0's top-``beam`` words — identical to the
  reference's ``cur_beam_size=1`` special case (:205);
- EOS freeze masking (:211-220): once a beam selects EOS its per-step word
  log-probs are zeroed and its candidate row becomes
  ``[seq_logprob, -999, -999, ...]`` so the beam persists unchanged and all
  post-EOS picks are token 0 (``<unk>`` — stripped at decode time);
- selection = top-``beam`` over the flattened ``beam x V`` candidates (:184-188);
- state reordering: the reference gathers every stateful buffer by
  ``selected_beam`` each step (:229, containers.py:37-42).  We instead gather
  the fixed-shape KV caches inside the scan and recover token sequences and
  per-step log-probs by parent-pointer backtracking afterwards — an
  equivalent but cheaper formulation (no per-step reordering of grown lists);
- final beams sorted by total log-prob, truncated to ``out_size`` (:108-127).

The per-step callable is the model's single-token ``decode_step`` under
``model.apply`` — everything stays on device; one compile per
(batch, beam, max_len) shape.
"""

from __future__ import annotations

import os
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")

# Cache-reorder implementation for the per-step parent-beam gather:
# take_along_axis (default) vs a one-hot matmul (rides the MXU; exact for
# 0/1 weights — picks single values, no summation error).  Chip A/B flag.
_MM_GATHER = os.environ.get("GRIT_BEAM_MM_GATHER", "0") == "1"

# Early-exit decode: run the decode loop as a ``lax.while_loop`` that stops
# as soon as EVERY beam of EVERY image in the batch is EOS-frozen, instead
# of a fixed ``max_len``-step scan.  Decision-identical by construction:
# a step entered with all beams frozen can only (a) stable-sort the beams
# by ``seq_logprob`` (candidate rows are ``[seq_logprob, -999, ...]``) and
# (b) append token 0 with word log-prob 0 — and the final
# ``argsort(-scores)`` applies exactly that stable sort, so skipping the
# step and leaving identity parent pointers yields bit-identical sequences,
# log-probs, and sorted scores (see the equivalence note at ``step``).
# Typical COCO captions finish in 10-12 of the 20 steps.
_EARLY_EXIT = os.environ.get("GRIT_DECODE_EARLY_EXIT", "1") == "1"


class BeamResult(NamedTuple):
    sequences: jnp.ndarray   # int32 [B, out_size, max_len]
    log_probs: jnp.ndarray   # float [B, out_size, max_len] per-step word log-probs
    scores: jnp.ndarray      # float [B, out_size] total sequence log-prob
    all_log_probs: jnp.ndarray | None = None  # [B, out_size, max_len, V] if requested


def _tile_beam(tree, beam: int):
    """[B, ...] -> [B*beam, ...] (repeat each row beam times)."""
    def tile(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        return jnp.repeat(x, beam, axis=0)
    return jax.tree.map(tile, tree)


def beam_search(
    decode_step: Callable,
    init_cache,
    vis_inputs,
    batch_size: int,
    beam_size: int,
    max_len: int,
    bos_idx: int,
    eos_idx: int,
    out_size: int = 1,
    return_all_probs: bool = False,
    tile_vis: bool = True,
):
    """Run beam search.

    decode_step(token [BB,1], t, vis, cache) -> (log_probs [BB, V], cache).
    ``vis_inputs``/``init_cache`` are per-image ([B, ...] / [B*beam, ...]).

    ``tile_vis=False`` hands ``vis_inputs`` to ``decode_step`` UNtiled
    ([B, ...]): the step callable must fold the beam dimension itself
    (``decode_step(..., vis_fold=beam)`` — attention.py ``kv_fold``).  This
    keeps the loop-invariant visual K/V per-image instead of beam-tiled:
    at b128/k5 the tiled K/V re-materialized ~50 ms of broadcast/layout
    copies inside the decode scan.
    """
    b, k = batch_size, beam_size
    vis = _tile_beam(vis_inputs, k) if tile_vis else vis_inputs

    seq_logprob0 = jnp.full((b, k), NEG_INF).at[:, 0].set(0.0)
    state0 = {
        "cache": init_cache,
        "seq_logprob": seq_logprob0,       # [B, K]
        "seq_mask": jnp.ones((b, k)),      # [B, K] 1 until beam hits EOS
        "prev_words": jnp.full((b, k), bos_idx, jnp.int32),
        "t": jnp.asarray(0, jnp.int32),
    }

    def step(state, _):
        t = state["t"]
        token = state["prev_words"].reshape(b * k, 1)
        word_logprob, cache = decode_step(token, t, vis, state["cache"])
        v = word_logprob.shape[-1]
        word_logprob = word_logprob.reshape(b, k, v)

        seq_logprob = state["seq_logprob"]
        seq_mask = state["seq_mask"]

        # EOS freeze masking (skipped at t=0 where prev_words are BOS)
        is_cont = (state["prev_words"] != eos_idx).astype(seq_mask.dtype)
        seq_mask = jnp.where(t > 0, seq_mask * is_cont, seq_mask)
        word_logprob_m = word_logprob * seq_mask[..., None]
        candidate = seq_logprob[..., None] + word_logprob_m
        frozen = jnp.concatenate(
            [seq_logprob[..., None], jnp.full((b, k, v - 1), -999.0)], axis=-1
        )
        candidate = jnp.where(seq_mask[..., None] > 0, candidate, frozen)

        selected_logprob, selected_idx = jax.lax.top_k(candidate.reshape(b, k * v), k)
        selected_beam = selected_idx // v          # [B, K]
        selected_words = (selected_idx % v).astype(jnp.int32)

        # reorder beam-dependent state by the selected parent beam
        if _MM_GATHER:
            onehot = jax.nn.one_hot(selected_beam, k)  # [B, K, K] f32

            def gather_beams(x):
                y = x.reshape(b, k, -1)
                g = jax.lax.dot_general(
                    onehot.astype(x.dtype), y,
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [B, K, prod(rest)]; 0/1 weights pick rows exactly
                return g.astype(x.dtype).reshape(b * k, *x.shape[1:])
        else:
            def gather_beams(x):
                y = x.reshape(b, k, *x.shape[1:])
                idx = selected_beam.reshape(b, k, *([1] * (y.ndim - 2)))
                return jnp.take_along_axis(y, idx, axis=1).reshape(b * k, *x.shape[1:])

        cache = jax.tree.map(gather_beams, cache)
        seq_mask = jnp.take_along_axis(seq_mask, selected_beam, axis=1)
        this_word_logprob = jnp.take_along_axis(
            jnp.take_along_axis(word_logprob_m, selected_beam[..., None], axis=1),
            selected_words[..., None], axis=2,
        )[..., 0]  # [B, K]

        new_state = {
            "cache": cache,
            "seq_logprob": selected_logprob,
            "seq_mask": seq_mask,
            "prev_words": selected_words,
            "t": t + 1,
        }
        per_step = {
            "words": selected_words,
            "parents": selected_beam,
            "wlogp": this_word_logprob,
        }
        if return_all_probs:
            per_step["all_logp"] = jnp.take_along_axis(
                word_logprob, selected_beam[..., None], axis=1
            )
        return new_state, per_step

    # Frozen steps record live model log-probs into ``all_logp`` — not
    # reconstructible without running the model — so ``return_all_probs``
    # keeps the full-length scan.
    if _EARLY_EXIT and not return_all_probs:
        # Preallocated [T, ...] records, filled per executed step; skipped
        # (all-frozen) steps keep the fill values — word 0, word log-prob 0,
        # identity parents — which is exactly what an executed frozen step
        # records, modulo the beam sort the final argsort reapplies.
        ps = jax.eval_shape(step, state0, None)[1]
        bufs0 = {
            "words": jnp.zeros((max_len, b, k), ps["words"].dtype),
            "parents": jnp.zeros((max_len, b, k), ps["parents"].dtype)
            + jnp.arange(k, dtype=ps["parents"].dtype),
            "wlogp": jnp.zeros((max_len, b, k), ps["wlogp"].dtype),
        }

        def cond_fn(carry):
            state, _ = carry
            alive = (state["seq_mask"] > 0) & (state["prev_words"] != eos_idx)
            # A frozen beam with total log-prob <= -999 CAN still be evicted
            # by a -999 candidate under the scan's tie-break order — keep
            # stepping in that (pathological) case so the two formulations
            # stay bit-identical unconditionally.
            evictable = state["seq_logprob"] <= -999.0
            return (state["t"] < max_len) & (jnp.any(alive) | jnp.any(evictable))

        def body_fn(carry):
            state, bufs = carry
            t = state["t"]
            new_state, per_step = step(state, None)
            bufs = {name: buf.at[t].set(per_step[name]) for name, buf in bufs.items()}
            return new_state, bufs

        final_state, steps = jax.lax.while_loop(cond_fn, body_fn, (state0, bufs0))
    else:
        final_state, steps = jax.lax.scan(step, state0, None, length=max_len)

    # ---- backtrace: recover per-beam token sequences & word log-probs -------
    def backtrace(carry, step_rec):
        beam_idx = carry  # [B, K] current beam index at step t+1 (child side)
        words = jnp.take_along_axis(step_rec["words"], beam_idx, axis=1)
        wlogp = jnp.take_along_axis(step_rec["wlogp"], beam_idx, axis=1)
        parent = jnp.take_along_axis(step_rec["parents"], beam_idx, axis=1)
        return parent, (words, wlogp)

    # int32 explicitly: under jax_enable_x64 a bare arange would be int64 and
    # mismatch the int32 parent pointers in the scan carry
    init_idx = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None], (b, k))
    _, (words_rev, wlogp_rev) = jax.lax.scan(
        backtrace, init_idx, steps, reverse=True
    )
    sequences = jnp.moveaxis(words_rev, 0, 2)   # [B, K, T]
    log_probs = jnp.moveaxis(wlogp_rev, 0, 2)   # [B, K, T]

    # ---- final sort by total log-prob, truncate to out_size -----------------
    scores = final_state["seq_logprob"]  # [B, K]
    order = jnp.argsort(-scores, axis=1)
    scores = jnp.take_along_axis(scores, order, axis=1)[:, :out_size]
    sequences = jnp.take_along_axis(sequences, order[..., None], axis=1)[:, :out_size]
    log_probs = jnp.take_along_axis(log_probs, order[..., None], axis=1)[:, :out_size]

    all_log_probs = None
    if return_all_probs:
        # [T, B, K, V] -> [B, K, T, V], sorted by final beam order
        alp = jnp.moveaxis(steps["all_logp"], 0, 2)
        all_log_probs = jnp.take_along_axis(
            alp, order[..., None, None], axis=1
        )[:, :out_size]
    return BeamResult(sequences, log_probs, scores, all_log_probs)


def greedy_search(
    decode_step: Callable,
    init_cache,
    vis_inputs,
    batch_size: int,
    max_len: int,
    bos_idx: int,
    eos_idx: int,
):
    """Greedy decode = beam 1; returns (sequences [B, T], log_probs [B, T])."""
    res = beam_search(
        decode_step, init_cache, vis_inputs, batch_size,
        beam_size=1, max_len=max_len, bos_idx=bos_idx, eos_idx=eos_idx, out_size=1,
    )
    return res.sequences[:, 0], res.log_probs[:, 0]
