"""Self-critical sequence training (SCST) with CIDEr rewards.

Parity: reference engine/caption_engine.py:388-492 (train_sc).

Per batch:
1. beam-search sample ``beam_size`` captions per image (out_size = beam size);
2. decode + PTB-tokenize on host, CIDEr-D reward per sampled caption against
   the image's reference captions (caption_engine.py:432-437);
3. baseline = per-image mean reward over the beam (:438);
4. loss = -mean_t(log p(w_t)) * (reward - baseline), averaged over B*beam (:439-441);
5. Adam step with fixed sc_lr / sc_backbone_lr (no scheduler in SC phases).

TPU split of the loop: generation and the gradient step are two separate
jitted programs with the host reward computation in between (the reference
has the same device->host->device round trip, :432-437).  Instead of
differentiating through the 20-step beam-search scan, the update step
re-scores the sampled sequences with ONE teacher-forced forward — the same
log-probs the search produced (post-EOS steps zeroed, matching
``word_logprob * seq_mask``), with a far cheaper backward.  The reference
runs beam search under live dropout and backprops through that exact noise;
re-scoring draws fresh dropout noise — both are unbiased REINFORCE
estimators of the same objective.

The host metric work (tokenize + CIDEr) overlaps the next batch's device
generation when driven by ``grit_tpu.engine.loops`` (async dispatch).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from grit_tpu.decoding.beam_search import beam_search
from grit_tpu.engine.optim import apply_lr
from grit_tpu.engine.xe import TrainState


def make_generate_step(
    model,
    *,
    beam_size: int,
    max_len: int,
    bos_idx: int,
    eos_idx: int,
) -> Callable:
    """Jitted SCST sampler: (params, samples, batch_size) -> sequences [B, beam, T]."""

    def generate(params, samples, batch_size: int, rng=None):
        rngs = {"dropout": rng} if rng is not None else {}
        deterministic = rng is None
        vis = model.apply(
            params, samples, method="compute_vis",
            deterministic=deterministic, rngs=rngs,
        )
        kv = model.apply(params, vis, method="precompute_vis_kv")

        def decode_fn(token, t, vis_in, cache):
            return model.apply(
                params, token, t, vis_in["feat"], cache, method="decode_step",
                deterministic=deterministic, rngs=rngs, vis_kv=vis_in["kv"],
                vis_fold=beam_size,
            )

        cache = model.apply(params, batch_size * beam_size, max_len, method="init_cache")
        res = beam_search(
            decode_fn, cache, {"feat": vis, "kv": kv}, batch_size, beam_size,
            max_len, bos_idx, eos_idx, out_size=beam_size, tile_vis=False,
        )
        return res.sequences, res.log_probs

    return jax.jit(generate, static_argnums=(2,))


def sequence_log_probs(
    model, params, samples, sequences: jnp.ndarray,
    *, bos_idx: int, eos_idx: int, rng=None,
):
    """Teacher-forced per-step log-probs of sampled sequences [B, beam, T].

    Position t is scored given prefix [BOS, w_0..w_{t-1}]; steps after the
    first EOS contribute 0 (the reference's seq_mask zeroing,
    transformer.py:216-217).
    """
    b, k, t_len = sequences.shape
    flat = sequences.reshape(b * k, t_len)
    inputs = jnp.concatenate(
        [jnp.full((b * k, 1), bos_idx, flat.dtype), flat[:, :-1]], axis=1
    )
    rngs = {"dropout": rng} if rng is not None else {}
    deterministic = rng is None

    vis = model.apply(
        params, samples, method="compute_vis", deterministic=deterministic, rngs=rngs
    )
    vis = jax.tree.map(
        lambda x: jnp.repeat(x, k, axis=0) if hasattr(x, "ndim") and x.ndim > 0 else x,
        vis,
    )
    # score against the processed features directly — __call__(dict, seq)
    # would re-run grid_net (it treats dicts as raw cached detector features)
    out = model.apply(
        params, vis, inputs, method="score_tokens",
        deterministic=deterministic, rngs=rngs,
    )  # [B*k, T, V]
    logp = jnp.take_along_axis(out, flat[..., None], axis=-1)[..., 0]  # [B*k, T]

    # mask: include position t iff no EOS among w_0..w_{t-1}
    seen_eos = jnp.cumsum((flat == eos_idx).astype(jnp.int32), axis=1)
    prev_eos = jnp.concatenate(
        [jnp.zeros((b * k, 1), jnp.int32), seen_eos[:, :-1]], axis=1
    )
    mask = (prev_eos == 0).astype(logp.dtype)
    return (logp * mask).reshape(b, k, t_len)


def make_scst_update_step(
    model,
    tx: optax.GradientTransformation,
    labels: Any,
    *,
    bos_idx: int,
    eos_idx: int,
    model_lr: float,
    backbone_lr: float,
    freeze: Optional[Any] = None,
) -> Callable:
    """Jitted SCST gradient step.

    (state, samples, sequences [B,beam,T], rewards [B,beam], n_valid, rng)
      -> (state, metrics)

    ``n_valid`` is the true image count: ragged batches arrive zero-padded
    to the data-axis multiple (parallel/mesh.py ``shard_batch``), and the
    padded rows carry reward 0 = baseline 0 so their advantage vanishes —
    normalizing by ``n_valid * beam`` instead of ``.mean()`` makes the loss
    and gradient exactly the true-batch ones.
    """

    def step(state: TrainState, samples, sequences, rewards, n_valid, rng):
        def loss_fn(params):
            logp = sequence_log_probs(
                model, params, samples, sequences,
                bos_idx=bos_idx, eos_idx=eos_idx, rng=rng,
            )  # [B, beam, T]
            mean_logp = logp.mean(-1)  # mean over max_len incl. zeros (ref :439)
            baseline = rewards.mean(-1, keepdims=True)
            denom = n_valid * rewards.shape[-1]
            loss = (-mean_logp * (rewards - baseline)).sum() / denom
            return loss, (rewards.sum() / denom, baseline.sum() * rewards.shape[-1] / denom)

        (loss, (rew, base)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = apply_lr(updates, labels, model_lr, backbone_lr, freeze)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.global_steps)
        return new_state, {"loss": loss, "reward": rew, "reward_baseline": base}

    return jax.jit(step, donate_argnums=(0,))
