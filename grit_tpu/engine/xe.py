"""Cross-entropy (XE) caption training step.

Parity: reference engine/caption_engine.py:312-385.

- loss = NLL of shifted targets with pad ignored: ``out[:, :-1]`` scored
  against ``captions[:, 1:]``, mean over non-pad tokens (NLLLoss
  ignore_index, caption_engine.py:324,334-336);
- cosine LR (model group) evaluated from the scheduler tick counter — the
  loop calls ``epoch_tick`` once per epoch to reproduce the reference's
  extra epoch-start ``scheduler.step()`` (caption_engine.py:325-326);
- backbone group uses a fixed LR;
- optional freeze mask (requires_grad parity).

One jitted step: forward, backward, Adam update.  Under a sharded batch the
gradient all-reduce over the ``data`` mesh axis is inserted by GSPMD — the
DDP equivalent with zero communication code.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from grit_tpu.engine.optim import apply_lr, cosine_lr_schedule


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    global_steps: jnp.ndarray  # scheduler tick counter (reference semantics)

    @staticmethod
    def create(params, tx) -> "TrainState":
        return TrainState(params, tx.init(params), jnp.asarray(0, jnp.int32))

    def epoch_tick(self) -> "TrainState":
        """The reference's extra scheduler.step() at epoch start."""
        return self._replace(global_steps=self.global_steps + 1)


def nll_loss(log_probs: jnp.ndarray, captions: jnp.ndarray, pad_idx: int):
    """Shifted NLL with pad ignored -> (loss, token_count)."""
    logp = log_probs[:, :-1]
    tgt = captions[:, 1:]
    ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    mask = (tgt != pad_idx).astype(ll.dtype)
    return -(ll * mask).sum() / jnp.maximum(mask.sum(), 1.0), mask.sum()


def make_xe_train_step(
    model,
    tx: optax.GradientTransformation,
    labels: Any,
    *,
    pad_idx: int,
    sched_cfg: dict,
    backbone_lr: float,
    freeze: Optional[Any] = None,
    donate: bool = True,
) -> Callable:
    """Build the jitted XE step: (state, batch, rng) -> (state, metrics).

    batch: {'samples': ImageBatch | vis dict, 'captions': int [B, L]}.
    """

    def step(state: TrainState, batch, rng):
        def loss_fn(params):
            out = model.apply(
                params, batch["samples"], batch["captions"],
                deterministic=False, rngs={"dropout": rng},
            )
            loss, _ = nll_loss(out, batch["captions"], pad_idx)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        lr = cosine_lr_schedule(state.global_steps, **sched_cfg)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = apply_lr(updates, labels, lr, backbone_lr, freeze)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.global_steps + 1)
        return new_state, {"loss": loss, "lr": lr}

    if donate:
        return jax.jit(step, donate_argnums=(0,))
    return jax.jit(step)


def make_eval_loss_step(model, *, pad_idx: int) -> Callable:
    """Jitted validation loss (caption_engine.py:287-309)."""

    @jax.jit
    def step(params, batch):
        out = model.apply(params, batch["samples"], batch["captions"])
        loss, _ = nll_loss(out, batch["captions"], pad_idx)
        return loss

    return step
