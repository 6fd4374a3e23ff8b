"""Optimizers and LR schedule for caption training.

Parity notes (reference engine/caption_engine.py:18-73, utils/cap_scheduler.py):

- TWO Adam groups split on whether the parameter path contains ``detector``
  ("model" vs "backbone"); betas (0.9, 0.99); separate LRs per phase
  (xe_lr / xe_backbone_lr, sc_lr / sc_backbone_lr).
- The reference passes ``weight_decay_rate`` to torch Adam — a key Adam
  ignores, so NO weight decay is ever applied.  We replicate that default
  (``weight_decay=0``) and expose a working decay knob for new runs.
- The cosine schedule with 1-epoch linear warmup applies to the **model**
  group only; the backbone group keeps a fixed LR (train_xe asserts only the
  model optimizer's LR, caption_engine.py:348-350).
- Scheduler quirk preserved: ``scheduler.step()`` runs once at epoch start
  AND once per iteration (caption_engine.py:325-326,348), with a
  pre-incremented counter.  ``cosine_lr_schedule`` is a pure function of
  ``global_steps``, so the training loop reproduces the exact tick sequence
  by managing the counter itself.

The learning rate is applied *inside the train step* (``apply_lr``) from the
traced ``global_steps`` — the Adam moments transform itself is LR-free, so
phase changes (xe -> sc) just swap the scalar LRs without rebuilding state.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


def split_param_labels(params: Any) -> Any:
    """Label each param 'backbone' if its path contains 'detector', else 'model'.

    (The reference's "backbone" optimizer is the whole detector subtree —
    Swin AND deformable decoder; caption_engine.py:40-55.)

    The caption generator's ``pos_emb`` table is labelled 'frozen': the
    reference registers it with ``freeze=True`` (requires_grad=False,
    cap_generator.py:111), so it must never receive updates — it is a
    loadable parameter only because released checkpoints carry a
    xavier-clobbered table (see models/cap_generator.py setup).
    """

    def label(path, _leaf):
        parts = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
        if parts and parts[-1] == "pos_emb":
            return "frozen"
        return "backbone" if any("detector" in s for s in parts) else "model"

    return jax.tree_util.tree_map_with_path(label, params)


def frozen_mask(params: Any, frozen_predicate) -> Any:
    """Bool pytree: True where the param path matches ``frozen_predicate``.

    Mirrors ``requires_grad=False`` freezing by name substring
    (train_caption.py:48-57 — e.g. ``lambda p: 'backbone' in p``).
    """

    def mask(path, _leaf):
        parts = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
        return bool(frozen_predicate("/".join(parts)))

    return jax.tree_util.tree_map_with_path(mask, params)


def swin_frozen_stages_predicate(frozen_stages: int):
    """Param-path predicate for the reference's Swin stage freezing.

    Reference ``_freeze_stages`` (swin_model.py:622-637) with
    ``coco_config.yaml:29`` (frozen_stages=2): ``fs >= 0`` freezes the patch
    embed; ``fs >= 2`` freezes stages ``0 .. fs-2`` (GRIT's loop is
    ``range(0, fs - 1)`` — one stage fewer than stock mmdet Swin).  Matches
    paths under the captioner's ``detector/backbone`` subtree (our Swin
    names: ``patch_embed_proj``, ``patch_embed_norm``, ``layers_{i}``).
    """

    def pred(path: str) -> bool:
        if "backbone" not in path:
            return False
        wrapped = "/" + path + "/"
        if frozen_stages >= 0 and "patch_embed" in path:
            return True
        return any(
            f"/layers_{i}/" in wrapped for i in range(max(0, frozen_stages - 1))
        )

    return pred


def cosine_lr_schedule(
    global_steps,
    *,
    num_epochs: int,
    num_its_per_epoch: int,
    init_lr: float,
    min_lr: float,
    warmup_init_lr: float,
    warmup_factor: float = 0.1,
    warmup_epochs: int = 1,
):
    """Pure-fn port of CosineLRScheduler.step (utils/cap_scheduler.py:28-59)."""
    gs = jnp.asarray(global_steps, jnp.float32)
    cur_epoch_f = gs / num_its_per_epoch
    alpha = cur_epoch_f / warmup_epochs
    warm = (init_lr - warmup_init_lr) * (warmup_factor * (1.0 - alpha) + alpha) + warmup_init_lr
    total = num_epochs * num_its_per_epoch
    cos = (init_lr - min_lr) * (1 + jnp.cos(jnp.pi * gs / total)) / 2 + min_lr
    cos = jnp.maximum(min_lr, cos)
    in_warmup = (gs.astype(jnp.int32) // num_its_per_epoch) < 1
    return jnp.where(in_warmup, warm, cos)


def build_optimizer(
    params: Any,
    *,
    beta_1: float = 0.9,
    beta_2: float = 0.99,
    weight_decay: float = 0.0,
) -> tuple[optax.GradientTransformation, Any]:
    """LR-free Adam-moments transform + param labels ('model'/'backbone').

    GRIT_FUSED_ADAM=xla|pallas swaps in the flat single-pass moments update
    (ops/fused_adam.py — bit-identical math, one pass over memory instead
    of 3 fusions per leaf); f32-only, so mixed-dtype trees keep optax.
    """
    from grit_tpu.ops.fused_adam import fused_adam_impl, scale_by_adam_flat

    labels = split_param_labels(params)
    impl = fused_adam_impl()
    all_f32 = all(
        jnp.asarray(p).dtype == jnp.float32 for p in jax.tree.leaves(params)
    )
    if impl != "off" and all_f32:
        adam = scale_by_adam_flat(b1=beta_1, b2=beta_2, impl=impl)
    else:
        adam = optax.scale_by_adam(b1=beta_1, b2=beta_2)
    txs = [adam]
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    return optax.chain(*txs), labels


def detector_param_labels(params: Any, sp_names=()) -> Any:
    """5-way detector param grouping (reference train_detector.py:24-69).

    The reference builds one AdamW over four ``param_dicts`` plus an optional
    special AdamW for params whose dotted name contains any of
    ``config.optimizer.sp_names``:

    - ``sp``                 name contains an sp_names entry (default
                             ``['attr_head']``) — separate optimizer, sp_lr,
                             full weight decay, own MultiStepLR;
    - ``head``               non-backbone, decayed (lr, weight_decay);
    - ``det_no_decay``       non-backbone, ndim==1 or name ends '.bias'
                             (wd=0, lr);
    - ``backbone_no_decay``  backbone, same no-decay rule (wd=0, lr_backbone);
    - ``backbone_decay``     backbone (lr_backbone, weight_decay).

    The reference also exempts names whose LAST dotted component is in a
    ``skip`` list (default ``['query_embed']``, train_detector.py:26-28) —
    dead in practice: ``query_embed`` is an ``nn.Embedding`` so its param is
    ``query_embed.weight`` (last component ``weight``), and the Swin backbone
    defines no ``no_weight_decay()``.  We therefore replicate only the live
    rules; ``query_embed`` lands in ``head`` exactly as it does upstream.
    """
    sp_names = tuple(sp_names)

    def label(path, leaf):
        parts = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
        name = "/".join(parts)
        if sp_names and any(ns in name for ns in sp_names):
            return "sp"
        no_decay = len(jnp.shape(leaf)) <= 1 or parts[-1] == "bias"
        if "backbone" in name:
            return "backbone_no_decay" if no_decay else "backbone_decay"
        return "det_no_decay" if no_decay else "head"

    return jax.tree_util.tree_map_with_path(label, params)


def apply_detector_lr(
    updates: Any,
    params: Any,
    labels: Any,
    *,
    lr,
    lr_backbone,
    sp_lr,
    weight_decay: float,
    lr_scale,
    sp_lr_scale,
    freeze: Optional[Any] = None,
) -> Any:
    """Per-group AdamW update: ``-lr_g * (adam_update + wd_g * param)``.

    torch AdamW decoupled decay (the reference's optimizer): the decay is
    scaled by the group's (scheduled) lr, and the no-decay groups get wd=0.
    ``lr_scale`` applies to the four main groups (MultiStepLR over
    lr_drop_epochs); ``sp_lr_scale`` to the sp group (sp_lr_drop_epochs).

    ``freeze``: bool pytree — True leaves get a ZERO update.  The reference
    builds its param groups over ``requires_grad`` params only
    (train_detector.py:37-48), so frozen Swin stages receive neither Adam
    updates nor weight decay; zeroing reproduces that exactly (the grads are
    already zero through stop_gradient, but decoupled decay would otherwise
    still shrink frozen weights).
    """
    group_lr = {
        "head": lr * lr_scale,
        "det_no_decay": lr * lr_scale,
        "backbone_no_decay": lr_backbone * lr_scale,
        "backbone_decay": lr_backbone * lr_scale,
        "sp": sp_lr * sp_lr_scale,
    }
    group_wd = {
        "head": weight_decay,
        "det_no_decay": 0.0,
        "backbone_no_decay": 0.0,
        "backbone_decay": weight_decay,
        "sp": weight_decay,
    }

    def scale(u, p, lab, fr=False):
        out = -group_lr[lab] * (u + group_wd[lab] * p)
        if fr is True:
            out = jnp.zeros_like(u)
        return out

    if freeze is None:
        return jax.tree.map(scale, updates, params, labels)
    return jax.tree.map(scale, updates, params, labels, freeze)


def apply_lr(updates: Any, labels: Any, model_lr, backbone_lr, freeze=None) -> Any:
    """Scale Adam updates by the per-group (possibly traced) learning rates.

    ``freeze``: optional bool pytree — True leaves get zero update (the
    reference's requires_grad freezing).
    """

    def scale(u, lab, fr=False):
        lr = model_lr if lab == "model" else backbone_lr
        out = -lr * u
        if fr is True or lab == "frozen":
            out = jnp.zeros_like(u)
        return out

    if freeze is None:
        return jax.tree.map(scale, updates, labels)
    return jax.tree.map(scale, updates, labels, freeze)
