"""Detector training/validation solver with hooks.

Parity: reference engine/solver.py:11-102 (SolverBase epoch/step skeleton),
engine/det_solver.py (Trainer.on_step :56-125: forward, criterion, weighted
sum, grad clip, multi-group step, logging; Valider.run_epoch :230-273:
postprocess -> CocoEvaluator -> mAP summary).

TPU design: the whole on_step (forward + Hungarian host callback + losses +
backward + clip + Adam) is ONE jitted program; LR warmup/decay enter as a
traced scalar ``lr_scale`` so hook-driven schedules don't retrigger
compilation.  The reference's zero-init trick for unused heads
(det_solver.py:69-76) is unnecessary — jax grads are structurally complete.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from grit_tpu.engine.optim import apply_detector_lr, apply_lr
from grit_tpu.engine.xe import TrainState

#: labels produced by engine.optim.detector_param_labels — their presence
#: switches the step to the reference's 4-group + sp AdamW semantics
_DET_GROUPS = frozenset(
    {"head", "det_no_decay", "backbone_no_decay", "backbone_decay", "sp"}
)


def make_detector_train_step(
    model,
    criterion,
    tx,
    labels,
    *,
    lr: float,
    lr_backbone: float,
    clip_max_norm: float = 0.1,
    sp_lr: float = 0.0,
    weight_decay: float = 0.0,
    freeze: Optional[Any] = None,
) -> Callable:
    """(state, images, targets, lr_scale, rng) -> (state, metrics).

    ``lr_scale`` may be a scalar (applied to every group) or a length-2
    vector ``[main_scale, sp_scale]`` — the main MultiStepLR over
    lr_drop_epochs vs the sp-optimizer's over sp_lr_drop_epochs (reference
    train_detector.py:75-89).  With 5-way labels from
    ``detector_param_labels`` the update is the reference's AdamW: per-group
    lr (head/det_no_decay at lr, backbone groups at lr_backbone, sp at
    sp_lr) and decoupled weight decay only on head/backbone_decay/sp.
    """
    det_groups = _DET_GROUPS.issuperset(set(jax.tree.leaves(labels))) and bool(
        jax.tree.leaves(labels)
    )

    def step(state: TrainState, images, targets, lr_scale, rng):
        def loss_fn(params):
            outputs = model.apply(
                params, images, training=True, deterministic=False,
                rngs={"dropout": rng},
            )
            losses = criterion(outputs, targets)
            return criterion.total_loss(losses), losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if clip_max_norm:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, clip_max_norm / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        else:
            gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        scales = jnp.asarray(lr_scale, jnp.float32).reshape(-1)
        if det_groups:
            updates = apply_detector_lr(
                updates, state.params, labels,
                lr=lr, lr_backbone=lr_backbone, sp_lr=sp_lr,
                weight_decay=weight_decay,
                lr_scale=scales[0], sp_lr_scale=scales[-1],
                freeze=freeze,
            )
        else:
            updates = apply_lr(
                updates, labels, lr * scales[0], lr_backbone * scales[0]
            )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.global_steps + 1)
        metrics = {"loss": total, "grad_norm": gnorm}
        metrics.update({k: v for k, v in losses.items() if not k[-1].isdigit()})
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


class SolverBase:
    """Epoch/step skeleton executing hooks (reference solver.py:11-102)."""

    def __init__(self, hooks=()):
        self.hooks = list(hooks)
        self.epoch = 0
        self.global_step = 0
        self.step_in_epoch = 0
        self.steps_per_epoch = 0
        self.step_metrics: dict = {}
        self.epoch_results: dict = {}
        self.lr_scale = 1.0
        self.epoch_lr_scale = 1.0
        # sp-optimizer schedule (reference train_detector.py:79-88): the sp
        # group decays on its own sp_lr_drop_epochs, independent of the main
        # MultiStepLR — EpochLRHook(attr='sp_epoch_lr_scale') drives this
        self.sp_epoch_lr_scale = 1.0

    def call_hooks(self, name: str):
        for h in self.hooks:
            getattr(h, name)(self)


class Trainer(SolverBase):
    def __init__(self, step_fn, state, dataloader, *, rng, hooks=(), mesh=None,
                 validers=()):
        super().__init__(hooks)
        self.step_fn = step_fn
        self.state = state
        self.dataloader = dataloader
        self.rng = rng
        self.mesh = mesh
        # validers run INSIDE the epoch, before after_epoch hooks, so the
        # checkpoint topk-by-metric and text/scalar logs see THIS epoch's
        # eval results (reference det_solver.py:137-148 runs validers within
        # Trainer.run_epoch; its hooks consume epoch_res afterwards)
        self.validers = list(validers)

    def run_epoch(self, epoch: int):
        from grit_tpu.parallel.mesh import shard_batch

        self.epoch = epoch
        self.steps_per_epoch = len(self.dataloader)
        self.call_hooks("before_epoch")
        # epoch-keyed dropout stream: fold_in instead of a run-sequential
        # split chain, so a resumed run's epoch E draws the SAME step rngs
        # as an uninterrupted run's epoch E (bit-exact kill-and-resume)
        epoch_rng = jax.random.fold_in(self.rng, epoch)
        for it, batch in enumerate(self.dataloader):
            self.step_in_epoch = it
            self.call_hooks("before_step")
            epoch_rng, step_rng = jax.random.split(epoch_rng)
            images, targets = batch["samples"], batch["targets"]
            if self.mesh is not None:
                # detection TRAINING must never pad a ragged batch: a padded
                # zero image would add background focal-loss terms over all
                # of its queries (the criterion can't tell a fake image from
                # a real image with no ground truth).  The train loader drops
                # ragged tails (train_detector.py batches()); enforce it.
                n_data = self.mesh.shape.get("data", 1)
                b = jax.tree.leaves(images)[0].shape[0]
                if b % n_data:
                    raise ValueError(
                        f"detection train batch of {b} is not divisible by the "
                        f"data axis ({n_data}); use a loader that drops ragged "
                        "tails — padding would bias the focal loss"
                    )
                images = shard_batch(images, self.mesh)
                targets = shard_batch(targets, self.mesh)
            self.state, metrics = self.step_fn(
                self.state, images, targets,
                jnp.asarray(
                    [self.lr_scale * self.epoch_lr_scale,
                     self.lr_scale * self.sp_epoch_lr_scale],
                    jnp.float32,
                ),
                step_rng,
            )
            self.step_metrics = metrics
            self.global_step += 1
            self.call_hooks("after_step")
        # fresh results each epoch: an empty valider summary must NOT leave
        # the previous epoch's metrics visible to after_epoch hooks (the
        # BestCheckpointHook would score this epoch with stale mAP)
        self.epoch_results = {}
        for valider in self.validers:
            res = valider.run_epoch(epoch)
            if res:
                self.epoch_results = {**self.epoch_results, **res}
        self.call_hooks("after_epoch")
        return self.state


class Valider(SolverBase):
    def __init__(self, model, state_getter, dataloader, evaluator_factory, hooks=()):
        super().__init__(hooks)
        self.model = model
        self.state_getter = state_getter
        self.dataloader = dataloader
        self.evaluator_factory = evaluator_factory
        self._predict = jax.jit(
            lambda params, images: self.model.apply(params, images, training=False)
        )

    def run_epoch(self, epoch: int):
        from grit_tpu.detection.postprocess import postprocess

        self.epoch = epoch
        self.call_hooks("before_epoch")
        evaluator = self.evaluator_factory()
        params = self.state_getter().params
        for batch in self.dataloader:
            out = self._predict(params, batch["samples"])
            results = postprocess(
                out["pred_logits"], out["pred_boxes"], batch["orig_sizes"]
            )
            evaluator.update(batch["image_id"], results)
        self.epoch_results = evaluator.summarize()
        print(f"epoch {epoch} eval: {self.epoch_results}")
        self.call_hooks("after_epoch")
        return self.epoch_results
