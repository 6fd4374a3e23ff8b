"""Compile-time dissection for the detector pre-training step.

The det step's cold AOT compile is ~24 min on the tunneled v5e (docs/NOTES
round 3).  This probe lowers+compiles the step's nested pieces separately to
attribute that time:

  fwd          model forward only (training=True outputs)
  matcher      the batched-levels Hungarian alone, given outputs
  grad_fixed   value_and_grad of the loss with the matcher REPLACED by a
               fixed assignment input (the grad graph without LAP loops)
  grad_full    value_and_grad of the production loss (matcher inside)
  step         the full production train step (grad + clip + AdamW groups)

The persistent compile cache is deliberately NOT enabled — every variant
pays its full compile.  (In-process jit caching cannot cross-contaminate:
each variant is a distinct program, and XLA compiles programs whole.)
Usage:

  python tools/compile_probe.py [--size 832,1216] [--batch 4] \
      [--variants fwd,matcher,grad_fixed,grad_full,step]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="832,1216")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--variants", default="fwd,matcher,grad_fixed,grad_full,step")
    args, overrides = ap.parse_known_args()

    from grit_tpu.config import default_detection_config
    from grit_tpu.detection.detector import build_detection_model
    from grit_tpu.detection.losses import hungarian_match
    from grit_tpu.detection.solver import make_detector_train_step
    from grit_tpu.engine.optim import build_optimizer
    from grit_tpu.engine.xe import TrainState
    from grit_tpu.utils.nested import ImageBatch

    config = default_detection_config().apply_overrides(overrides)
    model, crit = build_detection_model(config, dtype=jnp.bfloat16)
    h, w = (int(x) for x in args.size.split(","))
    b = args.batch
    rng = np.random.RandomState(0)

    dummy = ImageBatch(jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64), bool))
    params = jax.jit(lambda k, im: model.init(k, im, training=True))(
        jax.random.PRNGKey(0), dummy)
    jax.block_until_ready(params)
    tx, labels = build_optimizer(params, weight_decay=1e-4)

    images = ImageBatch(
        jnp.asarray(rng.rand(b, h, w, 3), jnp.float32),
        jnp.zeros((b, h, w), bool),
    )
    nbox, g = 25, 100
    targets = {
        "labels": jnp.asarray(
            rng.randint(0, config.model.detector.num_classes, (b, g)), jnp.int32),
        "boxes": jnp.asarray(np.stack([np.stack(
            [rng.uniform(.2, .8, g), rng.uniform(.2, .8, g),
             rng.uniform(.02, .2, g), rng.uniform(.02, .2, g)], -1)
            for _ in range(b)]), jnp.float32),
        "valid": jnp.asarray(np.tile([True] * nbox + [False] * (g - nbox), (b, 1))),
    }
    key = jax.random.PRNGKey(1)

    def fwd_fn(params, images):
        return model.apply(params, images, training=True, deterministic=False,
                           rngs={"dropout": key})

    def matcher_fn(outputs, targets):
        # same stacked-levels solve the criterion performs
        logits = jnp.concatenate(
            [outputs["pred_logits"]] +
            [a["pred_logits"] for a in outputs["aux_outputs"]], 0)
        boxes = jnp.concatenate(
            [outputs["pred_boxes"]] +
            [a["pred_boxes"] for a in outputs["aux_outputs"]], 0)
        L = 1 + len(outputs["aux_outputs"])
        t = {k: jnp.tile(v, (L,) + (1,) * (v.ndim - 1)) for k, v in targets.items()}
        return hungarian_match(logits, boxes, t["labels"], t["boxes"], t["valid"])

    def loss_fixed(params, images, targets, assign):
        outputs = model.apply(params, images, training=True, deterministic=False,
                              rngs={"dropout": key})
        num_boxes = jnp.maximum(targets["valid"].sum().astype(jnp.float32), 1.0)
        losses, _ = crit._single_level(
            outputs["pred_logits"], outputs["pred_boxes"], targets, num_boxes,
            assign=assign)
        return sum(v for k, v in losses.items() if k in crit.weight_dict)

    def loss_full(params, images, targets):
        outputs = model.apply(params, images, training=True, deterministic=False,
                              rngs={"dropout": key})
        losses = crit(outputs, targets)
        return crit.total_loss(losses)

    step = make_detector_train_step(
        model, crit, tx, labels,
        lr=config.optimizer.lr, lr_backbone=config.optimizer.lr_backbone,
        clip_max_norm=config.optimizer.clip_max_norm,
    )
    state = TrainState.create(params, tx)
    assign0 = jnp.zeros((b, 100), jnp.int32)

    variants = {
        "fwd": (lambda: jax.jit(fwd_fn), lambda: (params, images)),
        # lazy args: building them must not compile anything before the loop
        "matcher": (lambda: jax.jit(matcher_fn),
                    lambda: (jax.jit(fwd_fn)(params, images), targets)),
        "grad_fixed": (lambda: jax.jit(jax.value_and_grad(loss_fixed)),
                       lambda: (params, images, targets, assign0)),
        "grad_full": (lambda: jax.jit(jax.value_and_grad(loss_full)),
                      lambda: (params, images, targets)),
        "step": (lambda: step,
                 lambda: (state, images, targets, jnp.asarray(1.0), key)),
    }

    for name in args.variants.split(","):
        make, make_args = variants[name]
        fn = make()
        vargs = make_args()
        t0 = time.time()
        lowered = fn.lower(*vargs)
        t_lower = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        t_compile = time.time() - t0
        del compiled
        print(f"{name:12s} lower={t_lower:7.1f}s  compile={t_compile:7.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
