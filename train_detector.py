"""Detector pre-training CLI (reference train_detector.py).

Multi-dataset object-detection training of the Swin + deformable-decoder
detector, driven by the hook-based solver.  One process drives the local
mesh (the reference's 8-node x 8-GPU DDP becomes a data-parallel jax mesh;
multi-process pods shard the loader by jax.process_index()).

Parity with the reference recipe:
- 4-group AdamW + optional sp-optimizer (train_detector.py:24-89):
  head / det_no_decay / backbone_no_decay / backbone_decay at
  lr / lr / lr_backbone / lr_backbone with decoupled weight decay on the
  decay groups, plus params matching ``optimizer.sp_names`` (default
  ``attr_head``) on their own AdamW at ``sp_lr`` with their own
  MultiStepLR (``sp_lr_drop_epochs``);
- MultiStepLR tick parity: the reference steps each scheduler once BEFORE
  the epoch loop (train_detector.py:245-246), so a milestone ``m`` first
  applies during 0-indexed epoch ``m - 1`` — the hooks below get the
  translated milestones;
- warm start from ``exp.checkpoint`` with the ``query_embed`` row trim when
  ``query_embed`` is in sp_names (train_detector.py:134-153), strict=False
  merge with missing/unexpected counts printed;
- full resume via ``exp.resume=true`` from ``detector_last`` in the workdir
  (params + optimizer state + step counter + epoch).  The reference's
  resume never restores optimizer state (its guard ``not
  isinstance(optimizers, list)`` is always False, train_detector.py:156-157)
  — ours restores it through a typed Orbax template;
- production loader: DistributedSampler-style sharding, multi-worker
  decode+transform, depth-2 prefetch, drop_last (train_detector.py:167-176)
  — plus TPU static-shape bucketing (``dataset.fixed_bucket``) so the whole
  run compiles ONE train step.

  python train_detector.py exp.name=det1 dataset.roots.coco.ann_file=... ...
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def _trim_query_embed(tree, num_queries: int):
    """Trim loaded query_embed rows to num_queries (train_detector.py:137-144).

    The reference re-uses checkpoints pre-trained with more queries by
    slicing the leading rows off every ``query_embed`` tensor at load time.
    """

    def walk(node, name=""):
        if isinstance(node, dict):
            return {k: walk(v, k) for k, v in node.items()}
        if "query_embed" in name and hasattr(node, "shape") and np.ndim(node) == 2:
            return np.asarray(node)[:num_queries]
        return node

    return walk(tree)


def main(argv=None):
    from grit_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()
    from grit_tpu.config import Config, default_detection_config
    from grit_tpu.detection.datasets import DetectionDataset, build_train_dataset
    from grit_tpu.detection.det_transforms import make_transforms
    from grit_tpu.detection.detector import build_detection_model
    from grit_tpu.detection.hooks import (
        CheckpointHook,
        EpochLRHook,
        ProgressHook,
        ScalarWriterHook,
        TextLoggingHook,
    )
    from grit_tpu.detection.loader import DetectionLoader
    from grit_tpu.detection.solver import Trainer, Valider, make_detector_train_step
    from grit_tpu.engine import checkpoint as ckpt
    from grit_tpu.engine.optim import (
        build_optimizer,
        detector_param_labels,
        frozen_mask,
        swin_frozen_stages_predicate,
    )
    from grit_tpu.engine.xe import TrainState
    from grit_tpu.parallel.mesh import make_mesh, replicate
    from grit_tpu.utils.nested import batch_images

    config = default_detection_config().apply_overrides(argv or sys.argv[1:])
    workdir = os.path.join("outputs", config.exp.name)
    os.makedirs(workdir, exist_ok=True)

    # host-side aug RNGs, seed + rank (reference train_detector.py:116-120)
    from grit_tpu.utils.misc import seed_host_rngs

    seed_host_rngs(config.exp.seed, per_process=True)
    mesh = make_mesh()
    model, criterion = build_detection_model(config)

    # ---- production loader (reference train_detector.py:163-186) ----
    dataset = build_train_dataset(config)
    transform = make_transforms(
        "train", scales=list(config.dataset.scales), max_size=config.dataset.max_size
    )
    bs = config.optimizer.batch_size * jax.local_device_count()
    max_boxes = int(config.dataset.get("max_boxes", 100))
    n_attr = (
        int(config.model.get("num_attr_classes", 0))
        if config.model.get("with_attributes") else 0
    )
    bucket = config.dataset.get("fixed_bucket", None)
    loader = DetectionLoader(
        dataset, bs, transform=transform, mode="train",
        max_boxes=max_boxes, num_attr_classes=n_attr,
        bucket_hw=tuple(bucket) if bucket else None,
        rank=jax.process_index(), world=jax.process_count(),
        seed=config.exp.seed, num_workers=int(config.optimizer.get("num_workers", 4)),
    )

    # ---- init + optimizer (4 groups + sp; train_detector.py:24-89) ----
    dummy = batch_images([np.zeros((64, 64, 3), np.float32)])
    params = model.init(jax.random.PRNGKey(config.exp.seed), dummy, training=True)

    # warm start (train_detector.py:134-153): load weights only, with the
    # query_embed trim; strict=False merge prints missing/unexpected counts
    if config.exp.get("checkpoint", ""):
        loaded = ckpt.restore_checkpoint_path(config.exp.checkpoint)
        lp = loaded.get("params", loaded)
        sp_names = list(config.optimizer.get("sp_names", []))
        if any("query_embed" in s for s in sp_names):
            lp = _trim_query_embed(lp, int(config.model.detector.num_queries))
        params, miss, unexp = ckpt.load_params_flexible(params, lp)
        print(f"loaded {config.exp.checkpoint}: missing {miss}, unexpected {unexp}")

    params = replicate(params, mesh)
    # torch AdamW default betas (0.9, 0.999); decay is applied per-group
    # inside the step (decoupled), NOT in the transform chain
    tx, _ = build_optimizer(params, beta_2=0.999)
    labels = detector_param_labels(
        params, sp_names=list(config.optimizer.get("sp_names", []))
    )
    state = TrainState.create(params, tx)
    # requires_grad parity: frozen Swin stages are excluded from the
    # reference's param groups, so they get neither updates nor decay
    freeze = None
    fs = int(config.model.get("frozen_stages", -1))
    if fs >= 0:
        freeze = frozen_mask(params, swin_frozen_stages_predicate(fs))
    step_fn = make_detector_train_step(
        model, criterion, tx, labels,
        lr=config.optimizer.lr,
        lr_backbone=config.optimizer.lr_backbone,
        sp_lr=float(config.optimizer.get("sp_lr", 0.0)),
        weight_decay=float(config.optimizer.weight_decay),
        clip_max_norm=config.optimizer.clip_max_norm,
        freeze=freeze,
    )

    decay = float(config.optimizer.get(
        "decay_rate", config.optimizer.get("lr_drop_factor", 0.1)
    ))
    hooks = [
        # milestone m applies from 0-indexed epoch m-1 (pre-loop step quirk)
        EpochLRHook([m - 1 for m in config.optimizer.lr_drop_epochs], decay),
        EpochLRHook([m - 1 for m in config.optimizer.get("sp_lr_drop_epochs", [])],
                    decay, attr="sp_epoch_lr_scale"),
        ProgressHook(),
        TextLoggingHook(os.path.join(workdir, "detector_log.txt")),
        ScalarWriterHook(os.path.join(workdir, "scalars.jsonl")),
        CheckpointHook(workdir),
    ]

    # validation: COCO-format val sets -> postprocess -> mAP evaluator
    validers = []
    from grit_tpu.detection.coco_eval import CocoEvaluator

    for name, spec in config.dataset.get("valid_roots", Config({})).items():
        vds = DetectionDataset(spec["ann_file"], spec.get("img_root", ""))
        vloader = DetectionLoader(
            vds, max(1, config.optimizer.batch_size), mode="valid",
            transform=make_transforms("valid", max_size=config.dataset.max_size),
            rank=jax.process_index(), world=jax.process_count(),
            num_workers=int(config.optimizer.get("num_workers", 4)),
        )
        gt = {
            int(vds.ids[i]): {
                "boxes": np.asarray([
                    [a["bbox"][0], a["bbox"][1],
                     a["bbox"][0] + a["bbox"][2], a["bbox"][1] + a["bbox"][3]]
                    for a in vds.anns_by_image[vds.ids[i]]
                ]),
                "labels": np.asarray([
                    a["category_id"] for a in vds.anns_by_image[vds.ids[i]]
                ]),
            }
            for i in range(len(vds))
        }
        validers.append(Valider(
            model, lambda: trainer.state, vloader,
            evaluator_factory=lambda gt=gt: CocoEvaluator(gt),
        ))

    # validers run inside each trainer epoch, BEFORE the after_epoch hooks,
    # so checkpoint topk and the text/scalar logs see this epoch's mAP
    trainer = Trainer(step_fn, state, loader, rng=jax.random.PRNGKey(0),
                      hooks=hooks, mesh=mesh, validers=validers)

    # ---- resume (exp.resume=true): typed-template restore of the full
    # TrainState from 'detector_last' + epoch/step continuation ----
    start_epoch = 0
    if config.exp.get("resume", False):
        template = {
            "params": state.params,
            "opt_state": state.opt_state,
            "global_steps": state.global_steps,
            "epoch": np.asarray(0),
            "best_ciders": np.zeros(2, np.float32),
        }
        try:
            restored = ckpt.restore_checkpoint(workdir, "detector_last",
                                               template=template)
            trainer.state = TrainState(
                restored["params"], restored["opt_state"],
                jnp.asarray(restored["global_steps"]),
            )
            start_epoch = int(restored["epoch"]) + 1
            trainer.global_step = int(np.asarray(restored["global_steps"]))
            print(f"resumed detector training from epoch {start_epoch - 1}")
        except Exception as e:  # noqa: BLE001 — absent ckpt = fresh run
            print(f"resume skipped: {e}")

    with mesh:
        for epoch in range(start_epoch, config.optimizer.epochs):
            # epoch-keyed host aug RNGs: a resumed run's epoch E draws the
            # same flips/crops/scales as an uninterrupted run's epoch E —
            # makes kill-and-resume bit-exact (the reference seeds once per
            # process, train_detector.py:116-120, so its resumes silently
            # change the augmentation stream; pinned by
            # tests/test_det_train.py::test_cli_kill_and_resume_bit_exact)
            seed_host_rngs(config.exp.seed + 7919 * (epoch + 1), per_process=True)
            loader.set_epoch(epoch)
            trainer.state = trainer.run_epoch(epoch)


if __name__ == "__main__":
    main()
