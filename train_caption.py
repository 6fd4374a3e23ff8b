"""Caption training CLI: 4-phase XE -> SCST schedule on a TPU mesh.

Reference parity: train_caption.py (phase machine :95-113, freeze logic
:48-59, SC warm-start from best-valid :131-133, per-phase checkpoints
:181-202).  One process drives all local chips through a jax mesh — the
reference's mp.spawn/DDP plumbing disappears into GSPMD.

Usage:
  python train_caption.py exp.name=run1 optimizer.finetune_xe_epochs=10 ...
  (dotted overrides like the reference's hydra CLI; config defaults mirror
  configs/caption/coco_config.yaml)
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    from grit_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()
    from grit_tpu.config import default_caption_config
    from grit_tpu.convert import load_detector_checkpoint
    from grit_tpu.data.coco import build_coco_dataloaders
    from grit_tpu.data.field import TextField
    from grit_tpu.data.metrics import Cider, PTBTokenizer
    from grit_tpu.engine import checkpoint as ckpt
    from grit_tpu.engine.evaluator import evaluate_metrics, make_caption_generator
    from grit_tpu.engine.loops import (
        log_epoch_csv,
        phase_for_epoch,
        total_epochs,
        train_sc_epoch,
        train_xe_epoch,
    )
    from grit_tpu.engine.optim import build_optimizer, frozen_mask
    from grit_tpu.engine.scst import make_generate_step, make_scst_update_step
    from grit_tpu.engine.xe import TrainState, make_eval_loss_step, make_xe_train_step
    from grit_tpu.models.captioner import build_captioner
    from grit_tpu.parallel.mesh import make_mesh, replicate
    from grit_tpu.utils.nested import ImageBatch

    from grit_tpu.parallel.distributed import maybe_initialize

    config = default_caption_config().apply_overrides(argv or sys.argv[1:])
    workdir = os.path.join("outputs", config.exp.name)
    os.makedirs(workdir, exist_ok=True)

    proc_idx, proc_count = maybe_initialize()
    # host-side aug RNGs (reference train_caption.py:30-32; per-rank like
    # its DataLoader workers so DP hosts draw distinct augmentations)
    from grit_tpu.utils.misc import seed_host_rngs

    seed_host_rngs(config.exp.seed, per_process=True)
    mesh = make_mesh()
    print(f"process {proc_idx}/{proc_count}, devices: {jax.device_count()}, "
          f"mesh: {dict(mesh.shape)}")

    dtype = jnp.bfloat16 if config.model.get("compute_dtype") == "bfloat16" else None
    model = build_captioner(config, dtype=dtype)
    text_field = TextField(vocab_path=config.dataset.vocab_path)

    # init params with a dummy batch
    h, w = config.dataset.transform_cfg.size
    dummy = ImageBatch(jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w), bool))
    dummy_seq = jnp.full((1, 8), config.model.bos_idx, jnp.int32)
    params = model.init(jax.random.PRNGKey(config.exp.seed), dummy, dummy_seq)

    # load pretrained detector weights (reference train_caption.py:38-39)
    det_ckpt = config.model.detector.checkpoint
    if det_ckpt and os.path.exists(det_ckpt):
        loaded = load_detector_checkpoint(det_ckpt)
        det_params, miss, unexp = ckpt.load_params_flexible(
            params["params"]["detector"], loaded["params"]
        )
        params["params"]["detector"] = det_params
        print(f"Loading weights for detector: missing: {miss}, unexpected: {unexp}.")

    params = replicate(params, mesh)

    # freezing (train_caption.py:48-57): substring rules on param paths,
    # plus the backbone's frozen_stages (swin_model.py:622-637 via
    # coco_config.yaml:29) which applies in every phase
    preds = []
    if config.optimizer.get("freeze_backbone"):
        preds.append(lambda p: "backbone" in p)
    if config.optimizer.get("freeze_detector"):
        preds.append(lambda p: "detector" in p)
    fs = int(config.model.get("frozen_stages", -1))
    if fs >= 0:
        from grit_tpu.engine.optim import swin_frozen_stages_predicate

        preds.append(swin_frozen_stages_predicate(fs))
    freeze = (
        frozen_mask(params, lambda p: any(f(p) for f in preds)) if preds else None
    )

    tx, labels = build_optimizer(
        params, beta_1=config.optimizer.beta_1, beta_2=config.optimizer.beta_2
    )
    state = TrainState.create(params, tx)

    mode = (
        "freezing"
        if config.optimizer.freezing_xe_epochs > 0
        and not config.optimizer.get("freeze_backbone")
        else "finetune"
    )
    # auto feature extraction (reference train_caption.py:48-59): freezing
    # mode without freeze_detector trains on PRE-EXTRACTED hdf5 features; if
    # they are absent, extract them now with the loaded detector weights
    # instead of failing at the loader
    if mode == "freezing" and not os.path.exists(config.dataset.hdf5_path):
        # rank 0 extracts over the FULL dataset (an hdf5 must cover every
        # rank's images); other ranks wait at the barrier below
        if proc_idx == 0:
            from grit_tpu.models.detector import build_detector
            from tools.extract_features import extract_vis_features

            print(f"{config.dataset.hdf5_path} absent -> extracting features "
                  "(train_caption.py:48-59 parity)")
            detector = build_detector(config, dtype=dtype)
            det_params = {"params": jax.tree.map(
                np.asarray, params["params"]["detector"]
            )}
            extract_loaders, _ = build_coco_dataloaders(
                config, mode="finetune", rank=0, world=1
            )
            extract_vis_features(
                jax.jit(lambda p, imgs: detector.apply(p, imgs)), det_params,
                config, extract_loaders, config.dataset.hdf5_path,
            )
        if proc_count >= 2:
            from grit_tpu.parallel.distributed import barrier

            barrier("auto_extract_features")

    # reference batch sizes are PER-GPU (coco_config.yaml:77); ours must also
    # scale with the data-parallel width so each chip sees batch_size items
    # and the global batch divides the mesh
    n_data = mesh.shape["data"]
    config.optimizer.batch_size = config.optimizer.batch_size * (n_data // proc_count)
    dataloaders, samplers = build_coco_dataloaders(
        config, mode=mode, rank=proc_idx, world=proc_count
    )

    train_refs = [ex.text for ex in dataloaders["train"].dataset.examples]
    cider = Cider(PTBTokenizer.tokenize(train_refs))

    sched_cfg = dict(
        num_epochs=config.optimizer.freezing_xe_epochs + config.optimizer.finetune_xe_epochs,
        num_its_per_epoch=max(1, len(dataloaders["train"])),
        init_lr=config.optimizer.xe_lr,
        min_lr=config.optimizer.min_lr,
        warmup_init_lr=config.optimizer.warmup_init_lr,
    )
    xe_step = make_xe_train_step(
        model, tx, labels, pad_idx=config.model.pad_idx, sched_cfg=sched_cfg,
        backbone_lr=config.optimizer.xe_backbone_lr, freeze=freeze,
    )
    eval_loss_step = make_eval_loss_step(model, pad_idx=config.model.pad_idx)
    generate_eval = make_caption_generator(
        model, beam_size=config.model.beam_size, max_len=config.model.beam_len,
        bos_idx=config.model.bos_idx, eos_idx=config.model.eos_idx,
    )
    generate_sc = make_generate_step(
        model, beam_size=config.model.beam_size, max_len=config.model.beam_len,
        bos_idx=config.model.bos_idx, eos_idx=config.model.eos_idx,
    )
    scst_update = make_scst_update_step(
        model, tx, labels,
        bos_idx=config.model.bos_idx, eos_idx=config.model.eos_idx,
        model_lr=config.optimizer.sc_lr, backbone_lr=config.optimizer.sc_backbone_lr,
        freeze=freeze,
    )

    from grit_tpu.engine.logger import ScalarWriter

    writer = ScalarWriter(os.path.join(workdir, "tensorboard"))
    rng = jax.random.PRNGKey(config.exp.seed)
    best_cider_val = best_cider_test = 0.0
    sc_started = False
    start_epoch = 0
    if config.exp.resume:
        # full resume from 'last' (params + optimizer + scheduler tick + epoch
        # + best CIDErs) — the reference's caption resume is unimplemented
        # (train_caption.py:44); here it works.  The restore MUST go through
        # a template: a templateless Orbax restore returns plain lists/dicts,
        # and optax's NamedTuple states crash on attribute access at the
        # first post-resume step (pinned by test_cli resume test).
        try:
            template = {
                "params": state.params,
                "opt_state": state.opt_state,
                "global_steps": state.global_steps,
                "epoch": np.asarray(0),
                "best_ciders": np.zeros((2,), np.float32),
            }
            restored = ckpt.restore_checkpoint(workdir, "last", template=template)
            state = TrainState(
                restored["params"], restored["opt_state"],
                jnp.asarray(restored["global_steps"]),
            )
            start_epoch = int(restored["epoch"]) + 1
            best_cider_val, best_cider_test = (
                float(x) for x in np.asarray(restored["best_ciders"])
            )
            # resuming INSIDE the SC phase must not re-warm-start from
            # best_valid (that would clobber the resumed params); only a
            # resume at the XE->SC boundary still warm-starts.
            sc_started = start_epoch > 0 and phase_for_epoch(
                start_epoch - 1, config
            ).endswith("sc")
            print(f"resumed from epoch {start_epoch - 1}")
        except Exception as e:
            print(f"resume skipped: {e}")
    with mesh:
        for epoch in range(start_epoch, total_epochs(config)):
            phase = phase_for_epoch(epoch, config)
            print(f"Train: epoch={epoch}, phase={phase}")
            if phase.endswith("xe"):
                state, train_res, rng = train_xe_epoch(
                    xe_step, eval_loss_step, state, dataloaders,
                    epoch=epoch, rng=rng, mesh=mesh, writer=writer,
                    pad_idx=config.model.pad_idx, bos_idx=config.model.bos_idx,
                )
            else:
                if not sc_started:
                    # SC warm-start from best-valid (train_caption.py:131-133)
                    try:
                        restored = ckpt.restore_checkpoint(workdir, "best_valid")
                        state = TrainState(
                            restored["params"], state.opt_state, state.global_steps
                        )
                        print("Start self-critical optimization from best_valid")
                    except Exception as e:
                        print(f"best_valid restore skipped: {e}")
                    sc_started = True
                state, train_res, rng = train_sc_epoch(
                    generate_sc, scst_update, eval_loss_step, state, dataloaders,
                    cider, text_field,
                    beam_size=config.model.beam_size, epoch=epoch, rng=rng, mesh=mesh,
                    pad_idx=config.model.pad_idx, bos_idx=config.model.bos_idx,
                )
            dataloaders["train"].set_epoch(epoch)
            dataloaders["train_dict"].set_epoch(epoch)

            eval_splits = (("valid", "valid_dict"), ("test", "test_dict"))
            scores_by_split = {}
            if proc_count >= 2:
                # rank-specialized CONCURRENT eval (reference
                # train_caption.py:149-179: valid on rank 0, test on rank 1).
                # Mesh-global arrays can't run divergent per-rank programs,
                # so each rank evaluates on a host-local param copy; scores
                # are then allgathered so every rank sees both splits (the
                # best-checkpoint decision below must be rank-identical —
                # Orbax saves are collective).
                from grit_tpu.parallel.distributed import allgather_pyobj

                local_params = jax.tree.map(
                    lambda x: jax.device_put(np.asarray(x)), state.params
                )
                mine = {}
                for i, (split, loader_key) in enumerate(eval_splits):
                    if proc_idx == i:
                        mine[split], _, _ = evaluate_metrics(
                            generate_eval, local_params, dataloaders[loader_key],
                            text_field, epoch=epoch, split=split,
                        )
                for d in allgather_pyobj(mine):
                    scores_by_split.update(d)
            else:
                for split, loader_key in eval_splits:
                    scores_by_split[split], _, _ = evaluate_metrics(
                        generate_eval, state.params, dataloaders[loader_key],
                        text_field, epoch=epoch, split=split,
                    )

            for split, loader_key, best in (
                ("valid", "valid_dict", best_cider_val),
                ("test", "test_dict", best_cider_test),
            ):
                scores = scores_by_split[split]
                if proc_idx == 0:
                    log_epoch_csv(
                        config, epoch, split, scores, train_res, phase,
                        path=os.path.join(workdir, "result.csv"),
                    )
                if scores["CIDEr"] >= best:
                    ckpt.save_checkpoint(
                        workdir, f"best_{split}", state=state, epoch=epoch,
                        best_ciders=(scores["CIDEr"], 0.0), config=config,
                    )
                    if split == "valid":
                        best_cider_val = scores["CIDEr"]
                    else:
                        best_cider_test = scores["CIDEr"]

            ckpt.save_checkpoint(workdir, phase, state=state, epoch=epoch, config=config)
            ckpt.save_checkpoint(
                workdir, "last", state=state, epoch=epoch,
                best_ciders=(best_cider_val, best_cider_test), config=config,
            )
            if epoch >= 15:
                ckpt.save_checkpoint(
                    workdir, f"epoch_{epoch}", state=state, epoch=epoch, config=config
                )


if __name__ == "__main__":
    main()
