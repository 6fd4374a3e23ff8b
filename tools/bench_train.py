"""Training-step benchmark: XE (fwd+bwd+2-group Adam) and SCST iterations
on the real chip, at the production coco_config sizes.

  python tools/bench_train.py --phase xe --batches 16,32,64 --iters 8

Timing methodology per docs/NOTES.md: ``np.asarray`` on a step output is
the only reliable fence on the axon backend.  The XE step runs the
production ft_xe configuration incl. frozen_stages=2 (stop_gradient at the
frozen Swin boundary); pass --frozen-stages -1 for the full-backbone
variant the round-1 numbers were measured with.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=("xe", "sc", "det", "both"), default="xe")
    ap.add_argument("--batches", default="16,32,64")
    ap.add_argument("--sc-batches", default="4,8")
    ap.add_argument("--det-batches", default="4")
    ap.add_argument("--det-size", default="832,1216",
                    help="detector bench H,W (multiples of 64; ~the reference's "
                         "800/1333 multi-scale bucket)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--seq-len", type=int, default=20)
    ap.add_argument("--frozen-stages", type=int, default=2)
    ap.add_argument("--trace", default=None,
                    help="write a jax.profiler trace of one step to this dir")
    ap.add_argument("--no-donate", action="store_true",
                    help="disable buffer donation in the XE step (production "
                         "train_caption.py donates; this exists only to "
                         "reproduce the round-3 non-donated measurements)")
    args, overrides = ap.parse_known_args(argv)

    from grit_tpu.utils.misc import enable_compile_cache

    enable_compile_cache("/tmp/jax_bench_cache")
    import jax
    import jax.numpy as jnp

    from grit_tpu.config import default_caption_config
    from grit_tpu.engine.optim import (
        build_optimizer,
        frozen_mask,
        swin_frozen_stages_predicate,
    )
    from grit_tpu.engine.xe import TrainState, make_xe_train_step
    from grit_tpu.models.captioner import build_captioner
    from grit_tpu.utils.nested import ImageBatch

    config = default_caption_config().apply_overrides(overrides)
    config.model.frozen_stages = args.frozen_stages
    model = build_captioner(config, dtype=jnp.bfloat16)

    h, w = config.dataset.transform_cfg.size
    dummy = ImageBatch(jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w), bool))
    dummy_seq = jnp.full((1, 8), config.model.bos_idx, jnp.int32)
    t0 = time.time()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), dummy, dummy_seq)
    print(f"init: {time.time() - t0:.1f}s")

    freeze = None
    if args.frozen_stages >= 0:
        pred = swin_frozen_stages_predicate(args.frozen_stages)
        freeze = frozen_mask(params, pred)
    tx, labels = build_optimizer(
        params, beta_1=config.optimizer.beta_1, beta_2=config.optimizer.beta_2
    )

    rng = np.random.RandomState(0)

    def run(step_fn, inputs_fn, batches, tag, per_iter_images):
        for b in batches:
            # fresh buffers per batch size: the SCST update step donates its
            # state, which would invalidate the shared init params
            fresh = jax.tree.map(jnp.copy, params)
            state = TrainState.create(fresh, tx)
            stepargs = inputs_fn(b)
            t0 = time.time()
            state, metrics = step_fn(state, *stepargs, jax.random.PRNGKey(1))
            _ = np.asarray(metrics["loss"])  # device fence
            compile_s = time.time() - t0
            times = []
            for i in range(args.iters):
                t0 = time.time()
                state, metrics = step_fn(state, *stepargs, jax.random.PRNGKey(i))
                _ = np.asarray(metrics["loss"])
                times.append(time.time() - t0)
            ms = 1e3 * float(np.median(times))
            ips = per_iter_images(b) / (ms / 1e3)
            print(
                f"[{tag} b={b}] compile+1st={compile_s:.1f}s  "
                f"median step={ms:.1f} ms  {ips:.1f} img/s/chip  "
                f"(iters: {[f'{1e3*t:.1f}' for t in times]})"
            )
            # sustained: K chained steps, ONE fence at the end — the real
            # epoch loop's dispatch pattern (engine/loops.py drains metrics
            # in chunks, never per-step), so no ~25-30 ms tunnel RTT per step
            k = max(args.iters, 8)
            t0 = time.time()
            for i in range(k):
                state, metrics = step_fn(state, *stepargs, jax.random.PRNGKey(100 + i))
            _ = np.asarray(metrics["loss"])
            sus = 1e3 * (time.time() - t0) / k
            print(
                f"[{tag} b={b}] sustained (chained x{k}): {sus:.1f} ms/step  "
                f"{per_iter_images(b) / (sus / 1e3):.1f} img/s/chip"
            )
            if args.trace:
                jax.profiler.start_trace(args.trace)
                state, metrics = step_fn(state, *stepargs, jax.random.PRNGKey(999))
                _ = np.asarray(metrics["loss"])
                jax.profiler.stop_trace()
                print(f"[{tag} b={b}] trace written to {args.trace}")

    if args.phase in ("xe", "both"):
        sched = dict(num_epochs=10, num_its_per_epoch=1000, init_lr=1e-4,
                     min_lr=1e-4, warmup_init_lr=1e-5)
        xe_step = make_xe_train_step(
            model, tx, labels, pad_idx=config.model.pad_idx, sched_cfg=sched,
            backbone_lr=config.optimizer.xe_backbone_lr, freeze=freeze,
            donate=not args.no_donate,
        )

        def xe_inputs(b):
            images = ImageBatch(
                jnp.asarray(rng.rand(b, h, w, 3), jnp.float32),
                jnp.zeros((b, h, w), bool),
            )
            caps = jnp.asarray(
                np.concatenate(
                    [np.full((b, 1), 2), rng.randint(4, 5000, (b, args.seq_len - 2)),
                     np.full((b, 1), 3)], axis=1
                ), jnp.int32,
            )
            return ({"samples": images, "captions": caps},)

        run(xe_step, xe_inputs, [int(x) for x in args.batches.split(",")],
            f"XE fs={args.frozen_stages}", lambda b: b)

    if args.phase in ("sc", "both"):
        from grit_tpu.engine.scst import make_generate_step, make_scst_update_step

        beam = config.model.beam_size
        gen = make_generate_step(
            model, beam_size=beam, max_len=config.model.beam_len,
            bos_idx=config.model.bos_idx, eos_idx=config.model.eos_idx,
        )
        upd = make_scst_update_step(
            model, tx, labels, bos_idx=config.model.bos_idx,
            eos_idx=config.model.eos_idx, model_lr=5e-6, backbone_lr=5e-6,
            freeze=freeze,
        )

        def sc_iter(state, images, b, key):
            seqs, _ = gen(state.params, images, b, key)
            rewards = jnp.asarray(rng.rand(b, beam), jnp.float32)
            return upd(state, images, seqs, rewards, jnp.float32(b), key)

        def sc_inputs(b):
            images = ImageBatch(
                jnp.asarray(rng.rand(b, h, w, 3), jnp.float32),
                jnp.zeros((b, h, w), bool),
            )
            return (images, b)

        run(lambda st, im, b, key: sc_iter(st, im, b, key), sc_inputs,
            [int(x) for x in args.sc_batches.split(",")],
            f"SC beam={beam} fs={args.frozen_stages}", lambda b: b)

    if args.phase == "det":
        # detector pre-training step (VERDICT r2 item 5): full-size model,
        # on-device Hungarian (the axon backend has no host callbacks)
        from grit_tpu.config import default_detection_config
        from grit_tpu.detection.detector import build_detection_model
        from grit_tpu.detection.solver import make_detector_train_step

        dconfig = default_detection_config().apply_overrides(overrides)
        dmodel, dcrit = build_detection_model(dconfig, dtype=jnp.bfloat16)
        dh, dw = (int(x) for x in args.det_size.split(","))
        dummy_im = ImageBatch(jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64), bool))
        t0 = time.time()
        dparams = jax.jit(lambda k, im: dmodel.init(k, im, training=True))(
            jax.random.PRNGKey(0), dummy_im)
        print(f"det init: {time.time() - t0:.1f}s")
        dtx, dlabels = build_optimizer(dparams, weight_decay=1e-4)
        dstep = make_detector_train_step(
            dmodel, dcrit, dtx, dlabels,
            lr=dconfig.optimizer.lr, lr_backbone=dconfig.optimizer.lr_backbone,
            clip_max_norm=dconfig.optimizer.clip_max_norm,
        )

        def det_inputs(b):
            images = ImageBatch(
                jnp.asarray(rng.rand(b, dh, dw, 3), jnp.float32),
                jnp.zeros((b, dh, dw), bool),
            )
            nbox = 25
            targets = {
                "labels": jnp.asarray(
                    rng.randint(0, dconfig.model.detector.num_classes, (b, 100)),
                    jnp.int32),
                "boxes": jnp.asarray(
                    np.stack([np.stack(
                        [rng.uniform(.2, .8, 100), rng.uniform(.2, .8, 100),
                         rng.uniform(.02, .2, 100), rng.uniform(.02, .2, 100)],
                        -1) for _ in range(b)]), jnp.float32),
                "valid": jnp.asarray(
                    np.tile([True] * nbox + [False] * (100 - nbox), (b, 1))),
            }
            return (images, targets, jnp.asarray(1.0))

        def det_state(b):
            fresh = jax.tree.map(jnp.copy, dparams)
            return TrainState.create(fresh, dtx)

        for b in [int(x) for x in args.det_batches.split(",")]:
            state = det_state(b)
            stepargs = det_inputs(b)
            t0 = time.time()
            state, metrics = dstep(state, *stepargs, jax.random.PRNGKey(1))
            _ = np.asarray(metrics["loss"])
            compile_s = time.time() - t0
            times = []
            for i in range(args.iters):
                t0 = time.time()
                state, metrics = dstep(state, *stepargs, jax.random.PRNGKey(i))
                _ = np.asarray(metrics["loss"])
                times.append(time.time() - t0)
            ms = 1e3 * float(np.median(times))
            print(
                f"[DET b={b} {dh}x{dw}] compile+1st={compile_s:.1f}s  "
                f"median step={ms:.1f} ms  {b / (ms / 1e3):.1f} img/s/chip  "
                f"grad_norm={float(np.asarray(metrics['grad_norm'])):.3e}  "
                f"(iters: {[f'{1e3*t:.1f}' for t in times]})"
            )


if __name__ == "__main__":
    main()
