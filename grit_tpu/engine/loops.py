"""Caption training loops: XE epochs, SCST epochs, the 4-phase schedule.

Parity: reference train_caption.py:95-204 (phase machine) and
engine/caption_engine.py (train_xe :312, train_sc :388, evaluate_loss :287,
log_epoch :106).

TPU execution model per step:
- XE: one jitted program (forward+backward+Adam); batches stream from the
  host loader thread; under a data mesh the batch is sharded and GSPMD
  all-reduces gradients (the DDP equivalent);
- SCST: jitted beam-search generation -> host decode + PTB tokenize + CIDEr
  reward -> jitted re-score/update step.  The host reward work for batch i
  overlaps the device generation of batch i+1 (async dispatch): we dispatch
  generation, then compute rewards for the previous batch while the device
  runs.
"""

from __future__ import annotations

import itertools
import os
import time
from typing import Optional

import jax
import numpy as np

from grit_tpu.data.metrics import PTBTokenizer
from grit_tpu.parallel.mesh import pad_to_multiple, shard_batch


def ragged_padder(**pad_kw):
    """Tail-batch padder: remembers the FIRST batch's leading size and pads
    any smaller batch up to it (pad_to_multiple conventions: zero
    image/all-valid mask; caption ints need int_fill/int_first).  A ragged
    tail would otherwise compile a second program for its shape and, multi-
    process, race the fresh executable's ~30 s Gloo rendezvous."""
    nominal = None

    def pad(tree, batch_size):
        nonlocal nominal
        if nominal is None:
            nominal = batch_size
        if batch_size < nominal:
            tree = pad_to_multiple(tree, nominal, **pad_kw)
        return tree

    return pad


def log_epoch_csv(config, epoch, split, scores, train_res, which, path="result.csv"):
    """Append-only result.csv epoch table (caption_engine.py:106-131)."""
    head = ("exp, backbone, imsize, resize, raug, epoch, split, cider, B1, B4, R, M, "
            "B2, B3, t-loss, t-reward, b-reward, which, v-loss")
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write(head + "\n")
    backbone = "B-VG" if os.path.exists(config.model.detector.checkpoint) else "B-IM"
    t = config.dataset.transform_cfg
    text = (
        f'{config.exp.name.split("/")[-1]}, {backbone}, {t.size[0]}_{t.size[1]}, '
        f"{t.resize_name}, {t.randaug}, {epoch}, {split:<5}, "
        f'{scores["CIDEr"] * 100:3.2f}, {scores["BLEU"][0] * 100:3.2f}, '
        f'{scores["BLEU"][3] * 100:3.2f}, {scores["ROUGE"] * 100:3.2f}, '
        f'{scores["METEOR"] * 100:3.2f}, {scores["BLEU"][1] * 100:3.2f}, '
        f'{scores["BLEU"][2] * 100:3.2f}, '
        f'{train_res["loss"]:2.2f}, {train_res["reward"]:2.2f}, '
        f'{train_res["reward_baseline"]:2.2f}, {which}, {train_res["val_loss"]:1.2f}'
    )
    with open(path, "a") as f:
        f.write(text + "\n")
    print(text)


def phase_for_epoch(epoch: int, config) -> str:
    """4-phase epoch-count state machine (train_caption.py:90-103)."""
    o = config.optimizer
    fr_xe = o.freezing_xe_epochs
    fr_sc = fr_xe + o.freezing_sc_epochs
    ft_xe = fr_sc + o.finetune_xe_epochs
    ft_sc = ft_xe + o.finetune_sc_epochs
    if epoch < fr_xe:
        return "fr_xe"
    if epoch < fr_sc:
        return "fr_sc"
    if epoch < ft_xe:
        return "ft_xe"
    if epoch < ft_sc:
        return "ft_sc"
    return "done"


def total_epochs(config) -> int:
    o = config.optimizer
    return (o.freezing_xe_epochs + o.freezing_sc_epochs
            + o.finetune_xe_epochs + o.finetune_sc_epochs)


def train_xe_epoch(
    xe_step, eval_loss_step, state, dataloaders, *, epoch, rng, mesh=None, writer=None,
    pad_idx: int = 1, bos_idx: int = 2,
):
    """One XE epoch + validation loss (caption_engine.py:312-385)."""
    import jax.numpy as jnp

    from grit_tpu.parallel.distributed import barrier

    # align ranks before the first (compile-triggering) dispatch of each
    # program: the per-executable Gloo context init tolerates only ~30 s of
    # rank skew (see parallel/distributed.py::barrier)
    barrier("xe_epoch_start")
    state = state.epoch_tick()  # the reference's epoch-start scheduler.step()
    running = 0.0
    n = 0
    t0 = time.time()
    # metrics stay ON DEVICE and drain in chunks: a per-step float() costs a
    # full host round-trip (~25-30 ms on the tunnel) that serializes dispatch
    # — ~10% of a 278 ms step.  Draining every DRAIN steps amortizes the
    # sync to <1 ms/step while the dispatch queue stays full.
    DRAIN = 64
    pending_loss: list = []
    pending_lr: list = []

    def drain():
        nonlocal running, n
        if not pending_loss:
            return
        vals = np.asarray(jnp.stack(pending_loss))
        running += float(vals.sum())
        n += len(vals)
        if writer is not None and pending_lr:
            lrs = np.asarray(jnp.stack([d for _, d in pending_lr]))
            for (step_i, _), lr in zip(pending_lr, lrs):
                writer.scalar("model_lr", float(lr), step_i)
        pending_loss.clear()
        pending_lr.clear()

    # zero-weight [BOS, pad...] rows leave loss AND grads bit-unchanged
    # (pinned by the test_multichip ragged-exactness tests)
    pad_train = ragged_padder(int_fill=pad_idx, int_first=bos_idx)
    for it, batch in enumerate(dataloaders["train"]):
        rng, step_rng = jax.random.split(rng)
        batch = {"samples": batch["samples"], "captions": batch["captions"]}
        batch = pad_train(batch, int(np.asarray(batch["captions"]).shape[0]))
        if mesh is not None:
            batch = shard_batch(batch, mesh, int_fill=pad_idx, int_first=bos_idx)
        if it == 0:
            from grit_tpu.parallel.distributed import align_compile

            align_compile(xe_step, state, batch, step_rng, tag="xe_step")
        state, metrics = xe_step(state, batch, step_rng)
        pending_loss.append(metrics["loss"])
        if writer is not None:
            pending_lr.append((epoch * len(dataloaders["train"]) + it, metrics["lr"]))
        if len(pending_loss) >= DRAIN:
            drain()
    drain()
    train_loss = running / max(n, 1)

    barrier("xe_val_start")  # val-loss program first-run alignment
    val_running = 0.0
    vn = 0
    pad_val = ragged_padder(int_fill=pad_idx, int_first=bos_idx)
    for batch in dataloaders["valid"]:
        b = {"samples": batch["samples"], "captions": batch["captions"]}
        b = pad_val(b, int(np.asarray(b["captions"]).shape[0]))
        if mesh is not None:
            b = shard_batch(b, mesh, int_fill=pad_idx, int_first=bos_idx)
        if vn == 0:
            from grit_tpu.parallel.distributed import align_compile

            align_compile(eval_loss_step, state.params, b, tag="xe_val")
        val_running += float(eval_loss_step(state.params, b))
        vn += 1
    val_loss = val_running / max(vn, 1)
    print(f"Epoch {epoch} XE: loss={train_loss:.4f} val_loss={val_loss:.4f} "
          f"({time.time() - t0:.1f}s)")
    return state, {
        "loss": train_loss, "reward": 0.0, "reward_baseline": 0.0, "val_loss": val_loss,
    }, rng


def train_sc_epoch(
    generate_step, scst_update, eval_loss_step, state, dataloaders, cider, text_field,
    *, beam_size, epoch, rng, mesh=None, pad_idx: int = 1, bos_idx: int = 2,
):
    """One SCST epoch (caption_engine.py:388-492) with gen/reward overlap."""
    from grit_tpu.parallel.distributed import barrier

    barrier("sc_epoch_start")  # see train_xe_epoch
    running = {"loss": 0.0, "reward": 0.0, "reward_baseline": 0.0}
    n = 0
    pending = None  # (samples, sequences_device, captions)
    upd_aligned = False  # scst_update first-run rank alignment done

    def reward_and_update(state, samples, sequences, captions, rng):
        seqs = np.asarray(sequences)  # [Bpad, beam, T] (device -> host sync point)
        b_pad, k, t_len = seqs.shape
        b = len(captions)  # true count; rows past it are ragged-batch padding
        caps_gen = text_field.decode(seqs[:b].reshape(-1, t_len))
        caps_gt = list(itertools.chain(*([c] * k for c in captions)))
        gen_tok = PTBTokenizer.tokenize(caps_gen)
        gt_tok = PTBTokenizer.tokenize(caps_gt)
        reward = cider.compute_score(gt_tok, gen_tok)[1].astype(np.float32).reshape(b, k)
        reward = np.concatenate(
            [reward, np.zeros((b_pad - b, k), np.float32)], axis=0
        )
        nonlocal upd_aligned
        if not upd_aligned:
            from grit_tpu.parallel.distributed import align_compile

            align_compile(scst_update, state, samples, sequences, reward,
                          np.float32(b), rng, tag="sc_update")
            upd_aligned = True
        state, metrics = scst_update(
            state, samples, sequences, reward, np.float32(b), rng
        )
        return state, metrics

    # generate_step jits with a static batch and scst_update with fixed
    # shapes, so a ragged tail would compile BOTH programs again;
    # reward_and_update scores only the true ``len(captions)`` rows and the
    # SCST update is exactly invariant to padded rows (test_engine pins it)
    pad_gen = ragged_padder()
    for batch in dataloaders["train_dict"]:
        samples = batch["samples"]
        samples = pad_gen(samples, int(jax.tree.leaves(samples)[0].shape[0]))
        if mesh is not None:
            samples = shard_batch(samples, mesh)
        bs = int(jax.tree.leaves(samples)[0].shape[0])  # padded size for the jitted search
        rng, gen_rng, upd_rng = jax.random.split(rng, 3)
        if n == 0 and pending is None:
            from grit_tpu.parallel.distributed import align_compile

            align_compile(generate_step, state.params, samples, bs, gen_rng,
                          tag="sc_gen")
        sequences, _ = generate_step(state.params, samples, bs, gen_rng)
        # overlap: while the device generates this batch, score the previous
        if pending is not None:
            state, metrics = reward_and_update(state, *pending)
            for k in running:
                running[k] += float(metrics[k])
            n += 1
        pending = (samples, sequences, batch["captions"], upd_rng)

    if pending is not None:
        state, metrics = reward_and_update(state, *pending)
        for k in running:
            running[k] += float(metrics[k])
        n += 1

    barrier("sc_val_start")
    val_running, vn = 0.0, 0
    pad_val = ragged_padder(int_fill=pad_idx, int_first=bos_idx)
    for batch in dataloaders["valid"]:
        b = {"samples": batch["samples"], "captions": batch["captions"]}
        b = pad_val(b, int(np.asarray(b["captions"]).shape[0]))
        if mesh is not None:
            b = shard_batch(b, mesh, int_fill=pad_idx, int_first=bos_idx)
        if vn == 0:
            from grit_tpu.parallel.distributed import align_compile

            align_compile(eval_loss_step, state.params, b, tag="sc_val")
        val_running += float(eval_loss_step(state.params, b))
        vn += 1

    res = {k: v / max(n, 1) for k, v in running.items()}
    res["val_loss"] = val_running / max(vn, 1)
    print(f"Epoch {epoch} SCST: loss={res['loss']:.4f} reward={res['reward']:.3f} "
          f"baseline={res['reward_baseline']:.3f} val_loss={res['val_loss']:.4f}")
    return state, res, rng
