"""Caption evaluation: jitted beam search + host-side decode/metrics.

Parity: reference engine/caption_engine.py:144-230 (evaluate_metrics) and
:233-284 (inference_coco_test).

The per-batch wall-clock (with an explicit device sync: ``np.asarray`` of
the outputs — a real fetch; ``block_until_ready`` is NOT a reliable fence on
the experimental axon PJRT backend, docs/NOTES.md) is recorded and printed
exactly like the reference's throughput metric of record
(caption_engine.py:181-192).
"""

from __future__ import annotations

import itertools
import json
import time
from typing import Callable

import jax
import numpy as np

from grit_tpu.data.metrics import PTBTokenizer, compute_scores
from grit_tpu.decoding.beam_search import beam_search


def make_caption_generator(model, *, beam_size, max_len, bos_idx, eos_idx) -> Callable:
    """Jitted (params, samples, batch_size) -> sequences [B, 1, T] top-1 beam."""

    def generate(params, samples, batch_size: int):
        vis = model.apply(params, samples, method="compute_vis")
        # project the step-invariant visual K/V once (decode steps then skip
        # re-projecting ~200 visual tokens x 6 cross-attentions every step)
        kv = model.apply(params, vis, method="precompute_vis_kv")

        def decode_fn(token, t, vis_in, cache):
            # vis stays per-image (tile_vis=False): the cross attentions fold
            # the beam dim into the query rows instead of tiling the K/V
            return model.apply(
                params, token, t, vis_in["feat"], cache,
                method="decode_step", vis_kv=vis_in["kv"], vis_fold=beam_size,
            )

        cache = model.apply(params, batch_size * beam_size, max_len, method="init_cache")
        res = beam_search(
            decode_fn, cache, {"feat": vis, "kv": kv}, batch_size, beam_size,
            max_len, bos_idx, eos_idx, out_size=1, tile_vis=False,
        )
        return res.sequences[:, 0]  # [B, T]

    return jax.jit(generate, static_argnums=(2,))


def evaluate_metrics(
    generate_fn: Callable,
    params,
    dataloader,
    text_field,
    *,
    epoch: int = 0,
    split: str = "test",
    verbose: bool = True,
):
    """-> (scores dict, results list, avg seconds/batch)."""
    gen, gts = {}, {}
    results = []
    times = []

    def consume(it, batch, out_dev, t_dispatch):
        out = np.asarray(out_dev)  # hard device sync
        times.append(time.time() - t_dispatch)
        out = out[: len(batch["image_id"])]  # drop pad rows of a ragged tail
        caps_gen = text_field.decode(out, join_words=False)
        for i, gen_i in enumerate(caps_gen):
            # collapse repeated words (caption_engine.py:196)
            gen_str = " ".join(k for k, _ in itertools.groupby(gen_i))
            key = f"{it}_{i}"
            gen[key] = [gen_str]
            if "captions" in batch:
                gts[key] = batch["captions"][i]
            results.append({"image_id": batch["image_id"][i], "caption": gen_str})
        if verbose and it % 100 == 0:
            print(
                f"Number of iterations: {it + 1}, batch_size={len(batch['image_id'])}, "
                f"Total time per 1 batch: {sum(times) / len(times):0.5f}s"
            )

    # pipeline: dispatch batch i+1 before decoding batch i's result, so host
    # decode/bookkeeping overlaps device beam search
    pending = None
    nominal_bs = None
    for it, batch in enumerate(iter(dataloader)):
        bs = len(batch["image_id"])
        samples = batch["samples"]
        if nominal_bs is None:
            nominal_bs = bs
        if bs < nominal_bs:
            # pad the ragged FINAL batch to the compiled batch size instead of
            # paying a second full-model compile for its shape (~10 min on the
            # tunnel); consume() slices the outputs back to the true count.
            # pad_to_multiple is the one tree-padding helper (zero image +
            # all-valid mask; its docstring carries the int-leaf hazards)
            from grit_tpu.parallel.mesh import pad_to_multiple

            samples = pad_to_multiple(samples, nominal_bs)
        t_dispatch = time.time()
        out_dev = generate_fn(params, samples, max(bs, nominal_bs))
        if pending is not None:
            consume(*pending)
        pending = (it, batch, out_dev, t_dispatch)
    if pending is not None:
        consume(*pending)

    avg_time = sum(times) / max(len(times), 1)
    if verbose:
        print(f"Epoch: {epoch} iters: {len(times)}\nTotal time per 1 batch: {avg_time:0.5f}s")
    scores = None
    if gts:
        gts_tok = PTBTokenizer.tokenize(gts)
        gen_tok = PTBTokenizer.tokenize(gen)
        scores, _ = compute_scores(gts_tok, gen_tok)
        if verbose:
            print(f"Epoch {epoch}: {split} scores: {scores}")
    return scores, results, avg_time


def inference_coco_test(generate_fn, params, dataloader, text_field, *, split="test"):
    """Leaderboard json generation (caption_engine.py:233-284)."""
    _, results, _ = evaluate_metrics(
        generate_fn, params, dataloader, text_field, split=split
    )
    with open(f"result_{split}.json", "w") as f:
        json.dump(results, f)
    return results
