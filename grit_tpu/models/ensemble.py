"""Ensemble caption inference: average per-step log-probs over N replicas.

Capability parity with the reference's ensemble (models/caption/ensemble.py
— mean of per-model log-probs at each beam step, :159).  The reference
implementation is bit-rotted against its own current model (stale
``model.encoder/decoder`` attributes); this one works against the current
captioner: each member keeps its own KV caches inside one shared beam
search, so the ensemble decodes exactly once per step with fused member
forwards.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from grit_tpu.decoding.beam_search import BeamResult, beam_search


def make_ensemble_generator(
    model,
    params_list: Sequence,
    *,
    beam_size: int,
    max_len: int,
    bos_idx: int,
    eos_idx: int,
    out_size: int = 1,
):
    """Jitted (samples, batch_size) -> BeamResult, averaging member log-probs."""
    n_members = len(params_list)

    def generate(samples, batch_size: int):
        vis_list = [
            model.apply(p, samples, method="compute_vis") for p in params_list
        ]

        def decode_fn(token, t, vis_tuple, caches):
            logps, new_caches = [], []
            for p, vis, cache in zip(params_list, vis_tuple, caches):
                lp, c = model.apply(
                    p, token, t, vis, cache, method="decode_step",
                    vis_fold=beam_size,
                )
                logps.append(lp)
                new_caches.append(c)
            return jnp.stack(logps).mean(0), tuple(new_caches)

        caches = tuple(
            model.apply(p, batch_size * beam_size, max_len, method="init_cache")
            for p in params_list
        )
        return beam_search(
            decode_fn, caches, tuple(vis_list), batch_size, beam_size, max_len,
            bos_idx, eos_idx, out_size=out_size, tile_vis=False,
        )

    return jax.jit(generate, static_argnums=(1,))
