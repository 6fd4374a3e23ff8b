"""Compile-time dissection for the caption eval step (bench.py's generate).

The b128 cold compile was 199.5 s in round 3 (280 s seen with the round-4
v5 kernel); the verdict target is < 120 s.  This probe lowers+compiles the
generate's nested pieces separately to attribute the time:

  backbone   Swin forward only
  vis        compute_vis (Swin + det stack + grid net)
  kv         precompute_vis_kv
  decode     the 20-step beam-search scan given vis/kv
  full       the whole generate (what bench.py jits)

The persistent compile cache is deliberately NOT enabled.  Usage:

  python tools/compile_probe_caption.py [--batch 128] [overrides...]
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
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--variants", default="backbone,vis,kv,decode,full")
    args, overrides = ap.parse_known_args()

    from grit_tpu.config import default_caption_config
    from grit_tpu.decoding.beam_search import beam_search
    from grit_tpu.models.captioner import build_captioner
    from grit_tpu.utils.nested import ImageBatch

    beam, max_len = 5, 20
    config = default_caption_config().apply_overrides(overrides)
    model = build_captioner(config, dtype=jnp.bfloat16)

    batch = args.batch
    h, w = 384, 640
    images = ImageBatch(
        jax.random.normal(jax.random.PRNGKey(0), (batch, h, w, 3), jnp.float32),
        jnp.zeros((batch, h, w), bool),
    )
    seq = jnp.full((batch, 20), 4, jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, seq)
    jax.block_until_ready(params)
    print("init done", file=sys.stderr)

    def backbone(params, im):
        return model.apply(
            params, im.images,
            method=lambda m, x: m.detector.backbone(x, deterministic=True))

    def vis(params, im):
        return model.apply(params, im, method="compute_vis")

    def kv(params, v):
        return model.apply(params, v, method="precompute_vis_kv")

    def decode(params, v, kv_):
        def decode_fn(token, t, vis_in, cache):
            return model.apply(
                params, token, t, vis_in["feat"], cache,
                method="decode_step", vis_kv=vis_in["kv"], vis_fold=beam,
            )

        cache = model.apply(params, batch * beam, max_len, method="init_cache")
        res = beam_search(
            decode_fn, cache, {"feat": v, "kv": kv_}, batch, beam, max_len,
            config.model.bos_idx, config.model.eos_idx, out_size=1,
            tile_vis=False,
        )
        return res.sequences

    def full(params, im):
        v = model.apply(params, im, method="compute_vis")
        kv_ = model.apply(params, v, method="precompute_vis_kv")
        return decode(params, v, kv_)

    vis_out = jax.jit(vis)(params, images)
    kv_out = jax.jit(kv)(params, vis_out)
    jax.block_until_ready(jax.tree.leaves(kv_out)[0])

    variants = {
        "backbone": (backbone, (params, images)),
        "vis": (vis, (params, images)),
        "kv": (kv, (params, vis_out)),
        "decode": (decode, (params, vis_out, kv_out)),
        "full": (full, (params, images)),
    }
    for name in args.variants.split(","):
        fn, vargs = variants[name]
        t0 = time.time()
        lowered = jax.jit(fn).lower(*vargs)
        t_lower = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        t_compile = time.time() - t0
        del compiled
        print(f"{name:10s} lower={t_lower:7.1f}s  compile={t_compile:7.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
