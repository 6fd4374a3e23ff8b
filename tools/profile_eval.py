"""Phase-split eval profiler: attribute the b128 beam-5 step across
backbone / det stack / grid net / KV precompute / decode scan.

Each phase is jitted and timed separately with a hard host sync, so the
numbers are attribution (where would effort pay off), not an exact
decomposition — the full program can overlap phases that the split cannot.
The ``full`` row is bench.py's generate and matches its per-iter numbers.

Usage:  python tools/profile_eval.py [batch] [--trace DIR]
        --trace also writes a jax.profiler trace of the full generate.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from grit_tpu.config import default_caption_config
from grit_tpu.decoding.beam_search import beam_search
from grit_tpu.models.captioner import build_captioner
from grit_tpu.utils.misc import enable_compile_cache
from grit_tpu.utils.nested import ImageBatch

enable_compile_cache("/tmp/jax_bench_cache")


def timed(name, raw_fn, *args, chain=8):
    """Time a phase WITHOUT fetching its (huge) outputs and WITHOUT paying
    the tunnel's ~25-30 ms dispatch RTT per iteration: jit a scalarized
    variant (sum over ALL output leaves, so nothing is DCE'd — e.g. summing
    only the first Swin stage would skip stages 2-4), dispatch ``chain``
    back-to-back calls, fence once on the last scalar (the single device
    stream executes programs in dispatch order), divide.  This is bench.py's
    sustained two-in-flight pattern; np.asarray of a b128 feature pyramid
    through the ~13 MB/s tunnel would swamp the timing instead
    (docs/NOTES.md probe gotchas)."""

    def scalarized(*a):
        leaves = jax.tree.leaves(raw_fn(*a))
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    sfn = jax.jit(scalarized)
    float(np.asarray(sfn(*args)))  # compile + warm
    t0 = time.time()
    rs = [sfn(*args) for _ in range(chain)]
    float(np.asarray(rs[-1]))
    med = (time.time() - t0) / chain
    print(f"{name:28s} {med * 1e3:9.1f} ms/call  (chained x{chain})",
          flush=True)
    return med


def main():
    args = sys.argv[1:]
    batch = int(args.pop(0)) if args and args[0].isdigit() else 128
    trace_dir = None
    if "--trace" in args:
        i = args.index("--trace")
        trace_dir = args[i + 1]
        del args[i:i + 2]
    beam, max_len = 5, 20

    config = default_caption_config().apply_overrides(args)
    model = build_captioner(config, dtype=jnp.bfloat16)

    h, w = 384, 640
    images = ImageBatch(
        jax.random.normal(jax.random.PRNGKey(0), (batch, h, w, 3), jnp.float32),
        jnp.zeros((batch, h, w), bool),
    )
    seq = jnp.full((batch, 20), 4, jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, seq)
    jax.block_until_ready(params)
    print("init done", file=sys.stderr)

    # --- phase fns (raw; `timed` jits scalarized variants) -----------------
    backbone = lambda p, im: model.apply(
        p, im.images, method=lambda m, x: m.detector.backbone(
            x, deterministic=True))
    detector = lambda p, im: model.apply(
        p, im, method=lambda m, x: m.detector(x, deterministic=True))
    compute_vis = lambda p, im: model.apply(p, im, method="compute_vis")
    precompute_kv = lambda p, vis: model.apply(p, vis, method="precompute_vis_kv")

    def decode(params, vis, kv):
        def decode_fn(token, t, vis_in, cache):
            return model.apply(
                params, token, t, vis_in["feat"], cache,
                method="decode_step", vis_kv=vis_in["kv"], vis_fold=beam,
            )

        cache = model.apply(params, batch * beam, max_len, method="init_cache")
        res = beam_search(
            decode_fn, cache, {"feat": vis, "kv": kv}, batch, beam, max_len,
            config.model.bos_idx, config.model.eos_idx, out_size=1,
            tile_vis=False,
        )
        return res.sequences

    def generate(params, images):
        vis = model.apply(params, images, method="compute_vis")
        kv = model.apply(params, vis, method="precompute_vis_kv")
        return decode(params, vis, kv)

    # --- run --------------------------------------------------------------
    # downstream inputs computed once, kept device-resident (never fetched)
    vis = jax.jit(compute_vis)(params, images)
    kv = jax.jit(precompute_kv)(params, vis)
    jax.block_until_ready(jax.tree.leaves(kv)[0])

    t_bb = timed("backbone (Swin)", backbone, params, images)
    t_det = timed("detector (Swin+projs+det)", detector, params, images)
    t_vis = timed("compute_vis (det+grid_net)", compute_vis, params, images)
    t_kv = timed("precompute_vis_kv", precompute_kv, params, vis)
    t_dec = timed("decode scan (20 steps)", decode, params, vis, kv)
    t_full = timed("FULL generate", generate, params, images)

    print(f"\nattribution at batch {batch} (ms):")
    print(f"  Swin backbone        {t_bb * 1e3:8.1f}")
    print(f"  det stack (6 layers) {(t_det - t_bb) * 1e3:8.1f}")
    print(f"  grid net             {(t_vis - t_det) * 1e3:8.1f}")
    print(f"  vis-KV precompute    {t_kv * 1e3:8.1f}")
    print(f"  decode (20 steps)    {t_dec * 1e3:8.1f}")
    print(f"  sum of phases        {(t_vis + t_kv + t_dec) * 1e3:8.1f}")
    print(f"  full generate        {t_full * 1e3:8.1f}")
    print(f"  -> {batch / t_full:.1f} img/s sustained")

    if trace_dir:
        gen_j = jax.jit(generate)
        np.asarray(gen_j(params, images))  # compile outside the trace
        jax.profiler.start_trace(trace_dir)
        np.asarray(gen_j(params, images))
        jax.profiler.stop_trace()
        print(f"trace written to {trace_dir}")


if __name__ == "__main__":
    main()
