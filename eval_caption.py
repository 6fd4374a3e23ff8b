"""Karpathy-split beam-search evaluation CLI (reference eval_caption.py:19-60).

  python eval_caption.py exp.checkpoint=path/to/ckpt [overrides...]

Accepts either an Orbax checkpoint directory (our trainer's output) or a
reference ``.pth`` (converted on the fly).
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp


def load_any_checkpoint(path, model, config):
    from grit_tpu.convert import load_caption_checkpoint
    from grit_tpu.engine import checkpoint as ckpt
    from grit_tpu.utils.nested import ImageBatch

    h, w = config.dataset.transform_cfg.size
    dummy = ImageBatch(jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w), bool))
    dummy_seq = jnp.full((1, 8), config.model.bos_idx, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), dummy, dummy_seq)
    if path.endswith(".pth"):
        loaded = load_caption_checkpoint(path)
        merged, miss, unexp = ckpt.load_params_flexible(
            params["params"], loaded["params"]
        )
        print(f"load: missing={miss}, unexpected={unexp}")
        return {"params": merged}
    # an Orbax checkpoint directory (as written by the trainer).  Restore to
    # host numpy: the checkpoint may have been written on a different
    # backend/topology (multi-chip trainer -> single-chip eval, CPU -> TPU),
    # and sharding-less restore fails there.
    import numpy as np
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        meta = ckptr.metadata(os.path.abspath(path))
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta.item_metadata
        )
        restored = ckptr.restore(
            os.path.abspath(path), restore_args=restore_args
        )
    # strict=False merge against the model's init tree (reference
    # train_caption.py:39): checkpoints written before a param was added
    # (e.g. the loadable pos_emb table) keep the init value for it.
    merged, miss, unexp = ckpt.load_params_flexible(params, restored["params"])
    if miss or unexp:
        print(f"load: missing={miss}, unexpected={unexp}")
    return merged


def main(argv=None):
    from grit_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()
    from grit_tpu.config import default_caption_config
    from grit_tpu.data.coco import build_coco_dataloaders
    from grit_tpu.data.field import TextField
    from grit_tpu.engine.evaluator import evaluate_metrics, make_caption_generator
    from grit_tpu.models.captioner import build_captioner

    config = default_caption_config().apply_overrides(argv or sys.argv[1:])
    config.exp.eval = True
    dtype = jnp.bfloat16 if config.model.get("compute_dtype") == "bfloat16" else None
    model = build_captioner(config, dtype=dtype)
    text_field = TextField(vocab_path=config.dataset.vocab_path)

    params = load_any_checkpoint(config.exp.checkpoint, model, config)
    dataloaders, _ = build_coco_dataloaders(config, mode="finetune")
    generate = make_caption_generator(
        model, beam_size=config.model.beam_size, max_len=config.model.beam_len,
        bos_idx=config.model.bos_idx, eos_idx=config.model.eos_idx,
    )
    for split in ("valid_dict", "test_dict"):
        scores, _, avg_time = evaluate_metrics(
            generate, params, dataloaders[split], text_field,
            split=split.replace("_dict", ""),
        )
        print(f"{split}: {scores}  ({avg_time:.4f}s/batch)")


if __name__ == "__main__":
    main()
