"""PyTorch checkpoint -> grit_tpu params converter.

Loads the reference's released ``.pth`` checkpoints (caption format:
``state_dict`` key, engine/caption_engine.py:93-103; detector format:
``model`` key, engine/hooks.py:57-106) and produces the exactly-equivalent
flax parameter pytree, so the TPU stack reproduces the published CIDEr.

Layout differences handled:
- torch Linear ``weight`` is [out, in]  -> flax Dense ``kernel`` [in, out] (transposed);
- torch Conv2d ``weight`` is OIHW       -> flax Conv ``kernel`` HWIO;
- torch LayerNorm/GroupNorm ``weight``  -> flax ``scale``;
- embeddings / raw parameters (word_emb, query_embed, level_embed,
  relative_position_bias_table, in_proj_weight, m_k/m_v) copy as-is;
- buffers that our model recomputes (``relative_position_index``, the frozen
  sinusoid ``pos_emb``) and dead modules (PatchMerging ``expansion``/
  ``norm2`` — swin_model.py:321-322; unused backbone out-norms ``norm1..3``
  — :609-614) are skipped.

The module tree was named to mirror the reference, so translation is a
mechanical path rewrite (``layers.3`` -> ``layers_3`` etc.).
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np

# torch keys to drop entirely (recomputed or dead in our model).
# NOTE: cap_generator.pos_emb.weight is deliberately NOT here — the
# reference's Transformer.init_weights xavier-clobbers the "frozen
# sinusoid" table (transformer.py:48-50 iterates ALL parameters incl.
# requires_grad=False ones), so released checkpoints carry a random
# position table that MUST be loaded, not recomputed.
_SKIP_PATTERNS = [
    r"relative_position_index$",
    r"\.downsample\.expansion\.",
    r"\.downsample\.norm2\.",
    r"backbone\.norm[0-9]\.",          # unused out_indices norms
    r"\.running_keys$", r"\.running_values$",   # stateful buffers
    r"running_mask_x$", r"running_seq$",
    r"gri_feat$", r"gri_mask$", r"reg_feat$", r"reg_mask$",  # beam state buffers
]

# '.weight' parents that are normalization layers (-> 'scale', no transpose)
_NORM_PARENTS = re.compile(
    r"(^|\.)(norm\d?|layer_norm|patch_embed_norm|.*_norm)$"
)

# raw parameters copied verbatim (no kernel/transpose handling)
_RAW_LEAVES = {
    "relative_position_bias_table",
    "in_proj_weight",
    "in_proj_bias",
    "level_embed",
    "m_k",
    "m_v",
}


def _rename_path(key: str) -> list[str]:
    """Rewrite a torch dotted path into our flax module path tokens."""
    k = key
    # structural renames (reference torch name -> our module name)
    k = k.replace("patch_embed.proj", "patch_embed_proj")
    k = k.replace("patch_embed.norm", "patch_embed_norm")
    k = re.sub(r"input_proj\.(\d+)\.0", r"input_proj_\1_conv", k)
    k = re.sub(r"input_proj\.(\d+)\.1", r"input_proj_\1_norm", k)
    k = re.sub(r"class_embed\.(\d+)", r"class_embed_\1", k)
    k = re.sub(r"bbox_embed\.(\d+)", r"bbox_embed_\1", k)
    k = re.sub(r"decoder_layers\.(\d+)", r"decoder_layers_\1", k)
    k = re.sub(r"blocks\.(\d+)", r"blocks_\1", k)
    k = re.sub(r"layers\.(\d+)", r"layers_\1", k)
    k = k.replace("reference_points.", "reference_points/")  # Dense module
    k = k.replace("self_attn.out_proj", "self_attn/out_proj")
    # Embedding .weight collapses onto the param itself
    k = k.replace("word_emb.weight", "word_emb")
    k = k.replace("pos_emb.weight", "pos_emb")
    k = k.replace("query_embed.weight", "query_embed")
    return k.replace(".", "/").split("/")


def translate(key: str, tensor: np.ndarray):
    """-> (flax path tuple, value) or None if the key is skipped."""
    for pat in _SKIP_PATTERNS:
        if re.search(pat, key):
            return None
    path = _rename_path(key)
    leaf = path[-1]
    value = np.asarray(tensor)

    if leaf in _RAW_LEAVES or leaf in ("word_emb", "pos_emb", "query_embed"):
        return tuple(path), value

    parent = path[-2] if len(path) >= 2 else ""
    if leaf == "weight":
        if _NORM_PARENTS.search(parent):
            path[-1] = "scale"
            return tuple(path), value
        if value.ndim == 4:  # conv OIHW -> HWIO
            path[-1] = "kernel"
            return tuple(path), value.transpose(2, 3, 1, 0)
        if value.ndim == 2:  # linear [out, in] -> [in, out]
            path[-1] = "kernel"
            return tuple(path), value.T
        # 1-D weight (e.g. norm without match) -> scale
        path[-1] = "scale"
        return tuple(path), value
    if leaf == "bias":
        return tuple(path), value
    # any other raw parameter
    return tuple(path), value


def state_dict_to_params(state_dict: dict, prefix_map=None) -> dict:
    """Convert a torch state_dict {key: tensor} into a nested flax params dict."""
    tree: dict = {}
    skipped = []
    for key, tensor in state_dict.items():
        out = translate(key, np.asarray(tensor))
        if out is None:
            skipped.append(key)
            continue
        path, value = out
        node = tree
        for tok in path[:-1]:
            node = node.setdefault(tok, {})
        node[path[-1]] = value
    return tree


def load_caption_checkpoint(path: str) -> dict:
    """Load a reference caption checkpoint (.pth) -> {'params': ...}.

    Accepts the training-loop format (``state_dict`` key,
    caption_engine.py:93-103) or a bare state_dict.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return {"params": state_dict_to_params(sd)}


def load_detector_checkpoint(path: str) -> dict:
    """Load a reference detector checkpoint (``model`` key) -> detector params."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return {"params": state_dict_to_params(sd)}


def verify_against(params: Any, converted: Any, path=()) -> list[str]:
    """Compare a model-initialized tree vs a converted tree; report mismatches."""
    problems = []
    if isinstance(params, dict) or isinstance(converted, dict):
        pk = set(params.keys()) if isinstance(params, dict) else set()
        ck = set(converted.keys()) if isinstance(converted, dict) else set()
        for k in pk - ck:
            problems.append(f"missing in checkpoint: {'/'.join(path + (k,))}")
        for k in ck - pk:
            problems.append(f"unexpected in checkpoint: {'/'.join(path + (k,))}")
        for k in pk & ck:
            problems += verify_against(params[k], converted[k], path + (k,))
        return problems
    if tuple(np.shape(params)) != tuple(np.shape(converted)):
        problems.append(
            f"shape mismatch at {'/'.join(path)}: "
            f"model {np.shape(params)} vs ckpt {np.shape(converted)}"
        )
    return problems
