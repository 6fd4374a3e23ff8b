"""Orbax checkpointing for caption/detector training.

Replaces the reference's ``torch.save`` dict checkpoints
(engine/caption_engine.py:83-103) with Orbax:

- same logical content: params, optimizer state, scheduler tick counter,
  epoch, best CIDErs, config snapshot;
- same file roles: ``last``, ``best_valid``, ``best_test``, per-phase and
  per-epoch checkpoints (train_caption.py:181-202);
- sharded-array aware (a checkpoint written from a mesh restores onto any
  other mesh).

``strict=False`` loads print missing/unexpected key counts like the
reference (train_caption.py:39,132).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(workdir: str, name: str) -> str:
    return os.path.join(os.path.abspath(workdir), "checkpoints", name)


def save_checkpoint(
    workdir: str,
    name: str,
    *,
    state: Any,
    epoch: int,
    best_ciders: tuple[float, float] = (0.0, 0.0),
    scores: Any = None,
    config: Any = None,
) -> None:
    """Save a named checkpoint (e.g. 'last', 'best_valid', 'ft_xe', 'epoch_17')."""
    path = _ckpt_dir(workdir, name)
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "global_steps": state.global_steps,
        "epoch": np.asarray(epoch),
        "best_ciders": np.asarray(best_ciders, np.float32),
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    if config is not None:
        try:
            config.to_yaml(os.path.join(path, "config.yaml"))
        except Exception:
            pass


def restore_checkpoint_path(path: str, *, template: Optional[Any] = None):
    """Restore a checkpoint from a direct directory path (e.g. the
    ``exp.checkpoint`` warm-start of train_detector.py, which points at a
    previously saved ``.../checkpoints/<name>`` directory)."""
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            try:
                return ckptr.restore(path, item=template)
            except Exception as e:
                raise _maybe_fused_adam_hint(template, e) from e
        return ckptr.restore(path)


def restore_checkpoint(workdir: str, name: str, *, template: Optional[Any] = None):
    """Restore a named checkpoint; returns the payload dict."""
    path = _ckpt_dir(workdir, name)
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            try:
                return ckptr.restore(path, item=template)
            except Exception as e:
                raise _maybe_fused_adam_hint(template, e) from e
        return ckptr.restore(path)


def _maybe_fused_adam_hint(template: Any, err: Exception) -> Exception:
    """Turn an Orbax tree-structure mismatch into an actionable error when
    the likely cause is resuming under a different GRIT_FUSED_ADAM value
    (the flat transform stores Adam moments as ONE buffer per moment, so
    the optimizer-state layout differs from optax's per-leaf tree —
    docs/FLAGS.md)."""
    from grit_tpu.ops.fused_adam import FlatAdamState, fused_adam_impl

    has_flat = any(
        isinstance(node, FlatAdamState)
        for node in jax.tree.leaves(
            template, is_leaf=lambda x: isinstance(x, FlatAdamState)
        )
    )
    msg = str(err).lower()
    if "structure" in msg or "tree" in msg or "mismatch" in msg:
        return RuntimeError(
            "checkpoint restore failed on a tree-structure mismatch. "
            f"GRIT_FUSED_ADAM is currently {fused_adam_impl()!r} (template "
            f"{'has' if has_flat else 'does not have'} the flat Adam state); "
            "a checkpoint must be resumed under the same GRIT_FUSED_ADAM "
            "value it was written with (docs/FLAGS.md). "
            f"Original error: {err}"
        )
    return err


def load_params_flexible(model_params: Any, loaded: Any) -> tuple[Any, int, int]:
    """strict=False-style merge: copy matching leaves, count missing/unexpected.

    Returns (merged_params, n_missing, n_unexpected) — mirrors the
    reference's load report (train_caption.py:39).
    """
    missing = [0]
    unexpected = [0]

    def merge(tmpl, src, path=()):
        if isinstance(tmpl, dict):
            out = {}
            src = src if isinstance(src, dict) else {}
            for k, v in tmpl.items():
                if k in src:
                    out[k] = merge(v, src[k], path + (k,))
                else:
                    missing[0] += 1
                    out[k] = v
            unexpected[0] += len([k for k in src if k not in tmpl])
            return out
        if src is None or tuple(np.shape(src)) != tuple(np.shape(tmpl)):
            missing[0] += 1
            return tmpl
        return jax.numpy.asarray(src, dtype=np.asarray(tmpl).dtype)

    merged = merge(model_params, loaded)
    return merged, missing[0], unexpected[0]
