"""Generic attention library for the caption stack.

Math parity with the reference attention lib (models/common/attention.py):

- ``Attention``  — scaled dot-product with optional learned memory slots:
  keys get ``m_k * sqrt(d_k)`` and values ``m_v * sqrt(n_memories)`` appended
  (attention.py:55-69); the attention mask applies only to the real keys.
- ``MultiHeadAttention`` — attention + dropout + **post-LN residual**
  ``LN(q + dropout(attn(q,k,v)))`` (attention.py:166-184).
- ``FeedForward`` — Linear-ReLU-Linear with post-LN residual
  (models/common/pos_embed.py:34-48).

Decode-time KV caching is explicit functional state: ``__call__`` accepts a
``cache=(k_cache, v_cache)`` of fixed shape [B, T_max, D] plus the current
``cache_index``; the *projected* k/v for the incoming token are written at
that index and attention runs over the full cache with a length mask.  This
replaces the reference's dynamic-shape ``running_keys`` concatenation
(attention.py:170-177) with fixed shapes XLA can compile once.  Caching
projected (not raw) k/v is mathematically identical because the projections
are position-independent linear maps.

Masks use the reference convention: boolean, True = masked out.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# pre-LN eps matching torch nn.LayerNorm default
LN_EPS = 1e-5

# Decode-scan projection merging: compute q/k/v (self-attention) and the two
# cross-attention q's with ONE concatenated-weight matmul each instead of
# 3 + 2 separate Dense launches per layer per step.  Each output column of a
# matmul is an independent dot over the same contraction, so the merged
# results are bit-identical to the splits; parameters are untouched (the
# concat happens on the fly and XLA hoists it out of the scan as
# loop-invariant).  Chip A/B 2026-08-19 (b128 beam5 eval): 294.6 vs 293.8
# img/s — small but consistent, and the launch saving grows as batch
# shrinks (the scan gets more latency-bound); default ON.
_MERGED_PROJ = os.environ.get("GRIT_DECODE_MERGED_PROJ", "1") == "1"


def merged_proj_enabled() -> bool:
    return _MERGED_PROJ


def _dense_wb(d: nn.Dense):
    p = d.variables["params"]
    return p["kernel"], p.get("bias")


# Decode-time K/V head-split layout: loop-invariant visual K/V and the
# self-attention cache are stored [B, H, T, Dh] — the layout the score/value
# dots consume — instead of [B, T, H*Dh].  With the flat layout XLA's layout
# assignment re-laid every one of them INSIDE the decode scan each step
# (b128 trace: 6 copies/step on the grid K/V alone, plus cache copies); the
# head-split tensors are materialized ONCE outside the scan.  Same dots and
# contraction dims; outputs agree to fp32 rounding (XLA may reassociate the
# d_k summation per layout) — decision parity asserted by TestKVHsplit.
_KV_HSPLIT = os.environ.get("GRIT_DECODE_KV_HSPLIT", "0") == "1"

# GRIT_VIS_KV_HSPLIT: head-split ONLY the loop-invariant visual K/V (not the
# self-attention caches).  The full GRIT_DECODE_KV_HSPLIT lost its chip A/B
# (274.3 vs 294.9) because the cache scatter moved to a middle dim and the
# beam-reorder gather walked a 4-D cache — both per step; the VISUAL K/V
# half has neither cost (no writes, no reorder) and removes the 6 layout
# copies/step the b128 trace charged to the grid K/V re-lay inside the scan.
_VIS_KV_HSPLIT = os.environ.get("GRIT_VIS_KV_HSPLIT", "1") == "1"


def kv_hsplit_enabled() -> bool:
    return _KV_HSPLIT


def vis_kv_hsplit_enabled() -> bool:
    return _VIS_KV_HSPLIT or _KV_HSPLIT


KVCache = tuple[jnp.ndarray, jnp.ndarray]
"""(k, v), each [B, T_max, d_model] — or [B, H, T_max, d_head] head-split
when ``kv_hsplit_enabled()`` (GRIT_DECODE_KV_HSPLIT)."""


def dense(features: int, name: str, use_bias: bool = True, dtype=None) -> nn.Dense:
    return nn.Dense(
        features,
        use_bias=use_bias,
        name=name,
        dtype=dtype,
        kernel_init=nn.initializers.xavier_uniform(),
        bias_init=nn.initializers.zeros_init(),
    )


class Attention(nn.Module):
    """Scaled dot-product attention with optional memory slots."""

    d_model: int
    n_heads: int
    dropout: float = 0.2
    n_memories: int = 0
    dtype: Any = None

    def setup(self):
        self.fc_q = dense(self.d_model, "fc_q", dtype=self.dtype)
        self.fc_k = dense(self.d_model, "fc_k", dtype=self.dtype)
        self.fc_v = dense(self.d_model, "fc_v", dtype=self.dtype)
        self.fc_o = dense(self.d_model, "fc_o", dtype=self.dtype)
        self.attn_drop = nn.Dropout(self.dropout)
        if self.n_memories > 0:
            init = nn.initializers.normal(stddev=0.01)
            self.m_k = self.param("m_k", init, (1, self.n_memories, self.d_model))
            self.m_v = self.param("m_v", init, (1, self.n_memories, self.d_model))

    def __call__(
        self,
        q: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
        kv_projected: bool = False,
        kv_fold: int = 1,
        q_proj: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """``kv_fold=f``: q has f times as many rows as k/v — every f
        consecutive q rows (e.g. the beams of one image) attend to the SAME
        kv row.  The fold keeps decode-time visual K/V per-image instead of
        beam-tiled: one batched dot over [B, H, f*nq, .] replaces f
        duplicated ones, and the loop-invariant K/V tensors stay f times
        smaller (the beam tiling at b128/k5 re-materialized ~50 ms of
        broadcast/layout copies INSIDE the decode loop — docs/NOTES.md).

        ``q_proj``: the already-projected query (``fc_q(q)`` computed by the
        caller, e.g. through a merged-weight matmul); ``q`` is then unused."""
        d_k = self.d_model // self.n_heads
        bq, nq = (q if q_proj is None else q_proj).shape[:2]
        b = bq // kv_fold

        qh = self.fc_q(q) if q_proj is None else q_proj
        if kv_projected and k.ndim == 4:
            # pre-head-split [B, H, S, Dh] K/V (decode path, GRIT_DECODE_KV_HSPLIT):
            # already in the layout the dots consume — no per-step re-lay.
            if self.n_memories > 0:
                # project_kv never head-splits when memories exist, so this
                # branch is unreachable from the framework's own call sites
                raise ValueError("head-split K/V path expects n_memories == 0")
            kh4, vh4 = k, v
            qh = qh.reshape(b, kv_fold * nq, self.n_heads, d_k)
            scores = jnp.einsum("bqhd,bhkd->bhqk", qh, kh4) / np.sqrt(d_k)
            if mask is not None:
                scores = jnp.where(mask, jnp.asarray(-jnp.inf, scores.dtype), scores)
            p = nn.softmax(scores, axis=-1)
            p = self.attn_drop(p, deterministic=deterministic)
            out = jnp.einsum("bhqk,bhkd->bqhd", p, vh4).reshape(bq, nq, self.d_model)
            return self.fc_o(out)
        if kv_projected:
            kh, vh = k, v
        else:
            kh = self.fc_k(k)
            vh = self.fc_v(v)
        nk = kh.shape[1]

        if self.n_memories > 0:
            mk = jnp.broadcast_to(
                self.m_k * np.sqrt(d_k), (b, self.n_memories, self.d_model)
            )
            mv = jnp.broadcast_to(
                self.m_v * np.sqrt(self.n_memories), (b, self.n_memories, self.d_model)
            )
            kh = jnp.concatenate([kh, mk.astype(kh.dtype)], axis=1)
            vh = jnp.concatenate([vh, mv.astype(vh.dtype)], axis=1)

        # heads stay in the projection layout [B, L, H, D]; the einsums carry
        # the head batching so XLA folds it into the dot operand loads
        # instead of emitting [B, L, H, D] -> [B, H, L, D] transpose copies
        # (which ran ~120 times inside the decode scan at b128/k5)
        def split_heads(x):
            return x.reshape(x.shape[0], x.shape[1], self.n_heads, d_k)

        qh = split_heads(qh.reshape(b, kv_fold * nq, self.d_model))
        kh, vh = split_heads(kh), split_heads(vh)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(d_k)
        if mask is not None:
            neg = jnp.asarray(-jnp.inf, scores.dtype)
            if self.n_memories > 0:
                real = jnp.where(mask, neg, scores[..., :nk])
                scores = jnp.concatenate([real, scores[..., nk:]], axis=-1)
            else:
                scores = jnp.where(mask, neg, scores)
        p = nn.softmax(scores, axis=-1)
        p = self.attn_drop(p, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(bq, nq, self.d_model)
        return self.fc_o(out)

    def project_kv_vis(self, k: jnp.ndarray, v: jnp.ndarray) -> KVCache:
        """Project the loop-invariant visual K/V for the decode scan.

        Head-split [B, H, S, Dh] under GRIT_VIS_KV_HSPLIT (or the full
        GRIT_DECODE_KV_HSPLIT): materialized ONCE outside the scan in the
        layout the in-scan score/value dots consume — the flat layout was
        re-laid by XLA every step (6 copies/step on the grid K/V at b128)."""
        if vis_kv_hsplit_enabled() and self.n_memories == 0:
            d_k = self.d_model // self.n_heads

            def split4(x):
                b, s, _ = x.shape
                return x.reshape(b, s, self.n_heads, d_k).transpose(0, 2, 1, 3)

            return split4(self.fc_k(k)), split4(self.fc_v(v))
        return self.project_kv(k, v)

    def project_kv(self, k: jnp.ndarray, v: jnp.ndarray) -> KVCache:
        """Apply fc_k/fc_v only (for writing projected entries into a KV cache)."""
        if _KV_HSPLIT and self.n_memories == 0:
            # memory slots are appended along the key axis AFTER projection
            # (flat [B, S, D] layout) — keep that path unchanged; only
            # memory-free attentions store head-split K/V
            d_k = self.d_model // self.n_heads

            def split4(x):
                b, s, _ = x.shape
                return x.reshape(b, s, self.n_heads, d_k).transpose(0, 2, 1, 3)

            return split4(self.fc_k(k)), split4(self.fc_v(v))
        return self.fc_k(k), self.fc_v(v)


class MultiHeadAttention(nn.Module):
    """Attention + dropout + post-LN residual, with optional KV cache."""

    d_model: int
    n_heads: int
    dropout: float = 0.1
    n_memories: int = 0
    dtype: Any = None

    def setup(self):
        self.attention = Attention(
            self.d_model, self.n_heads, self.dropout, self.n_memories,
            dtype=self.dtype, name="attention",
        )
        self.drop = nn.Dropout(self.dropout)
        self.layer_norm = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="layer_norm")

    def __call__(
        self,
        queries: jnp.ndarray,
        keys: jnp.ndarray,
        values: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
        cache: Optional[KVCache] = None,
        cache_index: Optional[jnp.ndarray] = None,
        kv_projected: bool = False,
        kv_fold: int = 1,
        q_proj: Optional[jnp.ndarray] = None,
    ):
        """Returns output, or (output, new_cache) when a cache is given.

        With a cache, ``keys``/``values`` must be the current step's single
        token [B, 1, D]; attention runs over cache slots <= cache_index.
        ``kv_projected``: keys/values already went through fc_k/fc_v.
        ``kv_fold``: see Attention.__call__ (beam-folded shared K/V).
        ``q_proj``: pre-projected query (merged-weight matmul); the post-LN
        residual still uses the raw ``queries``.
        """
        if cache is None:
            out = self.attention(
                queries, keys, values, mask,
                deterministic=deterministic, kv_projected=kv_projected,
                kv_fold=kv_fold, q_proj=q_proj,
            )
            out = self.drop(out, deterministic=deterministic)
            return self.layer_norm(queries + out)

        k_cache, v_cache = cache
        t_max = k_cache.shape[2] if k_cache.ndim == 4 else k_cache.shape[1]
        if (
            _MERGED_PROJ
            and q_proj is None
            and queries is keys
            and not self.is_initializing()
        ):
            # decode self-attention (q == k == v == the incoming token): one
            # [D, 3D] matmul for q/k/v — bit-identical per output column to
            # the three Dense calls; weights concatenated on the fly (XLA
            # hoists the loop-invariant concat out of the decode scan)
            att = self.attention
            ws, bs = zip(*(_dense_wb(d) for d in (att.fc_q, att.fc_k, att.fc_v)))
            w, b_ = jnp.concatenate(ws, axis=1), jnp.concatenate(bs)
            x = keys
            if att.dtype is not None:  # nn.Dense computes in the module dtype
                w, b_, x = w.astype(att.dtype), b_.astype(att.dtype), x.astype(att.dtype)
            qkv = x @ w + b_
            q_proj, k_new, v_new = jnp.split(qkv, 3, axis=-1)
        else:
            k_new, v_new = self.attention.project_kv(keys, values)
        idx = cache_index
        if k_cache.ndim == 4:  # head-split cache [B, H, T, Dh]
            b_, h_, _, d_ = k_cache.shape

            def entry(x):  # [B,1,D] flat (merged proj) or [B,H,1,Dh]
                return x[:, 0].reshape(b_, h_, d_) if x.ndim == 3 else x[:, :, 0]

            k_cache = k_cache.at[:, :, idx].set(entry(k_new))
            v_cache = v_cache.at[:, :, idx].set(entry(v_new))
        else:
            k_cache = k_cache.at[:, idx].set(k_new[:, 0])
            v_cache = v_cache.at[:, idx].set(v_new[:, 0])
        # mask out slots beyond the current step
        slot = jnp.arange(t_max)[None, None, None, :] > idx  # [1,1,1,T]
        full_mask = slot if mask is None else jnp.logical_or(mask, slot)
        out = self.attention(
            queries, k_cache, v_cache, full_mask,
            deterministic=deterministic, kv_projected=True, q_proj=q_proj,
        )
        out = self.drop(out, deterministic=deterministic)
        return self.layer_norm(queries + out), (k_cache, v_cache)


class FeedForward(nn.Module):
    """Position-wise FFN with post-LN residual (pos_embed.py:34-48)."""

    d_model: int = 512
    d_ff: int = 2048
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        h = dense(self.d_ff, "fc1", dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = dense(self.d_model, "fc2", dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="layer_norm")(x + h)
