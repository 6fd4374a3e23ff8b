"""Autoregressive caption generator (decoder) over dual visual features.

Math parity: reference models/caption/cap_generator.py.

- token embedding + frozen sinusoid position table (padding row 0 zeroed),
- N post-LN layers in three variants: ``parallel`` (default — dual
  cross-attention with sigmoid-gated fusion), ``sequential``, ``concat``,
- tied nothing; output head is a bias-free Linear + log_softmax.

The reference computes BOTH fusion gates with ``fc_alpha1``'s weights
(cap_generator.py:48-49 — ``fc_alpha2`` is created but unused).  Checkpoint
parity requires replicating this, controlled by ``replicate_alpha_bug``
(default True).  Set False for a fixed, trained-from-scratch model.

Two execution paths:
- ``__call__``: full-sequence teacher forcing (training / XE loss) with a
  causal + pad mask, one fused XLA graph.
- ``decode_step``: single-token step against fixed-shape KV caches, used by
  greedy/beam decoding inside ``lax.scan`` (replaces the reference's
  dynamic-shape stateful buffers, containers.py:13-84).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from grit_tpu.models.attention import (
    LN_EPS,
    FeedForward,
    KVCache,
    MultiHeadAttention,
    _dense_wb,
    dense,
    kv_hsplit_enabled,
    merged_proj_enabled,
)
from grit_tpu.ops.decode_layer import fused_decode_tail_applicable
from grit_tpu.ops.posemb import sinusoid_encoding_table

DecodeCache = dict  # {'layers': tuple[KVCache, ...], 'pad_hist': [B, T] bool}


class ParallelAttentionLayer(nn.Module):
    d_model: int = 512
    n_heads: int = 8
    d_ff: int = 2048
    dropout: float = 0.1
    n_memories: int = 0
    replicate_alpha_bug: bool = True
    dtype: Any = None

    def setup(self):
        self.self_att = MultiHeadAttention(
            self.d_model, self.n_heads, self.dropout, n_memories=0,
            dtype=self.dtype, name="self_att",
        )
        self.vis_att1 = MultiHeadAttention(
            self.d_model, self.n_heads, self.dropout, n_memories=self.n_memories,
            dtype=self.dtype, name="vis_att1",
        )
        self.vis_att2 = MultiHeadAttention(
            self.d_model, self.n_heads, self.dropout, n_memories=self.n_memories,
            dtype=self.dtype, name="vis_att2",
        )
        self.fc_alpha1 = dense(self.d_model, "fc_alpha1", dtype=self.dtype)
        self.fc_alpha2 = dense(self.d_model, "fc_alpha2", dtype=self.dtype)
        self.pwff = FeedForward(self.d_model, self.d_ff, self.dropout, dtype=self.dtype, name="pwff")

    def _fuse(self, self_att, enc1, enc2, mask_pad, *, deterministic):
        alpha_fc2 = self.fc_alpha1 if self.replicate_alpha_bug else self.fc_alpha2
        if self.replicate_alpha_bug:
            # touch fc_alpha2 so its (unused) parameters exist — the reference
            # checkpoint carries them (cap_generator.py:29,48-49); XLA DCEs
            # this dead call.
            self.fc_alpha2(jnp.zeros((1, 1, 2 * self.d_model), self_att.dtype))
        alpha1 = nn.sigmoid(self.fc_alpha1(jnp.concatenate([self_att, enc1], -1)))
        alpha2 = nn.sigmoid(alpha_fc2(jnp.concatenate([self_att, enc2], -1)))
        enc = (enc1 * alpha1 + enc2 * alpha2) / np.sqrt(2)
        enc = enc * mask_pad
        return self.pwff(enc, deterministic=deterministic) * mask_pad

    def __call__(self, x, y1, y2, mask_pad, mask_x, mask_y1, mask_y2, *, deterministic=True):
        self_att = self.self_att(x, x, x, mask_x, deterministic=deterministic) * mask_pad
        enc1 = self.vis_att1(self_att, y1, y1, mask_y1, deterministic=deterministic) * mask_pad
        enc2 = self.vis_att2(self_att, y2, y2, mask_y2, deterministic=deterministic) * mask_pad
        return self._fuse(self_att, enc1, enc2, mask_pad, deterministic=deterministic)

    def precompute_vis_kv(self, y1, y2):
        """Project the (step-invariant) visual K/V once before decoding."""
        return {
            "att1": self.vis_att1.attention.project_kv_vis(y1, y1),
            "att2": self.vis_att2.attention.project_kv_vis(y2, y2),
        }

    def decode(self, x, y1, y2, mask_pad, mask_x, mask_y1, mask_y2, cache, cache_index,
               *, deterministic=True, vis_kv=None, vis_fold=1):
        self_att, cache = self.self_att(
            x, x, x, mask_x, deterministic=deterministic,
            cache=cache, cache_index=cache_index,
        )
        self_att = self_att * mask_pad
        if (
            vis_kv is not None
            and deterministic
            and self.n_memories == 0
            and fused_decode_tail_applicable(vis_kv)
            and not self.is_initializing()
        ):
            return self._fused_tail(
                self_att, vis_kv, mask_pad, mask_y1, mask_y2, vis_fold
            ), cache
        if vis_kv is not None:
            # visual K/V precomputed once per image (they never change across
            # decode steps) — the per-step cross-attention collapses to one
            # small q-projection + attention
            k1, v1 = vis_kv["att1"]
            k2, v2 = vis_kv["att2"]
            q1 = q2 = None
            if merged_proj_enabled() and not self.is_initializing():
                # both cross attentions query from the same self_att rows:
                # one [D, 2D] matmul for q1/q2 (bit-identical per column;
                # see attention.py GRIT_DECODE_MERGED_PROJ)
                a1, a2 = self.vis_att1.attention, self.vis_att2.attention
                (w1, b1), (w2, b2) = _dense_wb(a1.fc_q), _dense_wb(a2.fc_q)
                w, b_ = jnp.concatenate([w1, w2], axis=1), jnp.concatenate([b1, b2])
                x = self_att
                if a1.dtype is not None:
                    w, b_, x = w.astype(a1.dtype), b_.astype(a1.dtype), x.astype(a1.dtype)
                q1, q2 = jnp.split(x @ w + b_, 2, axis=-1)
            enc1 = self.vis_att1(
                self_att, k1, v1, mask_y1, deterministic=deterministic,
                kv_projected=True, kv_fold=vis_fold, q_proj=q1,
            ) * mask_pad
            enc2 = self.vis_att2(
                self_att, k2, v2, mask_y2, deterministic=deterministic,
                kv_projected=True, kv_fold=vis_fold, q_proj=q2,
            ) * mask_pad
        else:
            enc1 = self.vis_att1(self_att, y1, y1, mask_y1, deterministic=deterministic,
                                 kv_fold=vis_fold) * mask_pad
            enc2 = self.vis_att2(self_att, y2, y2, mask_y2, deterministic=deterministic,
                                 kv_fold=vis_fold) * mask_pad
        return self._fuse(self_att, enc1, enc2, mask_pad, deterministic=deterministic), cache

    def _fused_tail(self, self_att, vis_kv, mask_pad, mask_y1, mask_y2, vis_fold):
        """GRIT_DECODE_FUSED_LAYER: the whole post-self-attention tail (two
        cross attentions + gates + FFN + three LayerNorms) as ONE Pallas
        program per image block — the decode scan is launch-latency-bound
        (~35 XLA ops per layer per step at ~5% MFU).  Weights are read from
        the same submodules the XLA path uses; the alpha-gate concat matmul
        splits into two dots (f32 summation order is the only difference)."""
        from grit_tpu.ops.decode_layer import fused_decode_layer_tail

        k1, v1 = vis_kv["att1"]
        k2, v2 = vis_kv["att2"]
        a1, a2 = self.vis_att1.attention, self.vis_att2.attention
        d = self.d_model
        wa1, ba1 = _dense_wb(self.fc_alpha1)
        alpha2_mod = self.fc_alpha1 if self.replicate_alpha_bug else self.fc_alpha2
        wa2, ba2 = _dense_wb(alpha2_mod)
        pwp = self.pwff.variables["params"]

        def ln_wb(mod):
            p = mod.variables["params"]["layer_norm"]
            return p["scale"], p["bias"]

        def cast(w):
            return w.astype(self.dtype) if self.dtype is not None else w

        weights = (
            *(cast(t) for t in (*_dense_wb(a1.fc_q), *_dense_wb(a1.fc_o))),
            *ln_wb(self.vis_att1),
            *(cast(t) for t in (*_dense_wb(a2.fc_q), *_dense_wb(a2.fc_o))),
            *ln_wb(self.vis_att2),
            cast(wa1[:d]), cast(wa1[d:]), cast(ba1),
            cast(wa2[:d]), cast(wa2[d:]), cast(ba2),
            cast(pwp["fc1"]["kernel"]), cast(pwp["fc1"]["bias"]),
            cast(pwp["fc2"]["kernel"]), cast(pwp["fc2"]["bias"]),
            pwp["layer_norm"]["scale"], pwp["layer_norm"]["bias"],
        )
        return fused_decode_layer_tail(
            self_att, k1, v1, mask_y1, k2, v2, mask_y2, mask_pad, weights,
            fold=vis_fold, n_heads=self.n_heads,
        )


class SequentialAttentionLayer(nn.Module):
    d_model: int = 512
    n_heads: int = 8
    d_ff: int = 2048
    dropout: float = 0.1
    n_memories: int = 0
    dtype: Any = None

    def setup(self):
        self.self_att = MultiHeadAttention(
            self.d_model, self.n_heads, self.dropout, n_memories=0,
            dtype=self.dtype, name="self_att",
        )
        self.vis_att1 = MultiHeadAttention(
            self.d_model, self.n_heads, self.dropout, n_memories=self.n_memories,
            dtype=self.dtype, name="vis_att1",
        )
        self.vis_att2 = MultiHeadAttention(
            self.d_model, self.n_heads, self.dropout, n_memories=self.n_memories,
            dtype=self.dtype, name="vis_att2",
        )
        self.pwff = FeedForward(self.d_model, self.d_ff, self.dropout, dtype=self.dtype, name="pwff")

    def __call__(self, x, y1, y2, mask_pad, mask_x, mask_y1, mask_y2, *, deterministic=True):
        out = self.self_att(x, x, x, mask_x, deterministic=deterministic) * mask_pad
        out = self.vis_att1(out, y1, y1, mask_y1, deterministic=deterministic) * mask_pad
        out = self.vis_att2(out, y2, y2, mask_y2, deterministic=deterministic) * mask_pad
        return self.pwff(out, deterministic=deterministic) * mask_pad

    def decode(self, x, y1, y2, mask_pad, mask_x, mask_y1, mask_y2, cache, cache_index,
               *, deterministic=True, vis_fold=1):
        out, cache = self.self_att(
            x, x, x, mask_x, deterministic=deterministic,
            cache=cache, cache_index=cache_index,
        )
        out = out * mask_pad
        out = self.vis_att1(out, y1, y1, mask_y1, deterministic=deterministic,
                            kv_fold=vis_fold) * mask_pad
        out = self.vis_att2(out, y2, y2, mask_y2, deterministic=deterministic,
                            kv_fold=vis_fold) * mask_pad
        return self.pwff(out, deterministic=deterministic) * mask_pad, cache


class ConcatAttentionLayer(nn.Module):
    """Single cross-attention over concatenated [grid; region] features.

    Note: the reference's concat branch reads ``vis_inputs['grid_feat']``
    (a key that never exists — cap_generator.py:151) and would KeyError.
    Here the concat variant actually works: callers pass the concatenated
    features as ``y1`` and the concatenated mask as ``mask_y1``.
    """

    d_model: int = 512
    n_heads: int = 8
    d_ff: int = 2048
    dropout: float = 0.1
    n_memories: int = 0
    dtype: Any = None

    def setup(self):
        self.self_att = MultiHeadAttention(
            self.d_model, self.n_heads, self.dropout, n_memories=0,
            dtype=self.dtype, name="self_att",
        )
        self.vis_att = MultiHeadAttention(
            self.d_model, self.n_heads, self.dropout, n_memories=self.n_memories,
            dtype=self.dtype, name="vis_att",
        )
        self.pwff = FeedForward(self.d_model, self.d_ff, self.dropout, dtype=self.dtype, name="pwff")

    def __call__(self, x, y1, y2, mask_pad, mask_x, mask_y1, mask_y2, *, deterministic=True):
        out = self.self_att(x, x, x, mask_x, deterministic=deterministic) * mask_pad
        out = self.vis_att(out, y1, y1, mask_y1, deterministic=deterministic) * mask_pad
        return self.pwff(out, deterministic=deterministic) * mask_pad

    def decode(self, x, y1, y2, mask_pad, mask_x, mask_y1, mask_y2, cache, cache_index,
               *, deterministic=True, vis_fold=1):
        out, cache = self.self_att(
            x, x, x, mask_x, deterministic=deterministic,
            cache=cache, cache_index=cache_index,
        )
        out = out * mask_pad
        out = self.vis_att(out, y1, y1, mask_y1, deterministic=deterministic,
                           kv_fold=vis_fold) * mask_pad
        return self.pwff(out, deterministic=deterministic) * mask_pad, cache


GENERATOR_LAYER = {
    "parallel": ParallelAttentionLayer,
    "sequential": SequentialAttentionLayer,
    "concat": ConcatAttentionLayer,
}


class CaptionGenerator(nn.Module):
    vocab_size: int
    max_len: int
    n_layers: int
    pad_idx: int
    d_model: int = 512
    n_heads: int = 8
    d_ff: int = 2048
    dropout: float = 0.1
    decoder_name: str = "parallel"
    replicate_alpha_bug: bool = True
    dtype: Any = None

    def setup(self):
        self.word_emb = self.param(
            "word_emb", nn.initializers.xavier_uniform(), (self.vocab_size, self.d_model)
        )
        # A loadable parameter, NOT a baked constant: the reference's
        # Transformer.init_weights xavier-clobbers its "frozen sinusoid"
        # pos_emb (transformer.py:48-50 touches requires_grad=False params
        # too), so released checkpoints carry a random table that must be
        # restored for caption parity.  Fresh our-side training starts from
        # true sinusoids; the optimizer never updates it (label 'frozen' in
        # engine/optim.py — requires_grad=False parity).
        self.pos_emb = self.param(
            "pos_emb",
            lambda key, shape: sinusoid_encoding_table(
                shape[0], shape[1], padding_idx=0
            ),
            (self.max_len + 1, self.d_model),
        )
        layer_cls = GENERATOR_LAYER[self.decoder_name]
        kwargs = dict(
            d_model=self.d_model, n_heads=self.n_heads, d_ff=self.d_ff,
            dropout=self.dropout, dtype=self.dtype,
        )
        if self.decoder_name == "parallel":
            kwargs["replicate_alpha_bug"] = self.replicate_alpha_bug
        self.layers = [layer_cls(**kwargs, name=f"layers_{i}") for i in range(self.n_layers)]
        self.fc = dense(self.vocab_size, "fc", use_bias=False, dtype=self.dtype)

    def _vis(self, vis_inputs: dict):
        if self.decoder_name == "concat":
            y = jnp.concatenate([vis_inputs["gri_feat"], vis_inputs["reg_feat"]], axis=1)
            mask_y = jnp.concatenate([vis_inputs["gri_mask"], vis_inputs["reg_mask"]], axis=3)
            return y, y, mask_y, mask_y
        return (
            vis_inputs["gri_feat"], vis_inputs["reg_feat"],
            vis_inputs["gri_mask"], vis_inputs["reg_mask"],
        )

    def __call__(self, input_ids: jnp.ndarray, vis_inputs: dict, *, deterministic=True):
        """Teacher-forced forward.  input_ids: int [B, L] -> log-probs [B, L, V].

        Mask construction parity: cap_generator.py:126-145.
        """
        b, L = input_ids.shape
        is_pad = input_ids == self.pad_idx
        mask_pad = (~is_pad)[..., None].astype(self.pos_emb.dtype)  # [B, L, 1]
        causal = np.triu(np.ones((L, L), bool), k=1)[None, None]  # [1, 1, L, L]
        mask_x = jnp.logical_or(jnp.asarray(causal), is_pad[:, None, None, :])

        seq = jnp.arange(1, L + 1)[None, :] * (~is_pad)  # 0 at pads -> zero pos row
        x = self.word_emb[input_ids] + self.pos_emb[seq]
        if self.dtype is not None:
            x = x.astype(self.dtype)

        y1, y2, m1, m2 = self._vis(vis_inputs)
        for layer in self.layers:
            x = layer(x, y1, y2, mask_pad, mask_x, m1, m2, deterministic=deterministic)
        # fp32 log-softmax regardless of compute dtype: NLL losses and beam
        # scores need full resolution (bf16 quantizes log-probs to ~1e-2)
        return nn.log_softmax(self.fc(x).astype(jnp.float32), axis=-1)

    def init_cache(self, batch: int, t_max: int, dtype=jnp.float32) -> DecodeCache:
        if kv_hsplit_enabled():
            # head-split layout [B, H, T, Dh] — see attention.py KVCache
            zeros = jnp.zeros(
                (batch, self.n_heads, t_max, self.d_model // self.n_heads),
                self.dtype or dtype,
            )
        else:
            zeros = jnp.zeros((batch, t_max, self.d_model), self.dtype or dtype)
        return {
            "layers": tuple((zeros, zeros) for _ in range(self.n_layers)),
            "pad_hist": jnp.zeros((batch, t_max), bool),
        }

    def precompute_vis_kv(self, vis_inputs: dict):
        """Per-layer projected visual K/V (step-invariant; parallel decoder)."""
        if self.decoder_name != "parallel":
            return None
        y1, y2, _, _ = self._vis(vis_inputs)
        return tuple(layer.precompute_vis_kv(y1, y2) for layer in self.layers)

    def decode_step(
        self,
        token: jnp.ndarray,       # int [B, 1] — current input token
        t: jnp.ndarray,           # traced scalar timestep (0-based)
        vis_inputs: dict,
        cache: DecodeCache,
        *,
        deterministic: bool = True,
        vis_kv=None,              # optional per-layer precomputed visual K/V
        vis_fold: int = 1,
    ):
        """One decoding step -> (log-probs [B, V], new cache).

        ``vis_fold=f``: token/cache are beam-expanded [B*f, ...] while
        ``vis_inputs``/``vis_kv`` stay per-image [B, ...] — the cross
        attentions fold the beam dimension into the query rows
        (attention.py ``kv_fold``) so the large visual K/V are never tiled.
        """
        b = token.shape[0]
        is_pad = token == self.pad_idx  # [B, 1]
        mask_pad = (~is_pad)[..., None].astype(self.pos_emb.dtype)  # [B, 1, 1]
        pad_hist = cache["pad_hist"].at[:, t].set(is_pad[:, 0])
        # attention mask over cache slots: past pad tokens are masked; slots
        # beyond t are masked inside MultiHeadAttention via cache_index.
        mask_x = pad_hist[:, None, None, :]  # [B, 1, 1, T_max]

        x = self.word_emb[token] + self.pos_emb[t + 1][None, None, :]
        if self.dtype is not None:
            x = x.astype(self.dtype)

        y1, y2, m1, m2 = self._vis(vis_inputs)
        new_layer_caches = []
        for li, (layer, layer_cache) in enumerate(zip(self.layers, cache["layers"])):
            kwargs = {}
            if vis_kv is not None and self.decoder_name == "parallel":
                kwargs["vis_kv"] = vis_kv[li]
            x, new_cache = layer.decode(
                x, y1, y2, mask_pad, mask_x, m1, m2, layer_cache, t,
                deterministic=deterministic, vis_fold=vis_fold, **kwargs,
            )
            new_layer_caches.append(new_cache)
        logits = self.fc(x)[:, 0]  # [B, V]
        return (
            nn.log_softmax(logits.astype(jnp.float32), axis=-1),
            {"layers": tuple(new_layer_caches), "pad_hist": pad_hist},
        )
