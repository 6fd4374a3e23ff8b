"""Decoder-only Deformable-DETR detection module.

Math parity: reference models/detection/det_module.py.

150 learned queries (pos/tgt halves of one embedding, :136-139) run through
``num_layers`` decoder layers of [self-attention, multi-scale deformable
cross-attention, FFN] with iterative box refinement (:40-53).  The module
keeps ``num_layers + 1`` classification/box heads (clone 0 refines the
initial reference points, :106-112,168).

The MSDeformAttn projections live here (offsets/weights/value/output,
reference models/ops/modules/ms_deform_attn.py:49-71 incl. the radial offset
bias init) while the sampling core is ``grit_tpu.ops.msda`` — the TPU-native
replacement for the CUDA extension.

Spatial shapes are static Python tuples (XLA static shapes); ``valid_ratios``
remain traced arrays.  ``bbox_refine`` detaches via ``stop_gradient`` exactly
where the reference calls ``.detach()`` (:52).

Quirk preserved: ``level_embed`` is created and initialized upstream
(:95,:124) but never consumed by the decoder-only path; we keep the parameter
for checkpoint-shape compatibility.
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from grit_tpu.models.attention import LN_EPS
from grit_tpu.ops.msda import ms_deform_attn_relaid
from grit_tpu.ops.msda_pallas import relay_mask, relay_value
from grit_tpu.utils.boxes import inverse_sigmoid

xavier = nn.initializers.xavier_uniform()


class MLP(nn.Module):
    """num_layers Linear layers with ReLU between (det_module.py:24-35)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: Any = None
    last_bias_init: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            out = self.output_dim if last else self.hidden_dim
            bias_init = nn.initializers.zeros_init()
            if last and self.last_bias_init is not None:
                arr = jnp.asarray(self.last_bias_init)
                bias_init = lambda key, shape, dtype=jnp.float32, _a=arr: _a.astype(dtype)
            x = nn.Dense(
                out, name=f"layers_{i}", dtype=self.dtype,
                kernel_init=xavier, bias_init=bias_init,
            )(x)
            if not last:
                x = nn.relu(x)
        return x


#: VMEM feasibility bound for the pallas MSDA kernels: they hold the whole
#: per-image value slab [S_pad, C] resident (fwd one window, bwd two plus
#: register spills that scale with S — docs/NOTES.md round 4).  The caption
#: pyramid (384x640, S=5100, 5.2 MB bf16) measures ~46 MB of the v5e's
#: 128 MB vmem; the det pre-training pyramid (832x1216, S=21000, 21.5 MB)
#: wants 191 MB and is rejected by Mosaic.  Above this slab size the module
#: falls back to the fused-XLA 'flat' formulation (bit-compatible math;
#: the round-3 on-chip det step ran it at 1548.9 ms b4).
MSDA_PALLAS_MAX_SLAB_BYTES = int(
    float(os.environ.get("GRIT_MSDA_PALLAS_MAX_SLAB_MB", "10")) * (1 << 20)
)


def resolve_msda_impl(impl: str, s_pad: int, channels: int, itemsize: int) -> str:
    """Resolve 'pallas' for slabs exceeding the whole-slab VMEM bound.

    Over-bound slabs stay on pallas when the S-chunked v5 kernels are
    available (GRIT_MSDA_V5=1 and GRIT_MSDA_CHUNKED != 0 — the
    ``ms_deform_attn_pallas_v5`` entry routes to them by the same slab-size
    test); otherwise demote to the fused-XLA 'flat' formulation.
    """
    if impl == "pallas" and s_pad * channels * itemsize > MSDA_PALLAS_MAX_SLAB_BYTES:
        from grit_tpu.ops.msda_pallas import chunked_fallback_available

        return "pallas" if chunked_fallback_available() else "flat"
    return impl


def _msda_offset_bias(n_heads: int, n_levels: int, n_points: int):
    """Radial per-head offset init (ms_deform_attn.py:57-65)."""
    thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # [H, 2]
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    return grid.reshape(-1)


class MSDeformAttnModule(nn.Module):
    """Query-conditioned multi-scale deformable attention layer."""

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    impl: str = "xla"
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,              # [B, Lq, C]
        reference_points: jnp.ndarray,   # [B, Lq, L, 2 or 4] (valid-ratio scaled)
        src: jnp.ndarray,                # [B, S_pad, C] RELAID (relay_value)
        spatial_shapes: Sequence[tuple[int, int]],
        padding_mask: Optional[jnp.ndarray] = None,  # [B, S_pad] True = pad (relaid)
        real_hw: Optional[jnp.ndarray] = None,       # [B, L, 2] int (h, w) real dims
    ) -> jnp.ndarray:
        b, lq, _ = query.shape
        m, L, p = self.n_heads, self.n_levels, self.n_points
        # large maps (det pre-training 832x1216) exceed the pallas kernels'
        # VMEM budget — resolve the impl against the static slab size
        impl = resolve_msda_impl(
            self.impl, src.shape[1], self.d_model, src.dtype.itemsize
        )

        # value stays in the natural [B, S_pad, C] projection layout — the
        # per-layer [B, M, S, D] transpose + slab re-lay that cost ~95 ms of
        # the b128 eval step are gone (re-lay hoisted to DetectionModule,
        # head split handled inside the v4 kernel)
        value = nn.Dense(self.d_model, name="value_proj", dtype=self.dtype,
                         kernel_init=xavier)(src)
        # pad handling: the pallas path zeroes corner WEIGHTS against the
        # real rectangles (w*0 == 0*v, bit-equal) instead of an [B, S_pad, C]
        # elementwise pre-mask of the value slab — that pass cost ~15 ms/step
        # across the 6 layers at b128 eval even for unpadded batches
        corner_mask = impl == "pallas" and real_hw is not None
        if padding_mask is not None and not corner_mask:
            value = jnp.where(padding_mask[..., None], 0.0, value)

        offset_bias = _msda_offset_bias(m, L, p)
        offsets = nn.Dense(
            m * L * p * 2, name="sampling_offsets", dtype=self.dtype,
            kernel_init=nn.initializers.zeros_init(),
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                offset_bias, dtype
            ),
        )(query).reshape(b, lq, m, L, p, 2)
        attn = nn.Dense(
            m * L * p, name="attention_weights", dtype=self.dtype,
            kernel_init=nn.initializers.zeros_init(),
        )(query).reshape(b, lq, m, L * p)
        attn = nn.softmax(attn, axis=-1).reshape(b, lq, m, L, p)

        if reference_points.shape[-1] == 2:
            wh = jnp.asarray(
                [[w, h] for h, w in spatial_shapes], offsets.dtype
            )  # [L, 2] in (x, y) order
            loc = (
                reference_points[:, :, None, :, None, :]
                + offsets / wh[None, None, None, :, None, :]
            )
        else:
            loc = (
                reference_points[:, :, None, :, None, :2]
                + offsets / p * reference_points[:, :, None, :, None, 2:] * 0.5
            )

        out = ms_deform_attn_relaid(
            value, spatial_shapes, loc, attn, m, impl=impl,
            real_hw=real_hw if corner_mask else None,
        )
        return nn.Dense(self.d_model, name="output_proj", dtype=self.dtype,
                        kernel_init=xavier)(out)


class SelfAttention(nn.Module):
    """torch nn.MultiheadAttention parity: packed in-proj QKV + out-proj."""

    d_model: int
    n_heads: int
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, q, k, v, *, deterministic=True):
        b, n, c = q.shape
        h = self.n_heads
        d = c // h
        in_w = self.param("in_proj_weight", xavier, (3 * c, c))
        in_b = self.param("in_proj_bias", nn.initializers.zeros_init(), (3 * c,))
        qp = q @ in_w[:c].T + in_b[:c]
        kp = k @ in_w[c:2 * c].T + in_b[c:2 * c]
        vp = v @ in_w[2 * c:].T + in_b[2 * c:]

        # head axis stays where the projection put it ([B, L, H, D]) — the
        # einsums carry the head batching in their dimension numbers, so XLA
        # folds the layout into the dot operand loads instead of emitting
        # explicit [B, L, H, D] -> [B, H, L, D] transpose copies (which cost
        # ~13 ms/step across the 6 decoder layers at b128 eval)
        qp = qp.reshape(b, -1, h, d)
        kp = kp.reshape(b, -1, h, d)
        vp = vp.reshape(b, -1, h, d)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qp, kp) / math.sqrt(d)
        p = nn.softmax(scores, axis=-1)
        p = nn.Dropout(self.dropout)(p, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", p, vp).reshape(b, n, c)
        return nn.Dense(c, name="out_proj", dtype=self.dtype, kernel_init=xavier)(out)


class DeformableDecoderLayer(nn.Module):
    d_model: int = 256
    d_ffn: int = 1024
    dropout: float = 0.1
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    msda_impl: str = "xla"
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        tgt, query_pos, reference_points, src, spatial_shapes,
        valid_ratios, padding_mask=None, real_hw=None, *, deterministic=True,
    ):
        # scale reference points by per-level valid ratios (det_module.py:323-328)
        if reference_points.shape[-1] == 4:
            scale = jnp.concatenate([valid_ratios, valid_ratios], -1)  # [B, L, 4]
        else:
            scale = valid_ratios
        ref = reference_points[:, :, None] * scale[:, None]

        q = tgt + query_pos
        sa = SelfAttention(self.d_model, self.n_heads, self.dropout,
                           dtype=self.dtype, name="self_attn")(
            q, q, tgt, deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(sa, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm2")(tgt)

        ca = MSDeformAttnModule(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            impl=self.msda_impl, dtype=self.dtype, name="cross_attn",
        )(tgt + query_pos, ref, src, spatial_shapes, padding_mask, real_hw)
        tgt = tgt + nn.Dropout(self.dropout)(ca, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm1")(tgt)

        h = nn.Dense(self.d_ffn, name="linear1", dtype=self.dtype, kernel_init=xavier)(tgt)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, name="linear2", dtype=self.dtype, kernel_init=xavier)(h)
        tgt = tgt + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm3")(tgt)


def get_valid_ratio(mask: jnp.ndarray) -> jnp.ndarray:
    """Fraction of non-padded rows/cols of a [B, H, W] pad mask -> [B, 2] (w, h)."""
    _, h, w = mask.shape
    valid_h = jnp.sum(~mask[:, :, 0], axis=1).astype(jnp.float32)
    valid_w = jnp.sum(~mask[:, 0, :], axis=1).astype(jnp.float32)
    return jnp.stack([valid_w / w, valid_h / h], -1)


class DetectionModule(nn.Module):
    d_model: int = 512
    n_heads: int = 8
    num_layers: int = 6
    dim_feedforward: int = 1024
    dropout: float = 0.1
    num_levels: int = 4
    num_points: int = 4
    num_classes: int = 1849
    num_queries: int = 150
    with_box_refine: bool = True
    msda_impl: str = "xla"
    dtype: Any = None

    def setup(self):
        self.query_embed = self.param(
            "query_embed", xavier, (self.num_queries, self.d_model * 2)
        )
        # kept for checkpoint-shape parity; unused by the decoder-only path
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (self.num_levels, self.d_model)
        )
        self.reference_points_fc = nn.Dense(
            2, name="reference_points", kernel_init=xavier, dtype=self.dtype
        )
        self.decoder_layers = [
            DeformableDecoderLayer(
                self.d_model, self.dim_feedforward, self.dropout,
                self.num_levels, self.n_heads, self.num_points,
                msda_impl=self.msda_impl, dtype=self.dtype, name=f"decoder_layers_{i}",
            )
            for i in range(self.num_layers)
        ]
        n_pred = self.num_layers + 1
        prior = 0.01
        cls_bias = -math.log((1 - prior) / prior)
        self.class_embed = [
            nn.Dense(
                self.num_classes, name=f"class_embed_{i}", dtype=self.dtype,
                kernel_init=xavier,
                bias_init=nn.initializers.constant(cls_bias),
            )
            for i in range(n_pred)
        ]
        self.bbox_embed = [
            MLP(
                self.d_model, 4, 3, dtype=self.dtype, name=f"bbox_embed_{i}",
                last_bias_init=(np.array([0, 0, -2, -2], np.float32) if i == 0 else None),
            )
            for i in range(n_pred)
        ]

    def bbox_refine(self, bbox_embed: MLP, output, reference_points):
        """Iterative refinement with detach (det_module.py:40-53)."""
        tmp = bbox_embed(output)
        if reference_points.shape[-1] == 4:
            new_ref = nn.sigmoid(tmp + inverse_sigmoid(reference_points))
        else:
            new_ref = nn.sigmoid(
                tmp.at[..., :2].add(inverse_sigmoid(reference_points))
            )
        return jax.lax.stop_gradient(new_ref)

    def __call__(
        self,
        srcs: Sequence[jnp.ndarray],   # per level [B, H, W, C] (NHWC)
        masks: Sequence[jnp.ndarray],  # per level [B, H, W] bool, True = pad
        *,
        deterministic: bool = True,
    ):
        """Returns (hs [n_layers+1, B, Lq, C], init_ref [B, Lq, 4], inter_refs)."""
        b = srcs[0].shape[0]
        spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
        src_flat = jnp.concatenate([s.reshape(b, -1, s.shape[-1]) for s in srcs], axis=1)
        mask_flat = jnp.concatenate([m.reshape(b, -1) for m in masks], axis=1)
        valid_ratios = jnp.stack([get_valid_ratio(m) for m in masks], axis=1)  # [B, L, 2]
        # per-image real level dims (rectangle padding, same assumption as
        # get_valid_ratio) — lets the pallas MSDA mask corner weights instead
        # of pre-masking the value slab
        real_hw = jnp.stack([
            jnp.stack([jnp.sum((~m[:, :, 0]).astype(jnp.int32), axis=1),
                       jnp.sum((~m[:, 0, :]).astype(jnp.int32), axis=1)], -1)
            for m in masks], axis=1)  # [B, L, 2] (h, w)
        # re-lay the memory ONCE for all decoder layers' MSDA calls (identity
        # when every level size is a multiple of 8, e.g. the 384x640 pyramid)
        src_flat = relay_value(src_flat, spatial_shapes)
        mask_flat = relay_mask(mask_flat, spatial_shapes)

        # touch the classification heads so their parameters exist even on the
        # caption-flavor path that never runs detection_head — the reference
        # checkpoints carry them (det_module.py:96,110); XLA DCEs these calls.
        for head in self.class_embed:
            head(jnp.zeros((1, 1, self.d_model)))

        query_pos, query_tgt = jnp.split(self.query_embed, 2, axis=1)
        query_pos = jnp.broadcast_to(query_pos[None], (b, self.num_queries, self.d_model))
        query_tgt = jnp.broadcast_to(query_tgt[None], (b, self.num_queries, self.d_model))

        reference_points = nn.sigmoid(self.reference_points_fc(query_pos))  # [B, Lq, 2]
        reference_points = self.bbox_refine(self.bbox_embed[0], query_tgt, reference_points)

        tgt = query_tgt
        intermediate = [tgt]
        inter_refs = [reference_points]
        for lid, layer in enumerate(self.decoder_layers):
            tgt = layer(
                tgt, query_pos, reference_points, src_flat, spatial_shapes,
                valid_ratios, mask_flat, real_hw, deterministic=deterministic,
            )
            reference_points = self.bbox_refine(self.bbox_embed[lid + 1], tgt, reference_points)
            intermediate.append(tgt)
            inter_refs.append(reference_points)

        hs = jnp.stack(intermediate)                 # [n+1, B, Lq, C]
        inter_references = jnp.stack(inter_refs)     # [n+1, B, Lq, 4]
        return hs, inter_refs[0], inter_references

    def detection_head(self, hs, init_reference, inter_references, *, training: bool):
        """Per-layer class/box predictions (det_module.py:219-271)."""
        if training:
            outputs_classes, outputs_coords = [], []
            for lvl in range(hs.shape[0]):
                reference = init_reference if lvl == 0 else inter_references[lvl - 1]
                reference = inverse_sigmoid(reference)
                cls = self.class_embed[lvl](hs[lvl])
                tmp = self.bbox_embed[lvl](hs[lvl])
                if reference.shape[-1] == 4:
                    tmp = tmp + reference
                else:
                    tmp = tmp.at[..., :2].add(reference)
                outputs_classes.append(cls)
                outputs_coords.append(nn.sigmoid(tmp))
            out_cls = jnp.stack(outputs_classes)
            out_box = jnp.stack(outputs_coords)
            out = {"pred_logits": out_cls[-1], "pred_boxes": out_box[-1]}
            out["aux_outputs"] = [
                {"pred_logits": c, "pred_boxes": bx}
                for c, bx in zip(out_cls[:-1], out_box[:-1])
            ]
            return out
        reference = inverse_sigmoid(inter_references[-2])
        cls = self.class_embed[-1](hs[-1])
        tmp = self.bbox_embed[-1](hs[-1])
        if reference.shape[-1] == 4:
            tmp = tmp + reference
        else:
            tmp = tmp.at[..., :2].add(reference)
        return {"pred_logits": cls, "pred_boxes": nn.sigmoid(tmp)}
