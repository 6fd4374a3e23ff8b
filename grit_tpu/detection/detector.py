"""Detection-flavor detector: backbone + deformable decoder + prediction heads.

Parity: reference models/detection/detector.py (class Detector) and
heads.py:33-51 (AttrHead).  Returns {pred_logits, pred_boxes, [aux_outputs],
[attr_logits]} for the SetCriterion (grit_tpu.detection.losses).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from grit_tpu.models.det_module import DetectionModule
from grit_tpu.models.swin import SwinTransformer, swin_base_win12_384
from grit_tpu.utils.nested import (ImageBatch, device_normalize,
                                   downsample_mask)

xavier = nn.initializers.xavier_uniform()


class AttrHead(nn.Module):
    """Attribute prediction from query states + predicted-class embedding."""

    d_model: int
    num_attr_classes: int
    num_od_classes: int
    dtype: Any = None

    @nn.compact
    def __call__(self, obj_h: jnp.ndarray, pred_logits: jnp.ndarray) -> dict:
        best = jnp.argmax(jax.nn.sigmoid(pred_logits), axis=-1)  # [B, Q]
        table = self.param(
            "od_cls_embed", nn.initializers.normal(1.0),
            (self.num_od_classes, self.d_model),
        )
        cls_embed = table[best]
        attr = jnp.concatenate([obj_h, cls_embed], axis=-1)
        attr = nn.Dense(self.d_model, name="attr_linear1", kernel_init=xavier,
                        dtype=self.dtype)(attr)
        logits = nn.Dense(self.num_attr_classes, name="attr_linear2",
                          kernel_init=xavier, dtype=self.dtype)(nn.relu(attr))
        return {"attr_logits": logits}


class DetectionDetector(nn.Module):
    backbone: SwinTransformer
    det_module: DetectionModule
    hidden_dim: int = 512
    has_attr_head: bool = False
    num_attr_classes: int = 400
    num_od_classes: int = 1849
    dtype: Any = None

    @nn.compact
    def __call__(
        self, images: ImageBatch, *, training: bool = False, deterministic: bool = True
    ) -> dict:
        # uint8 wire format: loaders ship raw RGB (4x less host->device
        # transfer); ImageNet normalize runs here on device.  Float input
        # (parity tools, direct-tensor tests) passes through unchanged.
        images = device_normalize(images)
        features = self.backbone(images.images, deterministic=deterministic)
        n_stages = len(self.backbone.depths)
        patch = self.backbone.patch_size
        strides = [patch * 2 ** s for s in range(1, n_stages)] + [patch * 2 ** n_stages]
        masks = [downsample_mask(images.mask, s) for s in strides]

        srcs = []
        for lvl, feat in enumerate(features):
            x = nn.Conv(self.hidden_dim, (1, 1), name=f"input_proj_{lvl}_conv",
                        kernel_init=xavier, dtype=self.dtype)(feat)
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"input_proj_{lvl}_norm")(x)
            srcs.append(x)

        hs, init_ref, inter_refs = self.det_module(
            srcs, masks, deterministic=deterministic
        )
        outputs = self.det_module.detection_head(
            hs, init_ref, inter_refs, training=training
        )
        if self.has_attr_head:
            outputs.update(
                AttrHead(
                    self.hidden_dim, self.num_attr_classes, self.num_od_classes,
                    dtype=self.dtype, name="attr_head",
                )(hs[-1], outputs["pred_logits"])
            )
        return outputs


def build_detection_model(config, dtype=None):
    """(model, criterion) from a detection config (reference detector.py:126-157)."""
    from grit_tpu.detection.losses import SetCriterion

    det_cfg = config.model.detector
    from grit_tpu.models.detector import resolve_kernel_config
    from grit_tpu.models.swin import build_swin

    # same kernel auto-selection as the caption path (models/detector.py):
    # fused window-attention pipeline + pallas MSDA on TPU, plain XLA
    # elsewhere; both overridable per-run (model.fused_win_attn /
    # model.msda_impl — see docs/FLAGS.md).  Both kernel families are
    # differentiable, so pre-training gets them too.
    fused_attn, msda_impl = resolve_kernel_config(config)
    backbone = build_swin(
        config.model.get("backbone", "swin_base_win7_384_22k"), dtype=dtype,
        fused_attn=fused_attn,
        use_checkpoint=bool(config.model.get("use_checkpoint", False)),
    )
    det_module = DetectionModule(
        d_model=det_cfg.d_model,
        n_heads=det_cfg.num_heads,
        num_layers=det_cfg.num_layers,
        dim_feedforward=det_cfg.dim_feedforward,
        dropout=det_cfg.dropout,
        num_levels=det_cfg.num_levels,
        num_points=det_cfg.num_points,
        num_classes=det_cfg.num_classes,
        num_queries=det_cfg.num_queries,
        with_box_refine=det_cfg.with_box_refine,
        msda_impl=msda_impl,
        dtype=dtype,
        name="det_module",
    )
    model = DetectionDetector(
        backbone=backbone,
        det_module=det_module,
        hidden_dim=det_cfg.d_model,
        has_attr_head=bool(config.model.get("with_attributes", False)),
        num_attr_classes=config.model.get("num_attr_classes", 400),
        num_od_classes=det_cfg.num_classes,
        dtype=dtype,
    )
    loss_cfg = config.model.losses
    criterion = SetCriterion(
        det_cfg.num_classes,
        focal_alpha=loss_cfg.focal_alpha,
        cost_class=loss_cfg.set_cost_class,
        cost_bbox=loss_cfg.set_cost_bbox,
        cost_giou=loss_cfg.set_cost_giou,
        # "auto" = device solver on TPU (batched across decoder levels),
        # scipy host callback on CPU; override for A/Bs (docs/FLAGS.md)
        match_impl=loss_cfg.get("match_impl", "auto"),
        weight_dict={
            "loss_ce": loss_cfg.cls_loss_coef,
            "loss_bbox": loss_cfg.bbox_loss_coef,
            "loss_giou": loss_cfg.giou_loss_coef,
            "loss_attr": loss_cfg.attr_loss_coef,
        },
    )
    return model, criterion
