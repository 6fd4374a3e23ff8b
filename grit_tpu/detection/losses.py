"""DETR-style set criterion: Hungarian matching + focal/L1/GIoU losses.

Math parity: reference models/detection/od_losses.py.

TPU-first shape discipline: targets arrive as PADDED arrays
``{labels [B, G], boxes [B, G, 4], valid [B, G]}`` (G = max boxes per image)
so the whole criterion jits with static shapes.  The Hungarian assignment
has two solvers: ON DEVICE (the TPU default — a vectorized Jonker-Volgenant
LAP in lax control flow, batched across all decoder levels in one vmapped
solve; the axon backend has no host callbacks, and even where callbacks
exist the per-step host sync loses) and HOST (``jax.pure_callback`` into
scipy per decoder level — exactly where the reference leaves it, scipy
``linear_sum_assignment`` on CPU per batch, od_losses.py:427-431; the CPU
default, where the callback is free and faster than trace-heavy while
loops).  Invalid (padding) columns get +inf-like cost and are dropped from
the returned assignment.

Losses (od_losses.py:40-65, 91-116, 118-130, 206-227):
- classification: sigmoid focal (alpha=0.25, gamma=2) over a one-hot target
  where matched queries carry their class and unmatched are all-zero;
  normalized by ``num_boxes`` (the reference's ``mean(1).sum()/num_boxes * Q``
  algebraically equals ``sum()/num_boxes``);
- boxes: L1 + (1 - diag GIoU) on matched pairs, normalized by num_boxes;
- cardinality: |#(argmax != last class) - #gt| L1, logging only.
- attributes: the weighted BCE of od_losses.py:141-177 (inside/outside
  class-balance terms), used when attribute targets are present.

``num_boxes`` is the GLOBAL batch count (clamped to >= 1): under a
data-sharded jit this equals the reference's cross-rank allreduce-mean
normalization (od_losses.py:259-268) composed with DDP gradient averaging.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from grit_tpu.utils.boxes import box_cxcywh_to_xyxy, generalized_box_iou

BIG_COST = 1e6


def sigmoid_focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0):
    """Elementwise focal loss (no reduction)."""
    prob = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        loss = (alpha * targets + (1 - alpha) * (1 - targets)) * loss
    return loss


def optax_sigmoid_ce(logits, labels):
    """Numerically-stable binary CE with logits."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def dice_loss(logits, targets, num_boxes):
    """DICE/F-1 mask loss (od_losses.py:22-37); masks flattened per box."""
    probs = jax.nn.sigmoid(logits).reshape(logits.shape[0], -1)
    targets = targets.reshape(targets.shape[0], -1)
    numerator = 2 * (probs * targets).sum(-1)
    denominator = probs.sum(-1) + targets.sum(-1)
    return (1 - (numerator + 1) / (denominator + 1)).sum() / num_boxes


def accuracy(logits, labels, topk: int = 1):
    """Top-k accuracy in percent (utils/misc.py:469); logging helper."""
    if logits.shape[0] == 0:
        return jnp.asarray(0.0)
    _, pred = jax.lax.top_k(logits, topk)
    correct = (pred == labels[:, None]).any(axis=1)
    return correct.mean() * 100.0


def _host_lsa(cost: np.ndarray, n_valid: np.ndarray) -> np.ndarray:
    """Batched host-side Hungarian. cost [B, Q, G], n_valid [B] -> assign [B, G]."""
    from scipy.optimize import linear_sum_assignment

    b, q, g = cost.shape
    out = np.full((b, g), -1, np.int32)
    for i in range(b):
        n = int(n_valid[i])
        if n == 0:
            continue
        rows, cols = linear_sum_assignment(cost[i, :, :n])
        out[i, cols] = rows.astype(np.int32)
    return out


def _device_lsa_single(cost: jnp.ndarray, n_valid: jnp.ndarray) -> jnp.ndarray:
    """Exact linear sum assignment ON DEVICE: cost [Q, G] -> assign [G].

    Shortest-augmenting-path Hungarian (the Jonker-Volgenant core) expressed
    as fixed-shape ``lax`` control flow: an outer ``fori_loop`` over gt rows,
    an inner ``while_loop`` Dijkstra whose per-iteration work is vectorized
    over the Q query columns.  Replaces the host scipy callback where host
    callbacks don't exist (the axon TPU PJRT backend rejects pure_callback),
    and removes the per-step device->host sync everywhere else.

    Padding rows (i >= n_valid) are given constant zero cost: a constant row
    can absorb any leftover query without disturbing the valid rows' optimal
    matching (exchange argument), so solving the padded square-ish problem
    yields the same assignment scipy finds on the n-row subproblem (up to
    ties between equal-cost optima).
    """
    q, g = cost.shape
    inf = jnp.float32(3e38)
    qv = q  # virtual column index (the e-maxx p[0] seed slot)
    # rows = gts (i), cols = queries (j); a[i, j] = cost[j, i]
    a = jnp.where(jnp.arange(g)[None, :] < n_valid, cost, 0.0).astype(jnp.float32).T

    def outer(i, carry):
        u, v, p = carry  # u [G] row potentials, v/p [Q+1] col potentials/row
        p = p.at[qv].set(i)
        minv = jnp.full((q,), inf)
        way = jnp.zeros((q,), jnp.int32)
        used = jnp.zeros((q + 1,), bool)

        def dij_cond(st):
            used_, minv_, way_, u_, v_, p_, j0 = st
            return p_[j0] >= 0

        def dij_body(st):
            used_, minv_, way_, u_, v_, p_, j0 = st
            used_ = used_.at[j0].set(True)
            i0 = p_[j0]
            cur = a[i0] - u_[i0] - v_[:q]                    # [Q] reduced costs
            cur = jnp.where(used_[:q], inf, cur)
            upd = cur < minv_
            minv_ = jnp.where(upd, cur, minv_)
            way_ = jnp.where(upd, j0, way_)
            masked = jnp.where(used_[:q], inf, minv_)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            # potentials: used cols' rows +delta, used cols -delta, rest of minv -delta
            idx = jnp.where(used_, p_, g)                    # [Q+1]; g = dummy slot
            u_ = jnp.concatenate([u_, jnp.zeros((1,), u_.dtype)])
            u_ = u_.at[idx].add(delta)[:g]
            v_ = v_ - delta * used_.astype(v_.dtype)
            minv_ = minv_ - delta * (~used_[:q]).astype(minv_.dtype)
            return used_, minv_, way_, u_, v_, p_, j1

        used, minv, way, u, v, p, j0 = jax.lax.while_loop(
            dij_cond, dij_body, (used, minv, way, u, v, p, jnp.int32(qv))
        )

        def aug_cond(st):
            p_, j0_ = st
            return j0_ != qv

        def aug_body(st):
            p_, j0_ = st
            j1 = way[j0_]
            return p_.at[j0_].set(p_[j1]), j1

        p, _ = jax.lax.while_loop(aug_cond, aug_body, (p, j0))
        return u, v, p

    u0 = jnp.zeros((g,), jnp.float32)
    v0 = jnp.zeros((q + 1,), jnp.float32)
    p0 = jnp.full((q + 1,), -1, jnp.int32)
    _, _, p = jax.lax.fori_loop(0, g, outer, (u0, v0, p0))
    # invert: assign[row i] = col j with p[j] == i
    cols = jnp.arange(q, dtype=jnp.int32)
    hit = jax.nn.one_hot(p[:q], g, dtype=jnp.int32)          # [Q, G]
    assign = (hit * cols[:, None]).sum(0).astype(jnp.int32)  # each row hit once
    return jnp.where(jnp.arange(g) < n_valid, assign, -1)


def _resolve_impl(impl: str) -> str:
    """'auto' -> the backend's solver: the axon TPU backend has no host
    callbacks; everywhere else the device solver still wins by removing the
    per-step host sync, but keep scipy on CPU where the callback is free
    and the host solver is faster than trace-heavy while loops."""
    if impl == "auto":
        return "host" if jax.default_backend() == "cpu" else "device"
    return impl


def hungarian_match(
    pred_logits: jnp.ndarray,   # [B, Q, C]
    pred_boxes: jnp.ndarray,    # [B, Q, 4] cxcywh
    tgt_labels: jnp.ndarray,    # [B, G]
    tgt_boxes: jnp.ndarray,     # [B, G, 4]
    tgt_valid: jnp.ndarray,     # [B, G] bool
    *,
    cost_class: float = 2.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    impl: str = "auto",
) -> jnp.ndarray:
    """-> assign [B, G]: query index matched to each gt box, -1 for padding.

    Cost parity: focal-style class cost + L1 + (-GIoU) (od_losses.py:412-426).
    Matching is non-differentiable — computed under stop_gradient, like the
    reference's ``torch.no_grad`` (od_losses.py:401).
    """
    pred_logits = jax.lax.stop_gradient(pred_logits)
    pred_boxes = jax.lax.stop_gradient(pred_boxes)
    alpha, gamma = 0.25, 2.0
    prob = jax.nn.sigmoid(pred_logits)  # [B, Q, C]
    neg = (1 - alpha) * prob ** gamma * (-jnp.log(1 - prob + 1e-8))
    pos = alpha * (1 - prob) ** gamma * (-jnp.log(prob + 1e-8))
    # pick per-gt class columns: [B, Q, G]
    cls_cost = (
        jnp.take_along_axis(pos, tgt_labels[:, None, :], axis=2)
        - jnp.take_along_axis(neg, tgt_labels[:, None, :], axis=2)
    )
    l1_cost = jnp.abs(pred_boxes[:, :, None, :] - tgt_boxes[:, None, :, :]).sum(-1)
    giou_cost = -jax.vmap(generalized_box_iou)(
        box_cxcywh_to_xyxy(pred_boxes), box_cxcywh_to_xyxy(tgt_boxes)
    )
    cost = cost_bbox * l1_cost + cost_class * cls_cost + cost_giou * giou_cost
    cost = jnp.where(tgt_valid[:, None, :], cost, BIG_COST)
    # guard NaN/inf for the solvers
    cost = jnp.nan_to_num(cost, nan=BIG_COST, posinf=BIG_COST, neginf=-BIG_COST)

    n_valid = tgt_valid.sum(-1).astype(jnp.int32)
    b, _, g = cost.shape
    impl = _resolve_impl(impl)
    if impl == "device":
        assign = jax.vmap(_device_lsa_single)(cost, n_valid)
    else:
        assign = jax.pure_callback(
            _host_lsa,
            jax.ShapeDtypeStruct((b, g), jnp.int32),
            cost, n_valid,
            vmap_method="sequential",
        )
    return jnp.where(tgt_valid, assign, -1)


class SetCriterion:
    """Functional set criterion; call inside a jitted loss fn."""

    def __init__(
        self,
        num_classes: int,
        *,
        focal_alpha: float = 0.25,
        cost_class: float = 2.0,
        cost_bbox: float = 5.0,
        cost_giou: float = 2.0,
        weight_dict: Optional[dict] = None,
        match_impl: str = "auto",
    ):
        self.num_classes = num_classes
        self.focal_alpha = focal_alpha
        self.cost = dict(
            cost_class=cost_class, cost_bbox=cost_bbox, cost_giou=cost_giou,
            impl=match_impl,
        )
        self.weight_dict = weight_dict or {
            "loss_ce": 2.0, "loss_bbox": 5.0, "loss_giou": 2.0, "loss_attr": 1.0,
        }

    def _single_level(self, pred_logits, pred_boxes, targets, num_boxes,
                      assign=None):
        if assign is None:
            assign = hungarian_match(
                pred_logits, pred_boxes,
                targets["labels"], targets["boxes"], targets["valid"],
                **self.cost,
            )  # [B, G]
        b, q, c = pred_logits.shape
        g = assign.shape[1]
        matched = assign >= 0
        safe_assign = jnp.where(matched, assign, 0)

        # --- classification: scatter gt classes onto matched queries ---------
        onehot = jnp.zeros((b, q, c))
        scatter = jax.nn.one_hot(targets["labels"], c) * matched[..., None]
        # add each gt's one-hot row into its assigned query row
        onehot = onehot.at[
            jnp.arange(b)[:, None].repeat(g, 1), safe_assign
        ].add(scatter)
        onehot = jnp.clip(onehot, 0, 1)
        loss_ce = sigmoid_focal_loss(pred_logits, onehot, self.focal_alpha).sum() / num_boxes

        # --- boxes -----------------------------------------------------------
        src_boxes = jnp.take_along_axis(pred_boxes, safe_assign[..., None], axis=1)  # [B, G, 4]
        l1 = jnp.abs(src_boxes - targets["boxes"]).sum(-1)
        l1 = jnp.where(matched, l1, 0.0)
        giou = jax.vmap(
            lambda s, t: jnp.diagonal(
                generalized_box_iou(box_cxcywh_to_xyxy(s), box_cxcywh_to_xyxy(t))
            )
        )(src_boxes, targets["boxes"])
        giou_l = jnp.where(matched, 1 - giou, 0.0)

        # --- cardinality + class error (logging) -----------------------------
        card_pred = (jnp.argmax(pred_logits, -1) != c - 1).sum(-1)
        card_err = jnp.abs(
            card_pred.astype(jnp.float32) - targets["valid"].sum(-1).astype(jnp.float32)
        ).mean()
        # top-1 class error over matched queries (od_losses.py:115)
        matched_logits = jnp.take_along_axis(
            pred_logits, safe_assign[..., None], axis=1
        )  # [B, G, C]
        correct = (jnp.argmax(matched_logits, -1) == targets["labels"]) & matched
        class_err = 100.0 * (1.0 - correct.sum() / jnp.maximum(matched.sum(), 1))

        out = {
            "loss_ce": loss_ce,
            "loss_bbox": l1.sum() / num_boxes,
            "loss_giou": giou_l.sum() / num_boxes,
            "cardinality_error": jax.lax.stop_gradient(card_err),
            "class_error": jax.lax.stop_gradient(class_err),
        }
        return out, assign

    def attribute_loss(self, attr_logits, targets, assign):
        """Weighted BCE on matched queries (od_losses.py:141-177)."""
        matched = (assign >= 0) & targets.get("has_attr", jnp.ones(assign.shape[0], bool))[:, None]
        safe_assign = jnp.where(assign >= 0, assign, 0)
        logits = jnp.take_along_axis(
            attr_logits, safe_assign[..., None], axis=1
        )  # [B, G, A]
        tgt = targets["attributes"].astype(jnp.float32)
        bce = optax_sigmoid_ce(logits, tgt) * matched[..., None]
        pos_mask = tgt * matched[..., None]
        neg_mask = (1 - tgt) * matched[..., None]
        inside = jnp.where(pos_mask.sum() > 0, (bce * tgt).sum() / jnp.maximum(pos_mask.sum(), 1), 0.0)
        outside = jnp.where(
            neg_mask.sum() > 0, (bce * (1 - tgt)).sum() / jnp.maximum(neg_mask.sum(), 1), 0.0
        )
        return {"loss_attr": inside + outside}

    def __call__(self, outputs: dict, targets: dict) -> dict:
        """outputs: {pred_logits, pred_boxes, [aux_outputs], [attr_logits]}.

        Returns the per-loss dict (incl. per-aux-layer '_i' entries).
        ``total_loss`` applies the weight dict.
        """
        num_boxes = jnp.maximum(targets["valid"].sum().astype(jnp.float32), 1.0)
        aux = outputs.get("aux_outputs", [])

        # DEVICE solver: ONE batched Hungarian solve for all decoder levels
        # (final + aux) — the levels stack on a NEW leading axis and vmap
        # composes with the per-image vmap inside hungarian_match, so a
        # single while-loop runs L*B tiny LAPs instead of L sequential ones
        # (each a full Dijkstra latency chain — the aux losses made matching
        # 7x slower than it needed to be, and XLA compiled 7 copies of the
        # solver).  The leading axis (not a batch-axis concat) matters under
        # a dp mesh: the sharded batch axis stays put, so GSPMD inserts no
        # resharding.  Costs are per-row, so the stacked assigns are
        # bit-identical to per-level calls (pinned by test).
        # HOST solver: keep per-level callbacks.  Feeding a level-stack
        # through pure_callback inside the SPMD program stalls a device
        # thread on the input gather long enough to trip XLA:CPU's
        # hardcoded 40s collective-rendezvous deadline (deterministic crash
        # in the dp8 synthetic drive); per-level callbacks are what round 2
        # shipped and stay load-stable.
        assigns = [None] * (1 + len(aux))
        if _resolve_impl(self.cost["impl"]) == "device":
            assign_all = jax.vmap(
                lambda lg, bx: hungarian_match(
                    lg, bx,
                    targets["labels"], targets["boxes"], targets["valid"],
                    **self.cost,
                )
            )(
                jnp.stack([outputs["pred_logits"]]
                          + [a["pred_logits"] for a in aux]),
                jnp.stack([outputs["pred_boxes"]]
                          + [a["pred_boxes"] for a in aux]),
            )  # [L, B, G]
            assigns = list(assign_all)

        losses, assign = self._single_level(
            outputs["pred_logits"], outputs["pred_boxes"], targets, num_boxes,
            assign=assigns[0],
        )
        if "attr_logits" in outputs and "attributes" in targets:
            losses.update(self.attribute_loss(outputs["attr_logits"], targets, assign))
        for i, aux_out in enumerate(aux):
            aux_losses, _ = self._single_level(
                aux_out["pred_logits"], aux_out["pred_boxes"], targets, num_boxes,
                assign=assigns[i + 1],
            )
            losses.update({f"{k}_{i}": v for k, v in aux_losses.items()
                           if not k.endswith("_error")})  # logging keys: last layer only
        return losses

    def total_loss(self, losses: dict) -> jnp.ndarray:
        total = 0.0
        for key, value in losses.items():
            base = key.rsplit("_", 1)[0] if key[-1].isdigit() else key
            if base in self.weight_dict:
                total = total + self.weight_dict[base] * value
        return total
