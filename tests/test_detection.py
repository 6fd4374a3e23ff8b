"""Detection-stack tests: matcher, criterion, postprocess, evaluator, model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grit_tpu.detection.coco_eval import CocoEvaluator, box_iou_xyxy
from grit_tpu.detection.losses import SetCriterion, hungarian_match
from grit_tpu.detection.postprocess import postprocess


class TestMatcher:
    def test_perfect_predictions_match_their_gt(self):
        # 4 queries, 2 gt; queries 1 and 3 sit exactly on the gt boxes with
        # confident correct logits -> they must be the assigned ones.
        gt_boxes = jnp.asarray([[[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.1, 0.1]]])
        gt_labels = jnp.asarray([[2, 5]])
        valid = jnp.asarray([[True, True]])
        pred_boxes = jnp.asarray([[
            [0.1, 0.9, 0.5, 0.5],
            [0.3, 0.3, 0.2, 0.2],
            [0.9, 0.1, 0.3, 0.3],
            [0.7, 0.7, 0.1, 0.1],
        ]])
        logits = jnp.full((1, 4, 8), -5.0)
        logits = logits.at[0, 1, 2].set(5.0).at[0, 3, 5].set(5.0)
        assign = hungarian_match(logits, pred_boxes, gt_labels, gt_boxes, valid)
        np.testing.assert_array_equal(np.asarray(assign), [[1, 3]])

    def test_padding_gets_minus_one(self):
        gt_boxes = jnp.zeros((2, 3, 4)).at[:, 0].set(0.5)
        gt_labels = jnp.zeros((2, 3), jnp.int32)
        valid = jnp.asarray([[True, False, False], [True, True, False]])
        pred_boxes = jnp.broadcast_to(jnp.asarray([0.5, 0.5, 0.5, 0.5]), (2, 5, 4))
        logits = jnp.zeros((2, 5, 4))
        assign = np.asarray(
            hungarian_match(logits, pred_boxes, gt_labels, gt_boxes, valid)
        )
        assert (assign[~np.asarray(valid)] == -1).all()
        assert (assign[np.asarray(valid)] >= 0).all()


class TestCriterion:
    def test_losses_finite_and_grads_flow(self):
        crit = SetCriterion(num_classes=8)
        key = jax.random.PRNGKey(0)
        b, q, g = 2, 6, 3
        logits = jax.random.normal(key, (b, q, 8))
        boxes = jax.nn.sigmoid(jax.random.normal(key, (b, q, 4)))
        targets = {
            "labels": jnp.asarray([[1, 2, 0], [3, 0, 0]]),
            "boxes": jnp.clip(jax.random.uniform(key, (b, g, 4)), 0.1, 0.4),
            "valid": jnp.asarray([[True, True, False], [True, False, False]]),
        }

        def loss_fn(lg, bx):
            losses = crit({"pred_logits": lg, "pred_boxes": bx}, targets)
            return crit.total_loss(losses)

        loss, (g_l, g_b) = jax.value_and_grad(loss_fn, argnums=(0, 1))(logits, boxes)
        assert np.isfinite(float(loss))
        assert np.isfinite(np.asarray(g_l)).all()
        assert np.isfinite(np.asarray(g_b)).all()
        assert np.abs(np.asarray(g_b)).sum() > 0

    def test_perfect_prediction_low_box_loss(self):
        crit = SetCriterion(num_classes=4)
        targets = {
            "labels": jnp.asarray([[1]]),
            "boxes": jnp.asarray([[[0.5, 0.5, 0.2, 0.2]]]),
            "valid": jnp.asarray([[True]]),
        }
        logits = jnp.full((1, 3, 4), -8.0).at[0, 0, 1].set(8.0)
        boxes = jnp.asarray([[[0.5, 0.5, 0.2, 0.2], [0.1, 0.1, 0.1, 0.1],
                              [0.9, 0.9, 0.1, 0.1]]])
        losses = crit({"pred_logits": logits, "pred_boxes": boxes}, targets)
        assert float(losses["loss_bbox"]) < 1e-6
        assert float(losses["loss_giou"]) < 1e-5
        assert float(losses["loss_ce"]) < 0.1


class TestPostprocess:
    def test_top100_and_scaling(self):
        b, q, c = 1, 150, 10
        logits = jnp.full((b, q, c), -5.0).at[0, 7, 3].set(5.0)
        boxes = jnp.full((b, q, 4), 0.5)
        out = postprocess(logits, boxes, jnp.asarray([[100, 200]]))
        assert out["scores"].shape == (1, 100)
        assert int(out["labels"][0, 0]) == 3
        np.testing.assert_allclose(
            np.asarray(out["boxes"][0, 0]), [50, 25, 150, 75], atol=1e-3
        )


class TestEvaluator:
    def test_perfect_predictions_give_map_1(self):
        gt = {
            1: {"boxes": np.asarray([[10, 10, 50, 50], [60, 60, 90, 90]]),
                "labels": np.asarray([1, 2])},
            2: {"boxes": np.asarray([[5, 5, 25, 25]]), "labels": np.asarray([1])},
        }
        ev = CocoEvaluator(gt)
        for img_id, g in gt.items():
            ev.update([img_id], [{
                "scores": np.ones(len(g["labels"])),
                "labels": g["labels"],
                "boxes": g["boxes"],
            }])
        res = ev.summarize()
        assert res["mAP"] > 0.99
        assert res["AP50"] > 0.99

    def test_wrong_boxes_give_zero(self):
        gt = {1: {"boxes": np.asarray([[10, 10, 50, 50]]), "labels": np.asarray([1])}}
        ev = CocoEvaluator(gt)
        ev.update([1], [{
            "scores": np.asarray([0.9]),
            "labels": np.asarray([1]),
            "boxes": np.asarray([[200, 200, 250, 250]]),
        }])
        assert ev.summarize()["mAP"] == 0.0

    def test_iou(self):
        a = np.asarray([[0, 0, 10, 10]])
        b = np.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
        iou = box_iou_xyxy(a, b)[0]
        np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-6)


class TestDetectionModel:
    def test_forward_shapes_and_aux(self):
        from grit_tpu.detection.detector import DetectionDetector
        from grit_tpu.models.det_module import DetectionModule
        from grit_tpu.models.swin import SwinTransformer
        from grit_tpu.utils.nested import ImageBatch

        backbone = SwinTransformer(
            embed_dim=16, depths=(1, 1), num_heads=(2, 2), window=4,
            drop_path_rate=0.0, pos_dim=32,
        )
        det = DetectionModule(
            d_model=32, n_heads=4, num_layers=2, dim_feedforward=64,
            num_levels=2, num_points=2, num_classes=8, num_queries=5,
            name="det_module",
        )
        model = DetectionDetector(
            backbone=backbone, det_module=det, hidden_dim=32,
            has_attr_head=True, num_attr_classes=6, num_od_classes=8,
        )
        imgs = ImageBatch(jnp.zeros((2, 32, 32, 3)), jnp.zeros((2, 32, 32), bool))
        params = model.init(jax.random.PRNGKey(0), imgs, training=True)
        out = model.apply(params, imgs, training=True)
        assert out["pred_logits"].shape == (2, 5, 8)
        assert out["pred_boxes"].shape == (2, 5, 4)
        assert len(out["aux_outputs"]) == 2  # n_layers+1 heads -> n aux
        assert out["attr_logits"].shape == (2, 5, 6)
        # eval mode: last layer only
        out_eval = model.apply(params, imgs, training=False)
        assert "aux_outputs" not in out_eval
        b = np.asarray(out["pred_boxes"])
        assert ((b >= 0) & (b <= 1)).all()


class TestAuxHelpers:
    def test_masks_to_boxes(self):
        from grit_tpu.utils.boxes import masks_to_boxes

        masks = np.zeros((3, 10, 12), bool)
        masks[0, 2:5, 3:8] = True     # box (3, 2, 7, 4)
        masks[1, 0, 0] = True         # single pixel
        # masks[2] empty
        boxes = np.asarray(masks_to_boxes(jnp.asarray(masks)))
        np.testing.assert_allclose(boxes[0], [3, 2, 7, 4])
        np.testing.assert_allclose(boxes[1], [0, 0, 0, 0])
        np.testing.assert_allclose(boxes[2], [0, 0, 0, 0])

    def test_dice_loss_perfect_vs_bad(self):
        from grit_tpu.detection.losses import dice_loss

        target = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
        good = dice_loss(jnp.asarray([[20.0, 20.0, -20.0, -20.0]]), target, 1.0)
        bad = dice_loss(jnp.asarray([[-20.0, -20.0, 20.0, 20.0]]), target, 1.0)
        assert float(good) < 0.01
        assert float(bad) > 0.7  # smoothing (+1) caps the worst case below 1

    def test_accuracy_helper(self):
        from grit_tpu.detection.losses import accuracy

        logits = jnp.asarray([[5.0, 1.0, 0.0], [0.0, 1.0, 5.0]])
        labels = jnp.asarray([0, 1])
        assert float(accuracy(logits, labels, topk=1)) == 50.0
        assert float(accuracy(logits, labels, topk=2)) == 100.0

    def test_class_error_in_criterion(self):
        crit = SetCriterion(num_classes=4)
        targets = {
            "labels": jnp.asarray([[1]]),
            "boxes": jnp.asarray([[[0.5, 0.5, 0.2, 0.2]]]),
            "valid": jnp.asarray([[True]]),
        }
        logits = jnp.full((1, 3, 4), -8.0).at[0, 0, 1].set(8.0)
        boxes = jnp.asarray([[[0.5, 0.5, 0.2, 0.2], [0.1, 0.1, 0.1, 0.1],
                              [0.9, 0.9, 0.1, 0.1]]])
        losses = crit({"pred_logits": logits, "pred_boxes": boxes}, targets)
        assert float(losses["class_error"]) == 0.0
