import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mslesseg.evalx import seg_map


def test_match_image_perfect():
    iou = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    scores = jnp.asarray([0.9, 0.8])
    tp = np.asarray(
        seg_map.match_image(iou, scores, jnp.asarray([True, True]),
                            jnp.asarray([True, True]))
    )
    assert tp.all()  # both preds match their GT at every threshold


def test_match_image_claims_once():
    # two preds on the same GT: only the higher-scored one matches
    iou = jnp.asarray([[0.9], [0.85]])
    scores = jnp.asarray([0.5, 0.9])
    tp = np.asarray(
        seg_map.match_image(iou, scores, jnp.asarray([True, True]),
                            jnp.asarray([True]))
    )
    # higher-scored pred claims the GT at thresholds its IoU (.85) passes
    np.testing.assert_array_equal(tp[1], seg_map.IOU_THRESHES <= 0.85)
    # per-threshold matching is independent: where the winner's IoU fails
    # (t=.9) the unclaimed GT goes to the lower-scored pred (IoU .9)
    np.testing.assert_array_equal(
        tp[0], (seg_map.IOU_THRESHES > 0.85) & (seg_map.IOU_THRESHES <= 0.9)
    )


def test_match_image_threshold_cut():
    iou = jnp.asarray([[0.6]])
    scores = jnp.asarray([0.9])
    tp = np.asarray(
        seg_map.match_image(iou, scores, jnp.asarray([True]), jnp.asarray([True]))
    )
    # IoU .6 passes thresholds .5, .55, .6 only
    np.testing.assert_array_equal(tp[0], seg_map.IOU_THRESHES <= 0.6)


def test_match_image_invalid_gt_ignored():
    iou = jnp.asarray([[0.99]])
    scores = jnp.asarray([0.9])
    tp = np.asarray(
        seg_map.match_image(iou, scores, jnp.asarray([True]), jnp.asarray([False]))
    )
    assert not tp.any()


def test_average_precision_perfect():
    scores = np.asarray([0.9, 0.8, 0.7])
    tps = np.ones((3, 10), bool)
    ap = seg_map.average_precision(scores, tps, n_gt=3)
    np.testing.assert_allclose(ap, 1.0, atol=0.01)


def test_average_precision_half():
    # one TP, one FP ranked above it, 1 GT total
    scores = np.asarray([0.9, 0.8])
    tps = np.zeros((2, 10), bool)
    tps[1] = True
    ap = seg_map.average_precision(scores, tps, n_gt=1)
    # precision at recall 1 is 0.5; AP ~ 0.5
    assert 0.45 <= ap[0] <= 0.55


def test_accumulator_best_f1_pr():
    acc = seg_map.SegMapAccumulator()
    # image: 2 GT, 3 preds (2 TP at high score, 1 FP at low score)
    scores = np.asarray([0.9, 0.8, 0.2, 0.0])
    valid = np.asarray([True, True, True, False])
    tp = np.zeros((4, 10), bool)
    tp[0] = tp[1] = True
    acc.add_image(scores, valid, tp, tp, n_gt=2)
    m = acc.compute()
    # best F1 point: the two TPs -> P=1, R=1
    assert m["precision_m"] == 1.0 and m["recall_m"] == 1.0
    assert m["map50_m"] > 0.99


def test_mask_iou_pairs():
    a = np.zeros((1, 8, 8)); a[0, :4] = 1
    b = np.zeros((2, 8, 8)); b[0, :4] = 1; b[1, 2:6] = 1
    iou = np.asarray(seg_map.mask_iou_pairs(jnp.asarray(a), jnp.asarray(b)))
    assert abs(iou[0, 0] - 1.0) < 1e-6
    assert abs(iou[0, 1] - (16 / 48)) < 1e-6
