import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mslesseg.evalx import seg_map


def test_match_image_perfect():
    iou = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    tp = np.asarray(
        seg_map.match_image(iou, jnp.asarray([True, True]),
                            jnp.asarray([True, True]))
    )
    assert tp.all()  # both preds match their GT at every threshold


def test_match_image_claims_once():
    # two preds on the same GT: matching is IoU-ordered (Ultralytics), so
    # the HIGHER-IoU pred wins regardless of which scored higher at NMS
    iou = jnp.asarray([[0.9], [0.85]])
    tp = np.asarray(
        seg_map.match_image(iou, jnp.asarray([True, True]),
                            jnp.asarray([True]))
    )
    np.testing.assert_array_equal(tp[0], seg_map.IOU_THRESHES <= 0.9)
    assert not tp[1].any()  # its GT is taken at every threshold it passes


def test_match_image_unique_gt_prefers_smaller_pred_index():
    # Ultralytics quirk pinned: after the per-pred unique, rows are in
    # pred-index order, so the second unique gives a contested GT to the
    # SMALLEST pred index — not the highest IoU (the IoU re-sort between
    # the two np.unique calls is commented out upstream). Where pred 0's
    # pair falls below the threshold, pred 1 becomes the only candidate.
    iou = jnp.asarray([[0.6], [0.9]])
    tp = np.asarray(
        seg_map.match_image(iou, jnp.asarray([True, True]),
                            jnp.asarray([True]))
    )
    np.testing.assert_array_equal(tp[0], seg_map.IOU_THRESHES <= 0.6)
    np.testing.assert_array_equal(
        tp[1], (seg_map.IOU_THRESHES > 0.6) & (seg_map.IOU_THRESHES <= 0.9)
    )


def test_match_image_threshold_cut():
    iou = jnp.asarray([[0.6]])
    tp = np.asarray(
        seg_map.match_image(iou, jnp.asarray([True]), jnp.asarray([True]))
    )
    # IoU .6 passes thresholds .5, .55, .6 only
    np.testing.assert_array_equal(tp[0], seg_map.IOU_THRESHES <= 0.6)


def test_match_image_invalid_gt_ignored():
    iou = jnp.asarray([[0.99]])
    tp = np.asarray(
        seg_map.match_image(iou, jnp.asarray([True]), jnp.asarray([False]))
    )
    assert not tp.any()


def test_match_image_matches_ultralytics_numpy_reference():
    """Randomized cross-check against a literal NumPy transcription of
    ultralytics 8.3.x BaseValidator.match_predictions (the evaluator the
    reference's results.csv anchors come from)."""
    rng = np.random.default_rng(7)
    for _ in range(20):
        K, I = rng.integers(1, 12), rng.integers(1, 6)
        iou = rng.uniform(0, 1, (K, I)).astype(np.float32)
        pv = rng.uniform(0, 1, K) > 0.2
        gv = rng.uniform(0, 1, I) > 0.2
        masked = iou * pv[:, None] * gv[None, :]

        expected = np.zeros((K, 10), bool)
        iou_ul = masked.T  # ultralytics works on [n_gt, n_pred]
        for i, thr in enumerate(seg_map.IOU_THRESHES):
            matches = np.nonzero(iou_ul >= thr)
            matches = np.array(matches).T
            if matches.shape[0]:
                if matches.shape[0] > 1:
                    matches = matches[
                        iou_ul[matches[:, 0], matches[:, 1]].argsort()[::-1]
                    ]
                    matches = matches[np.unique(matches[:, 1], return_index=True)[1]]
                    matches = matches[np.unique(matches[:, 0], return_index=True)[1]]
                expected[matches[:, 1].astype(int), i] = True

        got = np.asarray(
            seg_map.match_image(jnp.asarray(iou), jnp.asarray(pv), jnp.asarray(gv))
        )
        np.testing.assert_array_equal(got, expected)


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
