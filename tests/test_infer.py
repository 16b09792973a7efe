import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mslesseg.infer import decode as dec
from tpu_mslesseg.infer.nms import box_iou_matrix, nms_single
from tpu_mslesseg.infer.reconstruct import consensus_vote, reconstruct_volume
from tpu_mslesseg.evalx import metrics


# ---------------- decode ----------------


def test_make_anchors_counts():
    pts, strides = dec.make_anchors(640, 640)
    assert pts.shape == (8400, 2)  # 80^2 + 40^2 + 20^2
    assert strides.shape == (8400, 1)
    # first anchor: center of top-left cell at stride 8
    np.testing.assert_allclose(np.asarray(pts[0]), [0.5, 0.5])
    assert float(strides[0, 0]) == 8.0
    assert float(strides[-1, 0]) == 32.0


def test_dfl_expectation_peaked():
    # all mass on bin 3 -> expectation 3
    logits = np.full((1, 1, 64), -20.0, np.float32)
    for side in range(4):
        logits[0, 0, side * 16 + 3] = 20.0
    out = np.asarray(dec.dfl_expectation(jnp.asarray(logits)))
    np.testing.assert_allclose(out[0, 0], [3, 3, 3, 3], atol=1e-4)


def test_dist2bbox():
    anchors = jnp.asarray([[10.0, 20.0]])
    ltrb = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    out = np.asarray(dec.dist2bbox(ltrb, anchors))
    np.testing.assert_allclose(out[0], [9, 18, 13, 24])


def test_letterbox_geometry_axial():
    # axial slice volume-space (182, 218) -> PNG space (218, 182)
    lb = dec.Letterbox(src_h=218, src_w=182, size=640)
    assert lb.new_h == 640 and lb.new_w == round(182 * 640 / 218)
    assert lb.pad_top == 0
    assert 0 < lb.pad_left < 640
    ys, xs = lb.src_centers_in_letterbox()
    assert ys.shape == (218,) and xs.shape == (182,)
    # centers must lie inside the content region
    assert float(ys[0]) >= -0.5 and float(ys[-1]) <= 640.5
    assert float(xs[0]) >= lb.pad_left - 1


def test_letterbox_apply_pads_with_gray():
    lb = dec.Letterbox(src_h=100, src_w=50, size=64)
    img = jnp.ones((1, 100, 50), jnp.float32)
    out = np.asarray(lb.apply(img))
    assert out.shape == (1, 64, 64)
    # padded columns are 114/255
    assert abs(out[0, 0, 0] - 114 / 255) < 1e-6
    # content region is 1.0
    assert abs(out[0, 32, 32] - 1.0) < 1e-5


# ---------------- NMS ----------------


def test_iou_matrix():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
        jnp.float32,
    )
    iou = np.asarray(box_iou_matrix(boxes))
    assert abs(iou[0, 1] - 1.0) < 1e-6
    assert abs(iou[0, 2] - 25 / 175) < 1e-5
    assert iou[0, 3] == 0.0


def test_nms_suppresses_duplicates():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [1, 0, 11, 10], [50, 50, 60, 60]], jnp.float32
    )
    scores = jnp.asarray([0.9, 0.8, 0.7], jnp.float32)
    b, s, keep, idx = nms_single(boxes, scores, 0.25, 0.7, 300)
    keep = np.asarray(keep)
    assert keep[0] and not keep[1] and keep[2]  # near-duplicate suppressed
    assert keep.sum() == 2


def test_nms_conf_threshold():
    boxes = jnp.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], jnp.float32)
    scores = jnp.asarray([0.9, 0.1], jnp.float32)
    _, _, keep, _ = nms_single(boxes, scores, 0.25, 0.7, 300)
    assert np.asarray(keep).sum() == 1


def test_nms_keeps_all_disjoint():
    rng = np.random.default_rng(0)
    xy = rng.uniform(0, 600, (20, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + 5], axis=1))
    scores = jnp.asarray(rng.uniform(0.5, 1.0, 20).astype(np.float32))
    _, _, keep, _ = nms_single(boxes, scores, 0.25, 0.7, 300)
    # 5x5 boxes at random positions in 600px: collisions with IoU>0.7 ~ none
    assert np.asarray(keep).sum() >= 19


# ---------------- reconstruction & consensus ----------------


def test_reconstruct_and_consensus(rng):
    shape = (10, 12, 14)
    gt = (rng.random(shape) > 0.7).astype(np.float32)
    vols = {}
    for plane, axis in (("axial", 2), ("coronal", 1), ("sagital", 0)):
        n = shape[axis]
        from tpu_mslesseg.core import geometry

        slices = geometry.extract_slices(gt, plane, list(range(n)))
        vols[plane] = np.asarray(
            reconstruct_volume(shape, slices, plane, list(range(n)))
        )
        np.testing.assert_array_equal(vols[plane], gt)

    cons = np.asarray(consensus_vote(vols["axial"], vols["coronal"], vols["sagital"], 2))
    np.testing.assert_array_equal(cons, gt.astype(np.uint8))

    # drop one plane -> unanimity fails where only 2 planes agree
    cons3 = np.asarray(
        consensus_vote(vols["axial"], vols["coronal"], np.zeros(shape), 3)
    )
    assert cons3.sum() == 0


# ---------------- metrics ----------------


def test_metrics_perfect():
    gt = np.zeros((5, 5, 5), np.float32)
    gt[1:3] = 1
    m = metrics.compute_metrics(gt, gt)
    assert m["DSC"] == 1.0 and m["Precision"] == 1.0 and m["Recall"] == 1.0
    assert m["AUC"] == 1.0


def test_metrics_against_sklearn(rng):
    sklearn_metrics = pytest.importorskip("sklearn.metrics")
    gt = (rng.random((20, 20, 20)) > 0.8).astype(np.float64)
    pred = (rng.random((20, 20, 20)) > 0.8).astype(np.float64)
    m = metrics.compute_metrics(gt, pred)
    auc_ref = float(np.round(sklearn_metrics.roc_auc_score(gt.ravel(), pred.ravel()), 3))
    assert m["AUC"] == auc_ref
    inter = (gt * pred).sum()
    dsc_ref = float(np.round(2 * inter / (gt.sum() + pred.sum() + 1e-8), 3))
    assert m["DSC"] == dsc_ref
    tp = ((gt == 1) & (pred == 1)).sum()
    fp = ((gt == 0) & (pred == 1)).sum()
    fn = ((gt == 1) & (pred == 0)).sum()
    assert m["Precision"] == float(np.round(tp / (tp + fp + 1e-8), 3))
    assert m["Recall"] == float(np.round(tp / (tp + fn + 1e-8), 3))


def test_auc_single_class_nan():
    gt = np.zeros((4, 4, 4))
    pred = np.ones((4, 4, 4))
    assert np.isnan(metrics.compute_metrics(gt, pred)["AUC"])


def test_nms_fixpoint_matches_sequential_greedy():
    """The MXU fixpoint NMS must reproduce textbook sequential greedy
    suppression exactly — randomized property test against an independent
    numpy implementation, including chain cases (a suppresses b, b would
    have suppressed c, so c survives)."""
    import numpy as np

    def greedy_np(boxes, scores, conf, iou_t):
        order = np.argsort(-scores, kind="stable")
        keep = np.zeros(len(scores), bool)
        for i in order:
            if scores[i] <= conf:
                continue
            ok = True
            for j in order:
                if j == i or not keep[j] or scores[j] < scores[i]:
                    continue
                # IoU
                x1 = max(boxes[i, 0], boxes[j, 0]); y1 = max(boxes[i, 1], boxes[j, 1])
                x2 = min(boxes[i, 2], boxes[j, 2]); y2 = min(boxes[i, 3], boxes[j, 3])
                inter = max(x2 - x1, 0) * max(y2 - y1, 0)
                a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
                a_j = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
                if inter / max(a_i + a_j - inter, 1e-7) > iou_t:
                    ok = False
                    break
            keep[i] = ok
        return keep

    rng = np.random.default_rng(7)
    for trial in range(20):
        n = 64
        xy = rng.uniform(0, 80, (n, 2))
        wh = rng.uniform(5, 40, (n, 2))
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        _, top_scores, keep, idx = nms_single(
            jnp.asarray(boxes), jnp.asarray(scores), 0.25, 0.5, n
        )
        ref = greedy_np(boxes, scores, 0.25, 0.5)
        got = np.zeros(n, bool)
        got[np.asarray(idx)[np.asarray(keep)]] = True
        np.testing.assert_array_equal(got, ref, err_msg=f"trial {trial}")


def test_nms_explicit_chain_revival():
    # a suppresses b; b (suppressed) must NOT suppress c
    boxes = jnp.asarray([
        [0.0, 0.0, 10.0, 10.0],   # a (score .9)
        [0.0, 0.0, 10.0, 8.0],    # b overlaps a heavily (score .8)
        [0.0, 6.0, 10.0, 14.0],   # c overlaps b but not a enough (score .7)
    ])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    _, _, keep, idx = nms_single(boxes, scores, 0.25, 0.5, 3)
    kept = set(np.asarray(idx)[np.asarray(keep)].tolist())
    assert kept == {0, 2}
