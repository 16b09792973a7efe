"""Segmentation mAP evaluator (box + mask AP50 / AP50-95).

Replaces the Ultralytics validator the reference relies on for per-epoch
val metrics and best-checkpoint fitness (``results.csv`` columns
``metrics/mAP50(B/M)`` etc.). Ultralytics-exact: IoU-descending unique
matching per threshold 0.50:0.05:0.95 (see ``match_image``), 101-point
trapezoidal AP with sentinel endpoints (see ``average_precision``).

Per-image matching runs on device with fixed shapes (padded preds x padded
GT); only the tiny (score, tp-bits) table crosses to host, where AP is
accumulated over the val set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

IOU_THRESHES = np.arange(0.5, 0.96, 0.05).round(2)  # 10 thresholds


def box_iou_pairs(a, b, eps=1e-7):
    """a [K,4], b [I,4] xyxy -> [K,I] IoU."""
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, eps)


def mask_iou_pairs(pred_masks, gt_masks, eps=1e-7):
    """pred [K,H,W] {0,1}, gt [I,H,W] {0,1} -> [K,I] IoU via one matmul."""
    K = pred_masks.shape[0]
    I = gt_masks.shape[0]
    p = pred_masks.reshape(K, -1).astype(jnp.float32)
    g = gt_masks.reshape(I, -1).astype(jnp.float32)
    inter = p @ g.T
    union = p.sum(-1)[:, None] + g.sum(-1)[None, :] - inter
    return inter / jnp.maximum(union, eps)


@jax.jit
def match_image(iou, pred_valid, gt_valid):
    """Ultralytics-exact per-image TP matching. iou [K,I] -> tp [K,10].

    Replicates ``BaseValidator.match_predictions`` (ultralytics 8.3.x, the
    evaluator behind the reference's results.csv anchors) rather than
    pycocotools' score-ordered greedy loop. Per IoU threshold, over the
    candidate pairs with iou >= thr, Ultralytics:

      1. sorts pairs by IoU descending and keeps each *pred*'s first
         occurrence (``np.unique(matches[:,1], return_index=True)``) —
         i.e. each pred keeps its highest-IoU GT; np.unique re-orders the
         surviving rows by ascending pred index;
      2. keeps each *GT*'s first occurrence in that pred-ascending order —
         i.e. each GT goes to the SMALLEST pred index still pointing at it
         (NOT the highest IoU — the IoU re-sort between the two uniques is
         commented out upstream).

    Exact-float IoU ties in step 1 resolve to the larger GT index (stable
    ascending argsort reversed), reproduced here by the reversed argmax.
    Scores never enter the matching (they only order the AP sweep), which
    is the observable difference from COCO score-order matching: a
    lower-scored pred with higher IoU wins the GT.
    """
    K, I = iou.shape
    threshes = jnp.asarray(IOU_THRESHES, jnp.float32)
    cand = jnp.where(pred_valid[:, None] & gt_valid[None, :], iou, 0.0)
    c = jnp.where(cand[None] >= threshes[:, None, None], cand[None], 0.0)

    # step 1: per-pred best GT (ties -> larger GT index)
    bestg = (I - 1) - jnp.argmax(c[:, :, ::-1], axis=2)  # [10,K]
    pair_iou = jnp.take_along_axis(c, bestg[..., None], axis=2)[..., 0]
    pairs = (pair_iou > 0.0)[..., None] & jax.nn.one_hot(bestg, I, dtype=bool)

    # step 2: per-GT first pred in ascending-pred order (argmax of bool
    # picks the smallest True index)
    bestk = jnp.argmax(pairs, axis=1)  # [10,I]
    gt_has = jnp.any(pairs, axis=1)
    sel = gt_has[..., None] & jax.nn.one_hot(bestk, K, dtype=bool)  # [10,I,K]
    return jnp.any(sel, axis=1).T  # [K,10]


def average_precision(scores, tps, n_gt: int):
    """Ultralytics-exact 101-point AP per IoU threshold.

    scores [N] (all preds across val set), tps [N,10] bool, n_gt total GT.
    Returns ap [10].

    Semantics match the evaluator that produced the reference's
    results.csv anchors (Ultralytics ``compute_ap``), NOT pycocotools:
    sentinel points (0,1) and (1,0) bracket the PR curve, the precision
    envelope is taken, and AP is the *trapezoidal integral* of the
    101-point linear interpolation. Two observable consequences pinned by
    tests/test_seg_map_goldens.py: a perfect detector scores 0.995 (the
    final (1,0) sentinel clips the last trapezoid), and precision ramps
    linearly from the curve's max recall down to (1,0) instead of
    dropping stepwise.
    """
    if n_gt == 0 or len(scores) == 0:
        return np.zeros(10)
    order = np.argsort(-scores)
    tps = tps[order]
    x = np.linspace(0, 1, 101)
    aps = np.zeros(10)
    for t in range(10):
        tp_cum = np.cumsum(tps[:, t])
        fp_cum = np.cumsum(~tps[:, t])
        recall = tp_cum / (n_gt + 1e-16)
        precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-16)
        mrec = np.concatenate(([0.0], recall, [1.0]))
        mpre = np.concatenate(([1.0], precision, [0.0]))
        mpre = np.flip(np.maximum.accumulate(np.flip(mpre)))
        aps[t] = np.trapezoid(np.interp(x, mrec, mpre), x)
    return aps


class SegMapAccumulator:
    """Accumulates per-image device matches into dataset-level metrics."""

    def __init__(self):
        self.scores = []
        self.tp_box = []
        self.tp_mask = []
        self.n_gt = 0

    def add_image(self, scores, valid, tp_box, tp_mask, n_gt: int):
        keep = np.asarray(valid)
        self.scores.append(np.asarray(scores)[keep])
        self.tp_box.append(np.asarray(tp_box)[keep])
        self.tp_mask.append(np.asarray(tp_mask)[keep])
        self.n_gt += int(n_gt)

    def compute(self) -> dict:
        if not self.scores:
            return {k: 0.0 for k in (
                "map50_b", "map_b", "map50_m", "map_m",
                "precision_b", "recall_b", "precision_m", "recall_m")}
        scores = np.concatenate(self.scores)
        tpb = (
            np.concatenate(self.tp_box)
            if self.tp_box
            else np.zeros((0, 10), bool)
        )
        tpm = np.concatenate(self.tp_mask) if self.tp_mask else np.zeros((0, 10), bool)
        ap_b = average_precision(scores, tpb, self.n_gt)
        ap_m = average_precision(scores, tpm, self.n_gt)

        # P/R at the max-F1 confidence threshold, IoU .5 (Ultralytics
        # reports the PR-curve operating point that maximizes F1)
        def pr_best_f1(tps):
            if len(scores) == 0 or self.n_gt == 0:
                return 0.0, 0.0
            order = np.argsort(-scores)
            t = tps[order, 0]
            tp_cum = np.cumsum(t)
            fp_cum = np.cumsum(~t)
            prec = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
            rec = tp_cum / self.n_gt
            f1 = 2 * prec * rec / np.maximum(prec + rec, 1e-9)
            i = int(np.argmax(f1))
            return float(prec[i]), float(rec[i])

        pb, rb = pr_best_f1(tpb)
        pm, rm = pr_best_f1(tpm)
        return {
            "map50_b": float(ap_b[0]),
            "map_b": float(ap_b.mean()),
            "map50_m": float(ap_m[0]),
            "map_m": float(ap_m.mean()),
            "precision_b": pb,
            "recall_b": rb,
            "precision_m": pm,
            "recall_m": rm,
        }
