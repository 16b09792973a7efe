"""Task-aligned label assignment (TAL), fixed-shape XLA version.

Functional equivalent of the assigner Ultralytics uses for YOLO11 training
(consumed by the reference through ``model.train``, SURVEY §2.2;
ultralytics==8.3.70 pinned at ``/root/reference/requirements.txt``): for
every ground-truth box, score anchors by ``cls_score**alpha * CIoU**beta``
(alpha 0.5, beta 6.0), keep the top-10 per GT, resolve multi-GT anchors by
highest IoU, and emit soft target scores normalized per-GT by
max-IoU/max-metric.

Semantics are differentially pinned against a literal NumPy transcription
of upstream (``tests/ultralytics_np.py``, randomized cross-checks in
``tests/test_parity_ultra.py``), including the upstream quirks:

* top-k indices are masked by GT *validity* only — NOT by metric > eps —
  so zero-metric in-box anchors can become foreground when a GT has fewer
  than ``topk`` positive-metric anchors (common for tiny MS lesions early
  in training); duplicate scatter counts (>1) are zeroed;
* multi-claimed anchors are reassigned by argmax over the overlaps of ALL
  GTs (not just the claiming ones), so an anchor can land on a GT that
  never selected it via top-k;
* ``bbox_iou``'s eps lands on h1/h2 and the union (upstream placement).

Everything is dense masked math over [B, M, A] — no ragged shapes, no host
sync — so the whole assignment fuses into the training step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def bbox_iou_ciou(box1, box2, eps: float = 1e-7):
    """CIoU between broadcastable xyxy boxes (last dim 4). Bit-faithful to
    ultralytics/utils/metrics.py::bbox_iou(xywh=False, CIoU=True): the
    eps lands on h1/h2 (not w) and again on the union."""
    b1x1, b1y1, b1x2, b1y2 = jnp.split(box1, 4, axis=-1)
    b2x1, b2y1, b2x2, b2y2 = jnp.split(box2, 4, axis=-1)
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1 + eps
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1 + eps

    inter_w = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0)
    inter_h = jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0)
    inter = inter_w * inter_h
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    c2 = cw**2 + ch**2 + eps
    rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
    v = (4 / jnp.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    alpha = v / (v - iou + (1 + eps))
    alpha = jax.lax.stop_gradient(alpha)
    ciou = iou - (rho2 / c2 + v * alpha)
    return ciou.squeeze(-1)


@functools.partial(jax.jit, static_argnames=("topk", "num_classes"))
def assign(
    pd_scores,  # [B, A, nc] sigmoid class scores
    pd_bboxes,  # [B, A, 4] xyxy (input-pixel units)
    anc_points,  # [A, 2] anchor centers (input-pixel units)
    gt_labels,  # [B, M] int
    gt_bboxes,  # [B, M, 4] xyxy (input-pixel units)
    gt_valid,  # [B, M] bool
    topk: int = 10,
    num_classes: int = 1,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
):
    """Returns dict:
    target_bboxes [B,A,4], target_scores [B,A,nc], fg_mask [B,A] bool,
    target_gt_idx [B,A] int (index into M, valid only where fg).
    """
    B, A, nc = pd_scores.shape
    M = gt_bboxes.shape[1]

    def _topk_indices_desc(x, k):
        """Exact top-k indices, descending, lowest-index tie-break —
        identical selection to ``lax.top_k`` (stable sort) and to the
        torch.topk behavior the parity transcription pins. k argmax
        passes (k linear scans) instead of XLA's full-sort lowering,
        which runs the [B, M, A] sort at 7.5 GB/s (~2.3 ms/step at
        b=8 — the assigner's entire remaining device cost)."""
        cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        idxs = []
        for _ in range(k):
            i = jnp.argmax(x, axis=-1)  # first occurrence == lowest index
            idxs.append(i)
            x = jnp.where(cols == i[..., None], -jnp.inf, x)
        return jnp.stack(idxs, axis=-1)

    # anchors inside GT boxes: [B, M, A]
    px = anc_points[None, None, :, 0]
    py = anc_points[None, None, :, 1]
    in_gt = (
        (px - gt_bboxes[..., 0:1] > eps)
        & (py - gt_bboxes[..., 1:2] > eps)
        & (gt_bboxes[..., 2:3] - px > eps)
        & (gt_bboxes[..., 3:4] - py > eps)
    )
    valid = in_gt & gt_valid[:, :, None]

    # overlaps and class scores per (gt, anchor) — upstream fills both only
    # where in-gt & valid (zeros elsewhere), which the normalization below
    # depends on for anchors reassigned outside their best GT's box
    overlaps = jnp.where(
        valid,
        jnp.clip(bbox_iou_ciou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :]), 0),
        0.0,
    )  # [B, M, A]
    cls_idx = jnp.clip(gt_labels, 0, nc - 1)  # [B, M]
    scores = jnp.take_along_axis(
        jnp.swapaxes(pd_scores, 1, 2),  # [B, nc, A]
        cls_idx[:, :, None],
        axis=1,
    )  # [B, M, A]
    scores = jnp.where(valid, scores, 0.0)
    align = (scores**alpha) * (overlaps**beta)  # zero outside valid

    # top-k anchors per GT, faithful select_topk_candidates: indices of
    # invalid GTs are masked to 0 (not dropped — their rows die at the
    # mask_pos product), scatter counts accumulate, entries >1 are zeroed.
    # There is NO metric>eps filter: a GT with fewer than topk
    # positive-metric anchors pads its claims with zero-metric anchors
    # (lowest-index tie-break, matching torch's sorts).
    k = min(topk, A)
    topk_idx = _topk_indices_desc(align, k)  # [B, M, k]
    topk_idx = jnp.where(gt_valid[:, :, None], topk_idx, 0)
    # claim counts as a compare-reduce over the k axis (exact integer
    # counts, same as scatter-add): the batched [B, M] scatter into A
    # slots runs scalarized on TPU; the [B, M, k, A] compare+sum fuses
    counts = jnp.sum(
        (topk_idx[..., None] == jnp.arange(A, dtype=topk_idx.dtype)).astype(
            jnp.int32
        ),
        axis=-2,
    )  # [B, M, A]
    mask_pos = (counts == 1) & valid  # [B, M, A]

    # resolve anchors claimed by multiple GTs, faithful
    # select_highest_overlaps: argmax over the (masked) overlaps of ALL
    # GTs — the winner needn't be a claiming GT
    n_claims = mask_pos.sum(axis=1)  # [B, A]
    best_gt_by_iou = jnp.argmax(overlaps, axis=1)  # [B, A]
    is_best = jax.nn.one_hot(best_gt_by_iou, M, dtype=jnp.bool_).swapaxes(1, 2)
    mask_pos = jnp.where((n_claims > 1)[:, None, :], is_best, mask_pos)

    fg_mask = mask_pos.any(axis=1)  # [B, A]
    target_gt_idx = jnp.argmax(mask_pos, axis=1)  # [B, A]

    # gather targets — as a compare-select reduction over the (small) M
    # axis, NOT take_along_axis: XLA's TPU gather for [B, A] indices into
    # [B, M, 4] runs at ~7 GB/s (1.5 ms/step at b=32); the one-hot sum is
    # fully vectorized and bitwise identical (the other M-1 terms are
    # exact zeros; no matmul, so nothing is rounded through bf16)
    gt_m = jnp.arange(M, dtype=target_gt_idx.dtype)
    sel = gt_m[None, None, :] == target_gt_idx[..., None]  # [B, A, M]
    tb = jnp.sum(
        jnp.where(sel[..., None], gt_bboxes[:, None, :, :], 0.0), axis=2
    )  # [B, A, 4]
    tl = jnp.sum(jnp.where(sel, gt_labels[:, None, :], 0), axis=2)  # [B, A]

    # normalized soft scores (align/overlaps already masked to valid)
    align_pos = jnp.where(mask_pos, align, 0.0)
    pos_align = align_pos.max(axis=-1, keepdims=True)  # [B, M, 1]
    pos_overlap = jnp.where(mask_pos, overlaps, 0.0).max(axis=-1, keepdims=True)
    norm = (align_pos * pos_overlap / (pos_align + eps)).max(axis=1)  # [B, A]

    onehot = jax.nn.one_hot(jnp.clip(tl, 0, nc - 1), nc, dtype=pd_scores.dtype)
    target_scores = onehot * norm[..., None] * fg_mask[..., None]

    return {
        "target_bboxes": tb,
        "target_scores": target_scores,
        "fg_mask": fg_mask,
        "target_gt_idx": target_gt_idx,
    }
