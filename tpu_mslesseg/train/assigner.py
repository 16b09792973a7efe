"""Task-aligned label assignment (TAL), fixed-shape XLA version.

Functional equivalent of the assigner Ultralytics uses for YOLO11 training
(consumed by the reference through ``model.train``, SURVEY §2.2): for every
ground-truth box, score anchors by ``cls_score**alpha * CIoU**beta``
(alpha 0.5, beta 6.0), keep the top-10 whose centers fall inside the box,
resolve multi-GT anchors by highest IoU, and emit soft target scores
normalized per-GT by max-IoU/max-metric.

Everything is dense masked math over [B, M, A] — no ragged shapes, no host
sync — so the whole assignment fuses into the training step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def bbox_iou_ciou(box1, box2, eps: float = 1e-7):
    """CIoU between broadcastable xyxy boxes (last dim 4)."""
    b1x1, b1y1, b1x2, b1y2 = jnp.split(box1, 4, axis=-1)
    b2x1, b2y1, b2x2, b2y2 = jnp.split(box2, 4, axis=-1)
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1

    inter_w = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0)
    inter_h = jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0)
    inter = inter_w * inter_h
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    c2 = cw**2 + ch**2 + eps
    rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
    v = (4 / jnp.pi**2) * (
        jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps))
    ) ** 2
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

    # anchors inside GT boxes: [B, M, A]
    px = anc_points[None, None, :, 0]
    py = anc_points[None, None, :, 1]
    in_gt = (
        (px - gt_bboxes[..., 0:1] > eps)
        & (py - gt_bboxes[..., 1:2] > eps)
        & (gt_bboxes[..., 2:3] - px > eps)
        & (gt_bboxes[..., 3:4] - py > eps)
    )

    # overlaps and class scores per (gt, anchor)
    overlaps = jnp.clip(
        bbox_iou_ciou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :]), 0
    )  # [B, M, A]
    cls_idx = jnp.clip(gt_labels, 0, nc - 1)  # [B, M]
    scores = jnp.take_along_axis(
        jnp.swapaxes(pd_scores, 1, 2),  # [B, nc, A]
        cls_idx[:, :, None],
        axis=1,
    )  # [B, M, A]
    align = (scores**alpha) * (overlaps**beta)

    valid = in_gt & gt_valid[:, :, None]
    align_masked = jnp.where(valid, align, 0.0)

    # top-k anchors per GT by alignment metric
    k = min(topk, A)
    topk_vals, topk_idx = jax.lax.top_k(align_masked, k)  # [B, M, k]
    topk_ok = topk_vals > eps
    mask_topk = jnp.zeros((B, M, A), bool)
    mask_topk = jax.vmap(
        jax.vmap(lambda m, idx, ok: m.at[idx].set(ok))
    )(mask_topk, topk_idx, topk_ok)
    mask_pos = mask_topk & valid  # [B, M, A]

    # resolve anchors claimed by multiple GTs: keep the max-overlap GT
    n_claims = mask_pos.sum(axis=1)  # [B, A]
    best_gt_by_iou = jnp.argmax(jnp.where(mask_pos, overlaps, -1.0), axis=1)  # [B,A]
    multi = (n_claims > 1)[:, None, :]  # [B,1,A]
    is_best = (
        jax.nn.one_hot(best_gt_by_iou, M, dtype=jnp.bool_).swapaxes(1, 2)
    )  # [B, M, A]
    mask_pos = jnp.where(multi, mask_pos & is_best, mask_pos)

    fg_mask = mask_pos.any(axis=1)  # [B, A]
    target_gt_idx = jnp.argmax(mask_pos, axis=1)  # [B, A]

    # gather targets
    tb = jnp.take_along_axis(gt_bboxes, target_gt_idx[..., None], axis=1)  # [B,A,4]
    tl = jnp.take_along_axis(gt_labels, target_gt_idx, axis=1)  # [B, A]

    # normalized soft scores
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
