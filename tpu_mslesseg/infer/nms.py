"""Padded fixed-shape NMS for XLA.

The reference relies on Ultralytics' dynamic-shape torch NMS
(iou 0.7, conf 0.25, max_det 300 — ``args.yaml:42-43`` and defaults).
Dynamic detection counts don't compile on TPU; this version keeps
everything static: take the top `max_det` candidates by score and return
a validity mask instead of a ragged result.

Suppression is computed as a FIXPOINT instead of the textbook sequential
scan: with candidates sorted by score, greedy keep/suppress decisions
satisfy ``keep_i = valid_i and no higher-scored kept j overlaps i``.
Iterating that equation from keep=valid converges to the exact greedy
solution in (suppression-chain depth) steps — in practice 2-5 — and each
step is one [K,K] @ [K] masked matvec that runs on the MXU. The
sequential formulation costs K=300 dependent tiny-vector steps
(latency-bound on TPU); the fixpoint costs ~4 matvecs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def box_iou_matrix(boxes):
    """[K,4] xyxy -> [K,K] pairwise IoU."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-7)


@functools.partial(jax.jit, static_argnames=("max_det",))
def nms_single(boxes, scores, conf_thres=0.25, iou_thres=0.7, max_det: int = 300):
    """Greedy NMS on one image.

    boxes [A,4] xyxy, scores [A] (already sigmoid'd, single class).
    Returns (boxes [max_det,4], scores [max_det], keep_mask [max_det] bool,
    indices [max_det] into the original A anchors).
    """
    k = min(max_det, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = boxes[top_idx]

    iou = box_iou_matrix(top_boxes)
    valid = top_scores > conf_thres

    # S[i, j] = True when the higher-scored candidate j can suppress i
    tri = jnp.tril(jnp.ones((k, k), bool), -1)
    S = ((iou > iou_thres) & tri).astype(jnp.float32)

    def cond(carry):
        keep, prev, it = carry
        return jnp.logical_and(it < k, jnp.any(keep != prev))

    def body(carry):
        keep, _, it = carry
        suppressed = (S @ keep.astype(jnp.float32)) > 0.0
        return valid & ~suppressed, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (valid, jnp.zeros((k,), bool), jnp.int32(0))
    )

    if k < max_det:
        pad = max_det - k
        top_boxes = jnp.pad(top_boxes, ((0, pad), (0, 0)))
        top_scores = jnp.pad(top_scores, (0, pad))
        keep = jnp.pad(keep, (0, pad))
        top_idx = jnp.pad(top_idx, (0, pad))
    return top_boxes, top_scores, keep, top_idx


nms_batch = jax.vmap(nms_single, in_axes=(0, 0, None, None, None))
