"""Literal NumPy transcriptions of the Ultralytics 8.3.x training
semantics the reference consumes through ``YOLO(...).train`` (reference
``yolo_mslesseg/scripts/train.py:358-366``; hyperparameters
``trains/Base/FLAIR_P50c_5folds_50epochs/axial/fold1/args.yaml:73-103``,
ultralytics==8.3.70 pinned in ``/root/reference/requirements.txt``).

These are the *differential parity oracles* for ``train/assigner.py`` and
``train/losses.py`` (VERDICT r2 missing #1): hand-transcribed from the
upstream sources (ultralytics/utils/tal.py TaskAlignedAssigner,
ultralytics/utils/metrics.py bbox_iou, ultralytics/utils/loss.py
v8DetectionLoss/v8SegmentationLoss/BboxLoss/DFLoss, ultralytics/utils/ops.py
crop_mask) into plain NumPy, preserving every quirk:

* ``select_topk_candidates`` masks the top-k indices by the VALID-GT mask
  only (``topk_mask=mask_gt.expand(...)``) — NOT by metric > eps — so
  zero-metric in-box anchors can become foreground when a GT has fewer
  than ``topk`` positive-metric anchors (active for tiny MS lesions);
  duplicate counts (>1) are zeroed.
* ``select_highest_overlaps`` resolves multi-claimed anchors by argmax
  over the overlaps of ALL GTs (masked to in-gt&valid but NOT to the
  claiming set), so an anchor can be reassigned to a GT that never
  claimed it via top-k.
* ``bbox_iou``'s ``eps`` lands on h1/h2 (not w) and again on the union.
* target ltrb clamps to ``reg_max - 1 - 0.01``; DFL is the two-bin CE
  blend averaged over the 4 sides.
* mask loss: per-fg-anchor BCE cropped to the target box, mean over the
  WHOLE proto map, divided by the *normalized* box area (no clamping),
  summed, then divided by the total fg count; seg gain is ``hyp.box``
  with NO batch division (confirmed against the reference's logged
  train/seg_loss magnitude ~2.4-3.2).

Tie-breaking note: ``torch.topk``/``argmax`` tie order is
backend-specific upstream; this transcription (and the JAX
implementation) break ties toward the lowest index, which is what both
torch-CPU and the CUDA radix sorts produce in practice. Randomized
float inputs make exact ties (other than the structural zeros) measure
zero.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# ultralytics/utils/metrics.py::bbox_iou (xywh=False, CIoU=True)
# ---------------------------------------------------------------------------


def bbox_iou_ciou(box1, box2, eps=1e-7):
    """CIoU between broadcastable xyxy boxes; last dim 4 -> squeezed."""
    b1_x1, b1_y1, b1_x2, b1_y2 = np.split(box1, 4, axis=-1)
    b2_x1, b2_y1, b2_x2, b2_y2 = np.split(box2, 4, axis=-1)
    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps

    inter = np.clip(np.minimum(b1_x2, b2_x2) - np.maximum(b1_x1, b2_x1), 0, None) * np.clip(
        np.minimum(b1_y2, b2_y2) - np.maximum(b1_y1, b2_y1), 0, None
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    cw = np.maximum(b1_x2, b2_x2) - np.minimum(b1_x1, b2_x1)
    ch = np.maximum(b1_y2, b2_y2) - np.minimum(b1_y1, b2_y1)
    c2 = cw**2 + ch**2 + eps
    rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
    v = (4 / np.pi**2) * (np.arctan(w2 / h2) - np.arctan(w1 / h1)) ** 2
    alpha = v / (v - iou + (1 + eps))  # upstream: computed under no_grad
    return (iou - (rho2 / c2 + v * alpha))[..., 0]


# ---------------------------------------------------------------------------
# ultralytics/utils/tal.py::TaskAlignedAssigner (topk=10, alpha=0.5, beta=6)
# ---------------------------------------------------------------------------


def _topk_lowest_tiebreak(metrics, k):
    """torch.topk(largest=True) with lowest-index tie-break: values and
    indices, [..., k]."""
    # stable argsort of -metrics keeps lower indices first among ties
    idx = np.argsort(-metrics, axis=-1, kind="stable")[..., :k]
    vals = np.take_along_axis(metrics, idx, axis=-1)
    return vals, idx


def select_candidates_in_gts(xy_centers, gt_bboxes, eps=1e-9):
    """[A,2], [B,M,4] -> bool [B,M,A]: anchor centers strictly inside."""
    lt = gt_bboxes[..., None, :2]  # [B,M,1,2]
    rb = gt_bboxes[..., None, 2:]
    deltas = np.concatenate(
        [xy_centers[None, None] - lt, rb - xy_centers[None, None]], axis=-1
    )  # [B,M,A,4]
    return deltas.min(axis=-1) > eps


def select_topk_candidates(metrics, mask_gt, topk):
    """metrics [B,M,A], mask_gt [B,M] bool -> count mask [B,M,A] float.
    Faithful: indices of invalid GTs are masked to 0 (NOT dropped), the
    per-(b,m) counts are scatter-accumulated and entries >1 are zeroed."""
    B, M, A = metrics.shape
    _, topk_idxs = _topk_lowest_tiebreak(metrics, min(topk, A))
    topk_idxs = np.where(mask_gt[..., None], topk_idxs, 0)
    count = np.zeros((B, M, A), np.int64)
    np.add.at(
        count,
        (
            np.arange(B)[:, None, None],
            np.arange(M)[None, :, None],
            topk_idxs,
        ),
        1,
    )
    count[count > 1] = 0
    return count.astype(metrics.dtype)


def select_highest_overlaps(mask_pos, overlaps, n_max_boxes):
    """mask_pos [B,M,A], overlaps [B,M,A] -> (target_gt_idx [B,A],
    fg_mask [B,A], mask_pos). Faithful multi-claim resolution: argmax
    over the overlaps of ALL GTs."""
    fg_mask = mask_pos.sum(axis=-2)  # [B,A]
    if fg_mask.max() > 1:
        mask_multi_gts = (fg_mask[:, None, :] > 1)  # [B,1,A] -> broadcast
        max_overlaps_idx = overlaps.argmax(axis=1)  # [B,A] (first max)
        is_max_overlaps = np.zeros_like(mask_pos)
        np.put_along_axis(is_max_overlaps, max_overlaps_idx[:, None, :], 1.0, axis=1)
        mask_pos = np.where(mask_multi_gts, is_max_overlaps, mask_pos)
        fg_mask = mask_pos.sum(axis=-2)
    target_gt_idx = mask_pos.argmax(axis=-2)  # [B,A]
    return target_gt_idx, fg_mask, mask_pos


def tal_forward(
    pd_scores,  # [B,A,nc] sigmoid scores
    pd_bboxes,  # [B,A,4] xyxy, input px
    anc_points,  # [A,2] input px
    gt_labels,  # [B,M] int
    gt_bboxes,  # [B,M,4] xyxy, input px
    mask_gt,  # [B,M] bool
    topk=10,
    num_classes=1,
    alpha=0.5,
    beta=6.0,
    eps=1e-9,
):
    """TaskAlignedAssigner.forward -> (target_labels, target_bboxes,
    target_scores, fg_mask bool, target_gt_idx), all [B,A,...]."""
    B, A, nc = pd_scores.shape
    M = gt_bboxes.shape[1]
    if M == 0:
        return (
            np.full((B, A), num_classes, np.int64),
            np.zeros((B, A, 4), pd_bboxes.dtype),
            np.zeros((B, A, nc), pd_scores.dtype),
            np.zeros((B, A), bool),
            np.zeros((B, A), np.int64),
        )

    # --- get_pos_mask / get_box_metrics ---
    mask_in_gts = select_candidates_in_gts(anc_points, gt_bboxes)  # [B,M,A]
    mask_valid = mask_in_gts & mask_gt[:, :, None]

    bbox_scores = np.zeros((B, M, A), pd_scores.dtype)
    cls_idx = gt_labels.astype(np.int64)  # upstream indexes raw labels
    scores_bma = np.take_along_axis(
        pd_scores.transpose(0, 2, 1), cls_idx[:, :, None], axis=1
    )  # [B,M,A]
    bbox_scores[mask_valid] = scores_bma[mask_valid]

    overlaps = np.zeros((B, M, A), pd_bboxes.dtype)
    full_overlaps = np.clip(
        bbox_iou_ciou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :]), 0, None
    )
    overlaps[mask_valid] = full_overlaps[mask_valid]
    align_metric = bbox_scores**alpha * overlaps**beta

    mask_topk = select_topk_candidates(align_metric, mask_gt, topk)
    mask_pos = mask_topk * mask_in_gts * mask_gt[:, :, None]

    # --- select_highest_overlaps + get_targets ---
    target_gt_idx, fg_mask, mask_pos = select_highest_overlaps(mask_pos, overlaps, M)

    flat_idx = target_gt_idx + np.arange(B)[:, None] * M
    target_labels = gt_labels.reshape(-1)[flat_idx].astype(np.int64)
    target_bboxes = gt_bboxes.reshape(-1, 4)[flat_idx]
    target_labels = np.clip(target_labels, 0, None)
    target_scores = np.zeros((B, A, num_classes), pd_scores.dtype)
    np.put_along_axis(
        target_scores, np.clip(target_labels, 0, num_classes - 1)[..., None], 1.0, axis=2
    )
    target_scores = np.where(fg_mask[..., None] > 0, target_scores, 0.0)

    # --- normalize ---
    align_metric = align_metric * mask_pos
    pos_align_metrics = align_metric.max(axis=-1, keepdims=True)  # [B,M,1]
    pos_overlaps = (overlaps * mask_pos).max(axis=-1, keepdims=True)
    norm_align_metric = (
        (align_metric * pos_overlaps / (pos_align_metrics + eps)).max(axis=-2)[..., None]
    )  # [B,A,1]
    target_scores = target_scores * norm_align_metric

    return target_labels, target_bboxes, target_scores, fg_mask > 0, target_gt_idx


# ---------------------------------------------------------------------------
# ultralytics/utils/loss.py::DFLoss / BboxLoss
# ---------------------------------------------------------------------------


def df_loss(pred_dist, target, reg_max=16):
    """pred_dist [..., 4, reg_max] logits, target [..., 4] -> [...] mean
    two-bin CE over the 4 sides (upstream mean(-1, keepdim))."""
    target = np.clip(target, 0, reg_max - 1 - 0.01)
    tl = np.floor(target).astype(np.int64)
    tr = tl + 1
    wl = tr - target
    wr = 1 - wl
    x = pred_dist - pred_dist.max(axis=-1, keepdims=True)
    logp = x - np.log(np.exp(x).sum(axis=-1, keepdims=True))
    ce_l = -np.take_along_axis(logp, tl[..., None], axis=-1)[..., 0]
    ce_r = -np.take_along_axis(logp, tr[..., None], axis=-1)[..., 0]
    return (ce_l * wl + ce_r * wr).mean(axis=-1)


def bbox2dist(anchor_points, bbox, reg_max_minus1):
    lt = anchor_points - bbox[..., :2]
    rb = bbox[..., 2:] - anchor_points
    return np.clip(np.concatenate([lt, rb], axis=-1), 0, reg_max_minus1 - 0.01)


def bbox_loss(
    pred_dist,  # [B,A,4*reg_max] logits
    pred_bboxes,  # [B,A,4] xyxy grid units
    anchor_points,  # [A,2] grid units
    target_bboxes,  # [B,A,4] xyxy grid units (already / stride)
    target_scores,  # [B,A,nc]
    target_scores_sum,
    fg_mask,  # [B,A] bool
    reg_max=16,
):
    """BboxLoss.forward -> (loss_iou, loss_dfl)."""
    weight = target_scores.sum(-1)[fg_mask][:, None]  # [nfg,1]
    iou = bbox_iou_ciou(pred_bboxes[fg_mask], target_bboxes[fg_mask])[:, None]
    loss_iou = ((1.0 - iou) * weight).sum() / target_scores_sum

    target_ltrb = bbox2dist(anchor_points[None], target_bboxes, reg_max - 1)
    B, A = fg_mask.shape
    pd = pred_dist.reshape(B, A, 4, reg_max)[fg_mask]  # [nfg,4,reg_max]
    dfl = df_loss(pd, target_ltrb[fg_mask], reg_max)[:, None] * weight
    loss_dfl = dfl.sum() / target_scores_sum
    return loss_iou, loss_dfl


# ---------------------------------------------------------------------------
# ultralytics/utils/loss.py::v8SegmentationLoss (overlap=True) + crop_mask
# ---------------------------------------------------------------------------


def _bce_logits(logits, labels):
    return np.maximum(logits, 0) - logits * labels + np.log1p(np.exp(-np.abs(logits)))


def crop_mask(masks, boxes):
    """masks [n,h,w], boxes [n,4] xyxy (mask-res px) — zero outside box."""
    _, h, w = masks.shape
    r = np.arange(w, dtype=masks.dtype)[None, None, :]
    c = np.arange(h, dtype=masks.dtype)[None, :, None]
    x1, y1, x2, y2 = (boxes[:, i][:, None, None] for i in range(4))
    return masks * ((r >= x1) * (r < x2) * (c >= y1) * (c < y2))


def single_mask_loss(gt_mask, pred, proto, xyxy, area):
    """gt_mask [n,mh,mw], pred [n,nm], proto [nm,mh,mw], xyxy [n,4] mask
    px, area [n] normalized -> scalar."""
    pred_mask = np.einsum("in,nhw->ihw", pred, proto)
    loss = _bce_logits(pred_mask, gt_mask)
    return (crop_mask(loss, xyxy).mean(axis=(1, 2)) / area).sum()


def calculate_segmentation_loss(
    fg_mask,  # [B,A] bool
    masks,  # [B,mh,mw] instance-ID map (overlap=True), float
    target_gt_idx,  # [B,A]
    target_bboxes,  # [B,A,4] xyxy input px
    proto,  # [B,nm,mh,mw]
    pred_masks,  # [B,A,nm]
    imgsz,  # (h, w) input px
    overlap=True,
):
    _, _, mask_h, mask_w = proto.shape
    loss = 0.0
    tb_norm = target_bboxes / np.array(
        [imgsz[1], imgsz[0], imgsz[1], imgsz[0]], target_bboxes.dtype
    )
    marea = (tb_norm[..., 2] - tb_norm[..., 0]) * (tb_norm[..., 3] - tb_norm[..., 1])
    mxyxy = tb_norm * np.array([mask_w, mask_h, mask_w, mask_h], tb_norm.dtype)
    for i in range(fg_mask.shape[0]):
        if fg_mask[i].any():
            mask_idx = target_gt_idx[i][fg_mask[i]]
            assert overlap, "transcription covers overlap=True (reference default)"
            gt_mask = (masks[i] == (mask_idx + 1)[:, None, None]).astype(masks.dtype)
            loss += single_mask_loss(
                gt_mask,
                pred_masks[i][fg_mask[i]],
                proto[i],
                mxyxy[i][fg_mask[i]],
                marea[i][fg_mask[i]],
            )
    return loss / fg_mask.sum()


# ---------------------------------------------------------------------------
# full criterion: v8SegmentationLoss.__call__ on flattened level outputs
# ---------------------------------------------------------------------------


def dfl_decode(box_dist, reg_max=16):
    """softmax-expectation ltrb (bbox_decode's use_dfl branch)."""
    shape = box_dist.shape[:-1]
    d = box_dist.reshape(*shape, 4, reg_max)
    x = d - d.max(axis=-1, keepdims=True)
    p = np.exp(x) / np.exp(x).sum(axis=-1, keepdims=True)
    return (p * np.arange(reg_max, dtype=d.dtype)).sum(axis=-1)


def v8_segmentation_loss(
    box_d,  # [B,A,4*reg_max] DFL logits (flattened levels, stride order)
    cls_l,  # [B,A,nc] class logits
    mcoef,  # [B,A,nm] mask coefficients
    proto,  # [B,nm,mh,mw]
    anchors,  # [A,2] grid units
    strides,  # [A,1]
    gt_labels,  # [B,M]
    gt_bboxes,  # [B,M,4] xyxy input px
    gt_valid,  # [B,M] bool (upstream: box coords sum > 0)
    instmap,  # [B,mh,mw] instance IDs at proto res
    imgsz=640,
    reg_max=16,
    nc=1,
    hyp_box=7.5,
    hyp_cls=0.5,
    hyp_dfl=1.5,
):
    """Returns (total, components dict). Components are the gain-scaled
    detached items Ultralytics logs to results.csv; total is
    ``loss.sum() * batch_size`` (what .backward() sees)."""
    B, A, _ = box_d.shape
    pred_scores = 1.0 / (1.0 + np.exp(-cls_l))
    ltrb = dfl_decode(box_d, reg_max)
    pred_bboxes = np.concatenate(
        [anchors[None] - ltrb[..., :2], anchors[None] + ltrb[..., 2:]], axis=-1
    )  # grid units

    _, target_bboxes, target_scores, fg_mask, target_gt_idx = tal_forward(
        pred_scores,
        pred_bboxes * strides[None],
        anchors * strides,
        gt_labels,
        gt_bboxes,
        gt_valid,
        topk=10,
        num_classes=nc,
    )
    target_scores_sum = max(target_scores.sum(), 1)

    loss_cls = _bce_logits(cls_l, target_scores).sum() / target_scores_sum

    loss_iou, loss_dfl = (0.0, 0.0)
    loss_seg = 0.0
    if fg_mask.sum():
        loss_iou, loss_dfl = bbox_loss(
            box_d,
            pred_bboxes,
            anchors,
            target_bboxes / strides[None],
            target_scores,
            target_scores_sum,
            fg_mask,
            reg_max,
        )
        loss_seg = calculate_segmentation_loss(
            fg_mask,
            instmap.astype(box_d.dtype),
            target_gt_idx,
            target_bboxes,
            proto,
            mcoef,
            (imgsz, imgsz),
        )

    comp = {
        "box": loss_iou * hyp_box,
        "seg": loss_seg * hyp_box,  # seg gain IS hyp.box, no batch division
        "cls": loss_cls * hyp_cls,
        "dfl": loss_dfl * hyp_dfl,
    }
    total = sum(comp.values()) * B
    return total, comp


# --- augmentation geometry (Mosaic + RandomPerspective) -----------------
# Transcribed from ultralytics/data/augment.py: Mosaic._mosaic4 (integer
# center, quadrant-cropped pastes onto a 2S canvas filled 114) and
# RandomPerspective.__call__ specialized to the reference's
# degrees=shear=perspective=0 (M = T @ S @ C), cv2.warpAffine semantics
# (bilinear, BORDER_CONSTANT 114; integer-grid convention), followed by
# box clipping and box_candidates (wh 2, ar 100, area_thr 0.01 — the
# segments branch). Dense-instance equivalent of the label bookkeeping:
# tile k's instance IDs offset by k*max_inst (overlap_mask=True).


def mosaic4_paste_np(images, instmaps, boxes, valid, yc, xc, imgsz, max_inst):
    """images [4,H,W] f32, instmaps [4,H,W] uint8, boxes [4,I,4] xyxy in
    source pixels, valid [4,I]; integer mosaic center (yc, xc).
    Returns canvas [2S,2S], icanvas [2S,2S], boxes2 [4I,4], valid2 [4I]."""
    S = imgsz
    H, W = images.shape[1], images.shape[2]
    canvas = np.full((2 * S, 2 * S), 114.0, np.float32)
    icanvas = np.zeros((2 * S, 2 * S), np.int64)
    out_boxes, out_valid = [], []
    for k in range(4):
        if k == 0:  # top left
            x1a, y1a, x2a, y2a = max(xc - W, 0), max(yc - H, 0), xc, yc
            x1b, y1b, x2b, y2b = W - (x2a - x1a), H - (y2a - y1a), W, H
        elif k == 1:  # top right
            x1a, y1a, x2a, y2a = xc, max(yc - H, 0), min(xc + W, 2 * S), yc
            x1b, y1b, x2b, y2b = 0, H - (y2a - y1a), min(W, x2a - x1a), H
        elif k == 2:  # bottom left
            x1a, y1a, x2a, y2a = max(xc - W, 0), yc, xc, min(2 * S, yc + H)
            x1b, y1b, x2b, y2b = W - (x2a - x1a), 0, W, min(y2a - y1a, H)
        else:  # bottom right
            x1a, y1a, x2a, y2a = xc, yc, min(xc + W, 2 * S), min(2 * S, yc + H)
            x1b, y1b, x2b, y2b = 0, 0, min(W, x2a - x1a), min(y2a - y1a, H)
        canvas[y1a:y2a, x1a:x2a] = images[k, y1b:y2b, x1b:x2b]
        im = instmaps[k, y1b:y2b, x1b:x2b].astype(np.int64)
        icanvas[y1a:y2a, x1a:x2a] = np.where(im > 0, im + k * max_inst, 0)
        padw, padh = x1a - x1b, y1a - y1b
        b = boxes[k].astype(np.float64).copy()
        # upstream Mosaic._cat_labels: instances.clip(2S) — labels are
        # clipped to the canvas before RandomPerspective
        b[:, [0, 2]] = np.clip(b[:, [0, 2]] + padw, 0, 2 * S)
        b[:, [1, 3]] = np.clip(b[:, [1, 3]] + padh, 0, 2 * S)
        out_boxes.append(b)
        out_valid.append(valid[k])
    return canvas, icanvas, np.concatenate(out_boxes), np.concatenate(out_valid)


def _bilinear_np(canvas, ys, xs, fill):
    """cv2-style bilinear sampling at outer grid ys x xs with constant
    border `fill` (each of the 4 neighbors contributes `fill` when it
    falls outside the canvas)."""
    Hc, Wc = canvas.shape
    out = np.empty((len(ys), len(xs)), np.float64)
    for a, y in enumerate(ys):
        y0 = int(np.floor(y))
        wy = y - y0
        for b, x in enumerate(xs):
            x0 = int(np.floor(x))
            wx = x - x0
            acc = 0.0
            for dy, wyy in ((0, 1 - wy), (1, wy)):
                for dx, wxx in ((0, 1 - wx), (1, wx)):
                    yy, xx = y0 + dy, x0 + dx
                    v = (
                        canvas[yy, xx]
                        if 0 <= yy < Hc and 0 <= xx < Wc
                        else fill
                    )
                    acc += wyy * wxx * v
            out[a, b] = acc
    return out


def random_affine_np(canvas, icanvas, boxes2, valid2, s, tx, ty, imgsz):
    """RandomPerspective with only scale+translate active. Inverse map of
    M = T @ S @ C: out pixel p -> (p - t)/s + C/2 on the canvas."""
    S = imgsz
    Cc = canvas.shape[0]
    ys = (np.arange(S) - ty) / s + Cc / 2.0
    xs = (np.arange(S) - tx) / s + Cc / 2.0
    img = _bilinear_np(canvas, ys, xs, 114.0)
    # nearest for the instance map, 0 outside the canvas
    yi = np.round(ys).astype(np.int64)
    xi = np.round(xs).astype(np.int64)
    yv = (yi >= 0) & (yi < Cc)
    xv = (xi >= 0) & (xi < Cc)
    inst = np.zeros((S, S), np.int64)
    inst[np.ix_(yv, xv)] = icanvas[np.ix_(yi[yv], xi[xv])]
    # boxes: corners through the forward map, clip, box_candidates
    b = boxes2.astype(np.float64)
    nb = np.empty_like(b)
    nb[:, [0, 2]] = (b[:, [0, 2]] - Cc / 2.0) * s + tx
    nb[:, [1, 3]] = (b[:, [1, 3]] - Cc / 2.0) * s + ty
    nb[:, [0, 2]] = np.clip(nb[:, [0, 2]], 0, S)
    nb[:, [1, 3]] = np.clip(nb[:, [1, 3]], 0, S)
    # box_candidates receives box1 in pre-affine canvas units (no s
    # scaling) — the area ratio absorbs s^2, exactly as upstream calls it
    eps = 1e-16
    w1 = b[:, 2] - b[:, 0]
    h1 = b[:, 3] - b[:, 1]
    w2 = nb[:, 2] - nb[:, 0]
    h2 = nb[:, 3] - nb[:, 1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    ok = (
        valid2
        & (w2 > 2)
        & (h2 > 2)
        & (ar < 100)
        & (w2 * h2 / (w1 * h1 + eps) > 0.01)
    )
    return img, inst, nb, ok


def mosaic_affine_reference(images, instmaps, boxes, valid, yc, xc, s, tx,
                            ty, flip, gain, imgsz, max_inst, fliplr=0.5):
    """The full upstream augmentation chain for one mosaic sample
    (integer center), ending with fliplr and the grayscale reduction of
    the HSV value jitter."""
    canvas, icanvas, b2, v2 = mosaic4_paste_np(
        images, instmaps, boxes, valid, yc, xc, imgsz, max_inst
    )
    img, inst, nb, ok = random_affine_np(canvas, icanvas, b2, v2, s, tx, ty, imgsz)
    S = imgsz
    if flip < fliplr:
        img = img[:, ::-1]
        inst = inst[:, ::-1]
        nb = np.stack([S - nb[:, 2], nb[:, 1], S - nb[:, 0], nb[:, 3]], -1)
    img = np.clip(img * gain, 0, 255)
    return img, inst, nb, ok
