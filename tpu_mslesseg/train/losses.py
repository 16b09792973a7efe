"""YOLO11-seg training losses: CIoU box + DFL + BCE cls + proto-mask BCE.

Functional equivalent of the seg criterion the reference trains with
(loss weights box 7.5 / cls 0.5 / dfl 1.5, reference ``args.yaml:73-103``;
SURVEY §2.2). Everything is fixed-shape masked math:

* TAL assignment in input-pixel space;
* box CIoU + DFL on foreground anchors, weighted by soft target scores,
  normalized by the target-score sum;
* class BCE over all anchors against the assigner's soft scores;
* mask loss: for EVERY foreground anchor (static bound M*topk, processed
  in `max_fg`-sized chunks to bound memory), per-instance BCE between
  (coeffs @ proto) and the instance's GT mask at proto resolution,
  cropped to the target box and normalized by its area.

GT masks arrive as a single labeled instance map per image ([B, mh, mw]
uint8 with instance IDs), matching the overlap_mask=True strategy, so the
per-anchor GT mask is just (labeled == assigned_id + 1).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_mslesseg.infer import decode as dec
from tpu_mslesseg.train import assigner


class LossConfig(NamedTuple):
    box_gain: float = 7.5
    cls_gain: float = 0.5
    dfl_gain: float = 1.5
    reg_max: int = 16
    nc: int = 1
    max_fg: int = 64  # chunk size for the mask loss (memory bound, not a cap)
    imgsz: int = 640


def df_loss(pred_dist, target, reg_max: int = 16):
    """Distribution focal loss: CE against the two integer bins bracketing
    the continuous ltrb target. pred_dist [..., 4, reg_max], target [..., 4]."""
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(jnp.float32) - target
    wr = 1.0 - wl
    # promote (not cast): bf16 -> f32 under AMP, but f64 stays f64 so the
    # differential parity tests compare at full precision
    logp = jax.nn.log_softmax(
        pred_dist.astype(jnp.promote_types(pred_dist.dtype, jnp.float32)), axis=-1
    )
    # bin selection as a one-hot contraction, NOT take_along_axis: XLA's
    # TPU gather for this shape runs scalarized at ~1.5 GB/s (measured
    # 8.5 ms/step at b=8 — the single hottest loss op); the compare+
    # select+reduce over the 16-bin axis is fully vectorized. Numerics
    # are bitwise identical: the sum's other 15 terms are exact zeros.
    bins = jnp.arange(reg_max, dtype=jnp.int32)
    pick = lambda idx: jnp.sum(
        jnp.where(bins == idx[..., None], logp, 0.0), axis=-1
    )
    ce_l = -pick(tl)
    ce_r = -pick(jnp.clip(tr, 0, reg_max - 1))
    return (ce_l * wl + ce_r * wr).mean(axis=-1)  # mean over 4 sides


def bce_logits(logits, targets):
    return optax_sigmoid_bce(logits.astype(jnp.float32), targets.astype(jnp.float32))


def optax_sigmoid_bce(logits, labels):
    """Numerically stable BCE-with-logits."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


@functools.partial(jax.jit, static_argnames=("cfg",))
def segmentation_loss(
    outputs,  # model output dict (box/cls/mcoef lists + proto)
    gt_boxes,  # [B, M, 4] xyxy in input pixels (zero rows for padding)
    gt_labels,  # [B, M] int
    gt_valid,  # [B, M] bool
    gt_instmap,  # [B, mh, mw] uint8 instance-ID map (0 = background)
    cfg: LossConfig = LossConfig(),
):
    """Returns (total_loss, dict of components). Total is already
    gain-weighted and scaled by batch size (Ultralytics convention)."""
    reg_max = cfg.reg_max
    box_d, cls_l, mcoef = dec.flatten_level_outputs(outputs, reg_max)
    B, A, _ = box_d.shape
    proto = outputs["proto"]  # [B, mh, mw, nm]
    mh, mw = proto.shape[1], proto.shape[2]

    anchors, strides = dec.make_anchors(cfg.imgsz, cfg.imgsz)
    ltrb = dec.dfl_expectation(box_d, reg_max)  # grid units
    pd_boxes_grid = dec.dist2bbox(ltrb, anchors[None])
    pd_boxes_px = pd_boxes_grid * strides[None]
    pd_scores = jax.nn.sigmoid(cls_l.astype(jnp.float32))

    tgt = assigner.assign(
        jax.lax.stop_gradient(pd_scores),
        jax.lax.stop_gradient(pd_boxes_px),
        anchors * strides,
        gt_labels,
        gt_boxes,
        gt_valid,
        topk=10,
        num_classes=cfg.nc,
    )
    fg = tgt["fg_mask"]
    t_scores = tgt["target_scores"]
    t_boxes_px = tgt["target_bboxes"]
    t_sum = jnp.maximum(t_scores.sum(), 1.0)

    # --- cls BCE over all anchors ---
    loss_cls = bce_logits(cls_l, t_scores).sum() / t_sum

    # --- box CIoU + DFL on fg anchors ---
    weight = t_scores.sum(-1) * fg  # [B, A]
    t_boxes_grid = t_boxes_px / strides[None]
    ciou = assigner.bbox_iou_ciou(pd_boxes_grid, t_boxes_grid)
    loss_box = ((1.0 - ciou) * weight).sum() / t_sum

    t_ltrb = jnp.concatenate(
        [anchors[None] - t_boxes_grid[..., :2], t_boxes_grid[..., 2:] - anchors[None]],
        axis=-1,
    )
    t_ltrb = jnp.clip(t_ltrb, 0, reg_max - 1 - 0.01)
    dfl = df_loss(box_d.reshape(B, A, 4, reg_max), t_ltrb, reg_max)
    loss_dfl = (dfl * weight).sum() / t_sum

    # --- mask loss over ALL fg anchors, chunked ---
    # TAL assigns at most topk(=10) anchors per GT, so M*10 is a static
    # exhaustive bound on the fg count; ranking by fg_score puts every true
    # fg anchor ahead of the padding, making the top_k selection exact
    # (the old fixed max_fg=64 budget silently dropped anchors on crowded
    # mosaics — VERDICT r1 weak #6). Chunking by cfg.max_fg bounds the
    # [B, k, mh, mw] mask materialization; all-padding chunks contribute
    # an exact 0.0 through the validity mask (see chunk_seg_loss).
    M = gt_valid.shape[1]
    k = min(M * 10, A)  # exhaustive fg bound, never beyond the anchor count
    chunk = min(cfg.max_fg, k)
    n_chunks = -(-k // chunk)
    fg_score = fg.astype(jnp.float32) * (1.0 + t_scores.sum(-1))
    _, fg_idx = jax.lax.top_k(fg_score, k)  # [B, k]
    sel_valid = jnp.take_along_axis(fg, fg_idx, axis=1)  # [B, k]
    sel_coef = jnp.take_along_axis(mcoef, fg_idx[..., None], axis=1)  # [B,k,nm]
    sel_gt = jnp.take_along_axis(tgt["target_gt_idx"], fg_idx, axis=1)  # [B,k]
    sel_box_px = jnp.take_along_axis(t_boxes_px, fg_idx[..., None], axis=1)

    pad = n_chunks * chunk - k  # round the gathered axis up to the chunk grid
    if pad:
        pad2 = lambda x: jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))
        sel_valid = pad2(sel_valid)  # padded slots are invalid -> zero loss
        sel_coef = pad2(sel_coef)
        sel_gt = pad2(sel_gt)
        sel_box_px = pad2(sel_box_px)

    scale = mw / cfg.imgsz
    rows = jnp.arange(mh, dtype=jnp.float32)[None, None, :, None]
    cols = jnp.arange(mw, dtype=jnp.float32)[None, None, None, :]
    proto_f32 = proto.astype(jnp.float32)

    def chunk_seg_loss(args):
        # Straight-line masked math, NO lax.cond runtime skip: the cond
        # forced XLA to materialize every [B, chunk, mh, mw] f32 branch
        # operand/result as conditional tuples plus scalar-constant
        # broadcast buffers (~25 ms/step at b=32 in the trace); unguarded,
        # the einsum->BCE->reduce chain fuses and an all-padding chunk
        # still contributes an exact 0.0 through the valid_c mask (same
        # values bit-for-bit). Also removes the branch varying-ness
        # hazard inside the fold-parallel shard_map program.
        coef_c, gt_c, box_c, valid_c = args  # [B, chunk, ...]
        # predicted mask logits at proto res. NOTE on precision: the f32
        # casts pin the ELEMENTWISE math (BCE runs in f32, like torch
        # autocast's always-f32 binary_cross_entropy_with_logits), but
        # the einsum itself runs at JAX's default matmul precision —
        # reduced (bf16 passes) on TPU, exact f32 on the CPU parity
        # tests. That split is torch-AMP parity too: autocast runs
        # matmuls in half precision.
        pred = jnp.einsum("bkc,bhwc->bkhw", coef_c.astype(jnp.float32),
                          proto_f32)
        ids = (gt_c + 1).astype(jnp.int32)
        gt_masks = (
            gt_instmap[:, None, :, :].astype(jnp.int32)
            == ids[:, :, None, None]
        ).astype(jnp.float32)
        bx = box_c * scale  # crop region: target box at proto res
        in_box = (
            (cols >= bx[..., 0][..., None, None])
            & (cols < bx[..., 2][..., None, None])
            & (rows >= bx[..., 1][..., None, None])
            & (rows < bx[..., 3][..., None, None])
        ).astype(jnp.float32)
        bce = optax_sigmoid_bce(pred, gt_masks) * in_box
        # cropped-BCE mean over the map / box area *fraction*
        # == cropped-BCE sum / box area in proto pixels. NO area
        # clamping (upstream divides by the exact normalized area —
        # sub-proto-pixel lesions are up-weighted accordingly); padded
        # slots get a dummy area of 1 so the masked division is finite
        area = (bx[..., 2] - bx[..., 0]) * (bx[..., 3] - bx[..., 1])
        area = jnp.where(valid_c > 0, area, 1.0)
        return (bce.sum(axis=(2, 3)) / area * valid_c).sum()

    resh = lambda x: jnp.moveaxis(
        x.reshape(x.shape[0], n_chunks, chunk, *x.shape[2:]), 1, 0
    )
    # checkpoint the chunk body: without it every chunk's [B, chunk,
    # mh, mw] f32 residuals (pred/gt/in_box) are stored for the backward
    # — ~260 MB of stacked buffers whose dynamic-update-slice traffic
    # dominated the train-step trace AND the activation footprint that
    # capped auto-batch at 8 (measured peak at b=32: 17.4 -> 4.6 GiB).
    # Recomputing the einsum+BCE in the backward costs ~0.8 GFLOP/chunk
    # — noise next to the saved bandwidth; values are bit-identical
    # (same HLO re-executed on the same inputs). The chunk loop is
    # UNROLLED (n_chunks is small and static): a lax.map would thread
    # the [B, mh, mw, nm] dproto accumulator through a sequential while
    # carry at HBM cost per chunk, while the unrolled adds fuse.
    ck = jax.checkpoint(chunk_seg_loss)
    parts_c = [resh(x) for x in (sel_coef, sel_gt, sel_box_px, sel_valid)]
    chunk_sums = [ck(tuple(p[i] for p in parts_c)) for i in range(n_chunks)]
    n_fg = jnp.maximum(fg.sum(), 1.0)
    loss_seg = sum(chunk_sums) / n_fg

    # components are the GAIN-SCALED detached items (what Ultralytics logs
    # to results.csv: train/box_loss is box*hyp.box, seg gain is hyp.box
    # with NO batch division — confirmed against the reference's logged
    # magnitudes); total is loss.sum() * batch_size, the backprop value
    parts = {
        "box": cfg.box_gain * loss_box,
        "seg": cfg.box_gain * loss_seg,
        "cls": cfg.cls_gain * loss_cls,
        "dfl": cfg.dfl_gain * loss_dfl,
    }
    total = (parts["box"] + parts["seg"] + parts["cls"] + parts["dfl"]) * B
    return total, {**parts, "fg_count": fg.sum()}
