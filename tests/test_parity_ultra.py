"""Differential parity: train/assigner.py + train/losses.py vs literal
NumPy transcriptions of Ultralytics 8.3.x (``tests/ultralytics_np.py``).

This is the harness VERDICT r2 ranked #1: the reference's training
semantics are Ultralytics' (consumed via ``scripts/train.py:358-366``),
and any silent deviation in TAL assignment or the seg criterion lands
directly on the ±0.5% DSC parity budget. Pattern follows the proven
seg-mAP treatment (tests/test_seg_map.py): randomized inputs, many
seeds/shapes, compared component by component.

The TAL cross-check runs in float64 (via the x64 context) so discrete
selections (top-k, argmax resolution) are compared at full precision; the
full-loss cross-check runs the production f32/bf16-free path against a
float64 oracle with f32-accumulation tolerances.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ultralytics_np as unp  # tests/ is on sys.path under pytest
from tpu_mslesseg.infer import decode as dec
from tpu_mslesseg.train import assigner
from tpu_mslesseg.train.losses import LossConfig, segmentation_loss


# ---------------------------------------------------------------------------
# input generators (realistic scale: tiny MS lesions + random early preds)
# ---------------------------------------------------------------------------


def make_anchors_np(imgsz):
    a, s = dec.make_anchors(imgsz, imgsz)
    return np.asarray(a, np.float64), np.asarray(s, np.float64)


def gen_case(rng, B=3, M=8, imgsz=160, nc=1, tiny_frac=0.5, awful_frac=0.4):
    """Random assignment problem. tiny_frac of GTs are lesion-sized (can
    hold fewer than topk anchors); awful_frac of images get near-random
    predicted boxes (CIoU <= 0 for most pairs -> the zero-metric top-k
    quirk activates)."""
    anchors, strides = make_anchors_np(imgsz)
    A = anchors.shape[0]
    anc_px = anchors * strides

    gt_bboxes = np.zeros((B, M, 4))
    gt_valid = np.zeros((B, M), bool)
    gt_labels = np.zeros((B, M), np.int64)
    for b in range(B):
        n = rng.integers(0, M + 1)
        for m in range(n):
            tiny = rng.random() < tiny_frac
            w, h = rng.uniform(2, 14 if tiny else 90, 2)
            cx = rng.uniform(w / 2, imgsz - w / 2)
            cy = rng.uniform(h / 2, imgsz - h / 2)
            gt_bboxes[b, m] = [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2]
            gt_valid[b, m] = True

    # predicted boxes: ltrb distances in grid units, scaled to px
    ltrb = np.abs(rng.normal(2.0, 2.0, (B, A, 4)))
    pd_boxes = np.concatenate(
        [anc_px - ltrb[..., :2] * strides, anc_px + ltrb[..., 2:] * strides], -1
    )
    for b in range(B):
        if rng.random() < awful_frac:
            # near-random boxes far from most GTs
            c = rng.uniform(0, imgsz, (A, 2))
            wh = rng.uniform(1, 30, (A, 2))
            pd_boxes[b] = np.concatenate([c - wh / 2, c + wh / 2], -1)
    pd_scores = 1 / (1 + np.exp(-rng.normal(-2.0, 1.5, (B, A, nc))))
    return pd_scores, pd_boxes, anc_px, gt_labels, gt_bboxes, gt_valid


# ---------------------------------------------------------------------------
# CIoU
# ---------------------------------------------------------------------------


def test_ciou_matches_ultralytics():
    rng = np.random.default_rng(0)
    with jax.enable_x64():
        for _ in range(100):
            a = rng.uniform(0, 600, (64, 4))
            b = rng.uniform(0, 600, (64, 4))
            # make xyxy well-formed; keep a few degenerate (zero-size)
            a = np.concatenate([np.minimum(a[:, :2], a[:, 2:]), np.maximum(a[:, :2], a[:, 2:])], 1)
            b = np.concatenate([np.minimum(b[:, :2], b[:, 2:]), np.maximum(b[:, :2], b[:, 2:])], 1)
            a[:4, 2:] = a[:4, :2]  # degenerate boxes
            ours = np.asarray(assigner.bbox_iou_ciou(jnp.asarray(a), jnp.asarray(b)))
            ref = unp.bbox_iou_ciou(a, b)
            np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)


# ---------------------------------------------------------------------------
# TAL assigner
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(40))
def test_tal_assign_matches_ultralytics(seed):
    rng = np.random.default_rng(seed)
    with jax.enable_x64():
        for _ in range(3):  # 40 seeds x 3 cases = 120 randomized cases
            ps, pb, anc, gl, gb, gv = gen_case(rng)
            out = jax.tree_util.tree_map(
                np.asarray,
                assigner.assign(
                    jnp.asarray(ps), jnp.asarray(pb), jnp.asarray(anc),
                    jnp.asarray(gl), jnp.asarray(gb), jnp.asarray(gv),
                ),
            )
            _, tb, tsc, fg, tgi = unp.tal_forward(ps, pb, anc, gl, gb, gv)

            np.testing.assert_array_equal(out["fg_mask"], fg)
            np.testing.assert_array_equal(
                out["target_gt_idx"][fg], tgi[fg]
            )
            np.testing.assert_allclose(out["target_bboxes"][fg], tb[fg], rtol=1e-12)
            np.testing.assert_allclose(tsc, out["target_scores"], rtol=1e-9, atol=1e-12)


def test_tal_zero_metric_quirk_is_reproduced():
    """A GT with fewer than topk positive-metric anchors pads its top-k
    with zero-metric anchors; in-box ones become fg with zero target
    score. Construct it explicitly and require both implementations to
    agree AND the quirk to actually fire (fg anchors with zero score)."""
    imgsz = 160
    anchors, strides = make_anchors_np(imgsz)
    anc_px = anchors * strides
    A = anchors.shape[0]
    B, M, nc = 1, 2, 1
    # one GT covering the top-left corner (where the zero-metric tie-break
    # lands), predictions nowhere near it -> all its metric is zero
    gt = np.zeros((B, M, 4))
    gt[0, 0] = [0.5, 0.5, 60.0, 60.0]
    gv = np.zeros((B, M), bool)
    gv[0, 0] = True
    gl = np.zeros((B, M), np.int64)
    pd_boxes = np.tile(np.array([150.0, 150.0, 158.0, 158.0]), (B, A, 1))
    ps = np.full((B, A, nc), 0.5)
    with jax.enable_x64():
        out = jax.tree_util.tree_map(
            np.asarray,
            assigner.assign(
                jnp.asarray(ps), jnp.asarray(pd_boxes), jnp.asarray(anc_px),
                jnp.asarray(gl), jnp.asarray(gt), jnp.asarray(gv),
            ),
        )
    _, _, tsc, fg, _ = unp.tal_forward(ps, pd_boxes, anc_px, gl, gt, gv)
    np.testing.assert_array_equal(out["fg_mask"], fg)
    assert fg.sum() > 0, "quirk case must produce fg anchors"
    assert np.all(tsc[fg] == 0), "quirk fg anchors carry zero target score"
    np.testing.assert_allclose(out["target_scores"], tsc, atol=1e-12)


# ---------------------------------------------------------------------------
# DFL
# ---------------------------------------------------------------------------


def test_df_loss_matches_ultralytics():
    from tpu_mslesseg.train.losses import df_loss as ours_df

    rng = np.random.default_rng(1)
    with jax.enable_x64():
        for _ in range(100):
            pred = rng.normal(0, 3, (32, 4, 16))
            tgt = np.clip(rng.uniform(-1, 17, (32, 4)), 0, 15 - 0.01)
            ours = np.asarray(ours_df(jnp.asarray(pred), jnp.asarray(tgt)))
            ref = unp.df_loss(pred, tgt)
            np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-12)


# ---------------------------------------------------------------------------
# full criterion
# ---------------------------------------------------------------------------


def _level_shapes(imgsz):
    return [(imgsz // s, imgsz // s) for s in dec.STRIDES]


def gen_loss_case(rng, B=2, M=6, imgsz=160, nc=1, nm=8, reg_max=16):
    """Random model outputs + GT set, in the layouts both sides consume."""
    mh = mw = imgsz // 4
    levels = _level_shapes(imgsz)
    out = {
        "box": [rng.normal(0, 2, (B, h, w, 4 * reg_max)).astype(np.float32) for h, w in levels],
        "cls": [rng.normal(-3, 1.5, (B, h, w, nc)).astype(np.float32) for h, w in levels],
        "mcoef": [rng.normal(0, 1, (B, h, w, nm)).astype(np.float32) for h, w in levels],
        "proto": rng.normal(0, 1, (B, mh, mw, nm)).astype(np.float32),
    }
    _, pb, _, gl, gb, gv = gen_case(rng, B=B, M=M, imgsz=imgsz)
    # instance map: rasterize valid GT rectangles at proto res (id m+1)
    instmap = np.zeros((B, mh, mw), np.uint8)
    ys = np.arange(mh)[:, None]
    xs = np.arange(mw)[None, :]
    for b in range(B):
        for m in range(M):
            if gv[b, m]:
                x1, y1, x2, y2 = gb[b, m] * (mw / imgsz)
                sel = (xs >= x1) & (xs < x2) & (ys >= y1) & (ys < y2)
                instmap[b][sel] = m + 1
    return out, gb.astype(np.float32), gl.astype(np.int32), gv, instmap


@pytest.mark.parametrize("seed", range(12))
def test_segmentation_loss_matches_ultralytics(seed):
    rng = np.random.default_rng(100 + seed)
    imgsz, reg_max, nc = 160, 16, 1
    out, gb, gl, gv, instmap = gen_loss_case(rng, imgsz=imgsz)
    cfg = LossConfig(imgsz=imgsz, max_fg=16)  # small chunks: exercise chunking
    total, parts = segmentation_loss(
        jax.tree_util.tree_map(jnp.asarray, out),
        jnp.asarray(gb), jnp.asarray(gl), jnp.asarray(gv), jnp.asarray(instmap),
        cfg,
    )

    flat = lambda xs: np.concatenate(
        [x.reshape(x.shape[0], -1, x.shape[-1]) for x in xs], 1
    ).astype(np.float64)
    anchors, strides = make_anchors_np(imgsz)
    ref_total, ref_parts = unp.v8_segmentation_loss(
        flat(out["box"]), flat(out["cls"]), flat(out["mcoef"]),
        out["proto"].transpose(0, 3, 1, 2).astype(np.float64),
        anchors, strides,
        gl.astype(np.int64), gb.astype(np.float64), gv, instmap,
        imgsz=imgsz, reg_max=reg_max, nc=nc,
    )
    for k in ("box", "seg", "cls", "dfl"):
        np.testing.assert_allclose(
            float(parts[k]), ref_parts[k], rtol=3e-4, atol=1e-6,
            err_msg=f"component {k}",
        )
    np.testing.assert_allclose(float(total), ref_total, rtol=3e-4)


def test_segmentation_loss_chunk_invariance_vs_oracle():
    """max_fg chunking is a memory knob, not semantics: different chunk
    sizes must agree with the oracle identically."""
    rng = np.random.default_rng(7)
    imgsz = 160
    out, gb, gl, gv, instmap = gen_loss_case(rng, imgsz=imgsz)
    args = (
        jax.tree_util.tree_map(jnp.asarray, out),
        jnp.asarray(gb), jnp.asarray(gl), jnp.asarray(gv), jnp.asarray(instmap),
    )
    t8, p8 = segmentation_loss(*args, LossConfig(imgsz=imgsz, max_fg=8))
    t64, p64 = segmentation_loss(*args, LossConfig(imgsz=imgsz, max_fg=64))
    np.testing.assert_allclose(float(p8["seg"]), float(p64["seg"]), rtol=1e-5)
    np.testing.assert_allclose(float(t8), float(t64), rtol=1e-5)
