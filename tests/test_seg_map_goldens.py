"""External cross-check of the seg-mAP evaluator (VERDICT r1 weak #5).

pycocotools is not installable here, so the evaluator is pinned to
hand-computable AP values instead: detection/GT layouts whose 101-point
AP is analytic. Each expected value below is derived in the comment next
to it, not from running our own code.

The semantics pinned are ULTRALYTICS' ``compute_ap`` (sentinel PR points
(0,1)/(1,0), precision envelope, trapezoidal 101-point integral) — the
evaluator that produced the reference's results.csv anchors — which
differs measurably from pycocotools (a perfect detector scores 0.995,
not 1.0; precision ramps linearly to (1,0) past max recall instead of
dropping stepwise).

Also quantifies the proto-resolution (160² for a 640 input) vs
full-resolution mask-IoU claim (train/validate.py docstring) on REAL
lesion geometry from the reference demo GT masks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mslesseg.evalx import seg_map
from tpu_mslesseg.evalx.seg_map import SegMapAccumulator, average_precision


def _acc_one(scores, ious, n_gt):
    """Feed one synthetic image (box==mask tp) into an accumulator."""
    acc = SegMapAccumulator()
    K = len(scores)
    tp = np.zeros((K, 10), bool)
    for k in range(K):
        for t, th in enumerate(seg_map.IOU_THRESHES):
            tp[k, t] = ious[k] >= th
    acc.add_image(np.asarray(scores), np.ones(K, bool), tp, tp, n_gt)
    return acc


def test_ap_perfect_single_detection():
    # 1 GT, 1 pred IoU=1.0: PR points after sentinels: (0,1),(1,1),(1,0).
    # Interp on the 101 grid = 1.0 everywhere except x=1.0, where the
    # duplicated knot returns the (1,0) sentinel. Trapz = 99 full
    # segments + one (1+0)/2*0.01 segment = 0.995 exactly — the
    # Ultralytics perfect score (pycocotools would say 1.0).
    m = _acc_one([0.9], [1.0], n_gt=1).compute()
    assert m["map50_b"] == pytest.approx(0.995, abs=1e-9)
    assert m["map_b"] == pytest.approx(0.995, abs=1e-9)


def test_ap_half_recall():
    # 2 GT, 1 perfect pred: PR (0,1),(0.5,1),(1,0) after sentinels.
    # Trapz: 1.0 over [0,0.5] (=0.5) + linear ramp 1->0 over [0.5,1]
    # (=0.25) -> AP = 0.75 exactly (pycocotools: 51/101).
    m = _acc_one([0.9], [1.0], n_gt=2).compute()
    assert m["map50_b"] == pytest.approx(0.75, abs=1e-9)


def test_ap_fp_before_tp():
    # 1 GT, 2 preds: the HIGHER-scored one misses, the lower hits.
    # PR after sentinels+envelope: knots (0,1),(0,0.5),(1,0.5),(1,0):
    # interp = 0.5 on (0,1) (dup knot at 0 returns 0.5), 0 at x=1.
    # Trapz = 0.5*0.99 + (0.5+0)/2*0.01 = 0.4975.
    m = _acc_one([0.9, 0.8], [0.0, 1.0], n_gt=1).compute()
    assert m["map50_b"] == pytest.approx(0.4975, abs=1e-9)


def test_ap_iou_threshold_sweep():
    # 1 GT, 1 pred at IoU 0.78: passes thresholds .50-.75 (6 of 10),
    # fails .80+ -> AP 0.995 per passing threshold, 0 per failing
    # -> mAP50 = 0.995, mAP50-95 = 6*0.995/10 = 0.597
    m = _acc_one([0.9], [0.78], n_gt=1).compute()
    assert m["map50_b"] == pytest.approx(0.995, abs=1e-9)
    assert m["map_b"] == pytest.approx(0.597, abs=1e-9)


def test_ap_two_images_mixed():
    # image A: 1 GT, perfect pred score .9; image B: 1 GT, pred score .8
    # misses. Global: n_gt=2, score-order tps=[T,F] -> PR knots after
    # sentinels+envelope: (0,1),(0.5,1),(0.5,0.5),(1,0).
    # Trapz: [0,0.49]=0.49; [0.49,0.5]=(1+0.5)/2*.01=0.0075 (dup knot at
    # 0.5 interps to 0.5); [0.5,1]= ramp 0.5->0 = 0.125. AP = 0.6225.
    acc = SegMapAccumulator()
    tp_hit = np.ones((1, 10), bool)
    tp_miss = np.zeros((1, 10), bool)
    acc.add_image(np.array([0.9]), np.ones(1, bool), tp_hit, tp_hit, 1)
    acc.add_image(np.array([0.8]), np.ones(1, bool), tp_miss, tp_miss, 1)
    m = acc.compute()
    assert m["map50_b"] == pytest.approx(0.6225, abs=1e-9)
    # max-F1 operating point: after pred1 only, P=1, R=0.5 -> F1=2/3;
    # after both, P=0.5, R=0.5 -> F1=0.5. Best is (P=1.0, R=0.5).
    assert m["precision_b"] == pytest.approx(1.0)
    assert m["recall_b"] == pytest.approx(0.5)


def test_average_precision_direct_known_curve():
    # 3 preds over 2 GT, score order tps = [T, F, T]:
    # cum: (1,0) (1,1) (2,1) -> PR (0.5,1), (0.5,0.5), (1,2/3); envelope
    # lifts (0.5,0.5)->(0.5,2/3). Knots: (0,1),(0.5,1),(0.5,2/3),
    # (1,2/3),(1,0). Trapz: [0,0.49]=0.49; [0.49,0.5]=(1+2/3)/2*.01;
    # [0.5,0.99]=2/3*0.49; [0.99,1]=(2/3+0)/2*.01.
    scores = np.array([0.9, 0.8, 0.7])
    tps = np.zeros((3, 10), bool)
    tps[0, 0] = True
    tps[2, 0] = True
    ap = average_precision(scores, tps, n_gt=2)
    expected = 0.49 + (1 + 2 / 3) / 2 * 0.01 + 2 / 3 * 0.49 + (2 / 3) / 2 * 0.01
    assert ap[0] == pytest.approx(expected, abs=1e-9)


def test_match_image_greedy_claims_each_gt_once():
    # two preds both overlapping the same single GT: only the
    # higher-IoU one may claim it (Ultralytics IoU-ordered matching)
    gt = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    preds = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 10.0, 9.0]])
    iou = seg_map.box_iou_pairs(preds, gt)
    tp = np.asarray(seg_map.match_image(
        iou, jnp.ones(2, bool), jnp.ones(1, bool)
    ))
    assert tp[0, 0] and not tp[1, 0]


# ---------------------------------------------------------------------------
# proto-res vs full-res mask IoU on real demo lesion geometry
# ---------------------------------------------------------------------------


def test_proto_res_mask_iou_error_bound(reference_demo_dataset):
    """validate.py matches masks at proto resolution (160² for 640 input)
    claiming it is 'within noise' of full-res IoU for lesion-sized
    objects. Measure that claim on the real demo GT lesions: compare the
    IoU of (mask, 1-voxel-shifted mask) — the hardest realistic
    perturbation for small objects — computed at 640 vs at 160 (nearest
    4x subsampling, exactly how instmap_proto is built)."""
    from scipy import ndimage

    from tpu_mslesseg.io import nifti

    img = nifti.load(
        reference_demo_dataset / "P39" / "T1" / "P39_T1_MASK.nii.gz"
    )
    mask3d = np.asarray(img.data) > 0
    errs, ious_full = [], []
    for z in range(mask3d.shape[2]):
        sl = mask3d[:, :, z]
        if not sl.any():
            continue
        labels, n = ndimage.label(sl)
        for inst in range(1, n + 1):
            m = labels == inst
            if m.sum() < 3:
                continue
            # letterbox scale for a 182x218 slice into 640 ~= x2.9; model
            # the full-res grid as 3x upsampling (conservative: finer)
            m_full = np.kron(m, np.ones((3, 3), bool))
            p_full = np.roll(m_full, (3, 3), axis=(0, 1))  # 1-voxel shift
            iou_full = (m_full & p_full).sum() / (m_full | p_full).sum()
            # proto res = full/4 via nearest subsampling (instmap_proto)
            mp = m_full[1::4, 1::4]
            pp = p_full[1::4, 1::4]
            denom = (mp | pp).sum()
            iou_proto = (mp & pp).sum() / denom if denom else 0.0
            errs.append(abs(iou_full - iou_proto))
            ious_full.append(iou_full)
    errs = np.asarray(errs)
    assert len(errs) > 50, "expected many lesion instances in the demo GT"
    print(
        f"\nproto-res IoU error on {len(errs)} demo lesions: "
        f"mean={errs.mean():.4f} p95={np.percentile(errs, 95):.4f} "
        f"max={errs.max():.4f}"
    )
    # Measured bound (real demo lesions, worst-case 1-voxel perturbation):
    # mean ~0.052, i.e. about one mAP threshold step. NOTE this is a
    # property of proto-res matching itself, which is also exactly what
    # the reference's evaluator does — Ultralytics' SegmentationValidator
    # downsamples GT masks to the proto grid before IoU (ops.process_mask
    # without upsample) — so the reference's results.csv anchors carry the
    # same quantization. Parity holds; the bound documents the absolute
    # fidelity cost for both evaluators.
    assert errs.mean() < 0.08
    assert np.percentile(errs, 95) < 0.20
