import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mslesseg.train import assigner
from tpu_mslesseg.train.losses import LossConfig, df_loss, optax_sigmoid_bce, segmentation_loss


def test_ciou_identity():
    b = jnp.asarray([[10.0, 10, 50, 50]])
    ciou = assigner.bbox_iou_ciou(b, b)
    np.testing.assert_allclose(np.asarray(ciou), [1.0], atol=1e-5)


def test_ciou_disjoint_negative():
    b1 = jnp.asarray([[0.0, 0, 10, 10]])
    b2 = jnp.asarray([[100.0, 100, 110, 110]])
    ciou = float(assigner.bbox_iou_ciou(b1, b2)[0])
    assert ciou < 0  # center-distance penalty drives it negative


def test_assigner_single_gt():
    """One GT box, predictions perfectly on it -> anchors inside are fg."""
    A = 100
    xs = (jnp.arange(10, dtype=jnp.float32) + 0.5) * 64
    anc = jnp.stack(jnp.meshgrid(xs, xs, indexing="xy"), -1).reshape(-1, 2)
    gt = jnp.asarray([[[100.0, 100, 300, 300]]])  # [1,1,4]
    # predictions: every anchor predicts the GT box with high score
    pd_boxes = jnp.broadcast_to(gt[:, 0:1, :], (1, A, 4))
    pd_scores = jnp.full((1, A, 1), 0.9)
    out = assigner.assign(
        pd_scores, pd_boxes, anc, jnp.zeros((1, 1), jnp.int32), gt,
        jnp.ones((1, 1), bool),
    )
    fg = np.asarray(out["fg_mask"][0])
    inside = np.asarray(
        (anc[:, 0] > 100) & (anc[:, 0] < 300) & (anc[:, 1] > 100) & (anc[:, 1] < 300)
    )
    assert fg.sum() > 0
    assert not np.any(fg & ~inside)  # fg only inside the GT
    # all fg anchors must point at gt 0 with positive scores
    ts = np.asarray(out["target_scores"][0])
    assert (ts[fg] > 0).all()
    assert np.allclose(np.asarray(out["target_bboxes"][0])[fg], [100, 100, 300, 300])


def test_assigner_invalid_gt_ignored():
    A = 16
    anc = jnp.stack(
        jnp.meshgrid(jnp.arange(4.0) * 10 + 5, jnp.arange(4.0) * 10 + 5), -1
    ).reshape(-1, 2)
    gt = jnp.asarray([[[0.0, 0, 40, 40]]])
    pd_boxes = jnp.broadcast_to(gt[:, 0:1, :], (1, A, 4))
    pd_scores = jnp.full((1, A, 1), 0.9)
    out = assigner.assign(
        pd_scores, pd_boxes, anc, jnp.zeros((1, 1), jnp.int32), gt,
        jnp.zeros((1, 1), bool),  # invalid
    )
    assert np.asarray(out["fg_mask"]).sum() == 0


def test_df_loss_minimized_at_target():
    reg_max = 16
    t = jnp.asarray([[3.0, 3.0, 3.0, 3.0]])
    peaked = np.full((1, 4, reg_max), -10.0, np.float32)
    peaked[:, :, 3] = 10.0
    l_peaked = float(df_loss(jnp.asarray(peaked), t, reg_max)[0])
    flat = jnp.zeros((1, 4, reg_max))
    l_flat = float(df_loss(flat, t, reg_max)[0])
    assert l_peaked < 0.01 < l_flat


def test_bce_matches_reference():
    logits = jnp.asarray([-2.0, 0.0, 3.0])
    labels = jnp.asarray([0.0, 1.0, 1.0])
    got = np.asarray(optax_sigmoid_bce(logits, labels))
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    expect = -(np.asarray(labels) * np.log(p) + (1 - np.asarray(labels)) * np.log(1 - p))
    np.testing.assert_allclose(got, expect, atol=2e-5)  # f32 vs f64


@pytest.fixture(scope="module")
def tiny_outputs():
    """Fake model outputs for a 160px input (A = 20^2+10^2+5^2 = 525)."""
    rng = jax.random.PRNGKey(0)
    B, nc, nm, reg_max = 2, 1, 32, 16
    outputs = {"box": [], "cls": [], "mcoef": []}
    for s in (8, 16, 32):
        h = 160 // s
        k1, k2, k3, rng = jax.random.split(rng, 4)
        outputs["box"].append(jax.random.normal(k1, (B, h, h, 4 * reg_max)) * 0.1)
        outputs["cls"].append(jax.random.normal(k2, (B, h, h, nc)) - 4.0)
        outputs["mcoef"].append(jax.random.normal(k3, (B, h, h, nm)) * 0.1)
    outputs["proto"] = jax.random.normal(rng, (B, 40, 40, nm)) * 0.1
    return outputs


def test_segmentation_loss_runs_and_grads(tiny_outputs):
    cfg = LossConfig(imgsz=160, max_fg=16)
    gt_boxes = jnp.asarray(
        [[[40.0, 40, 100, 100], [0, 0, 0, 0]], [[10.0, 10, 60, 60], [80, 80, 140, 140]]]
    )
    gt_labels = jnp.zeros((2, 2), jnp.int32)
    gt_valid = jnp.asarray([[True, False], [True, True]])
    inst = np.zeros((2, 40, 40), np.uint8)
    inst[0, 10:25, 10:25] = 1
    inst[1, 3:15, 3:15] = 1
    inst[1, 20:35, 20:35] = 2
    total, parts = segmentation_loss(
        tiny_outputs, gt_boxes, gt_labels, gt_valid, jnp.asarray(inst), cfg
    )
    assert np.isfinite(float(total))
    for key in ("box", "seg", "cls", "dfl"):
        assert np.isfinite(float(parts[key])), key
    assert float(parts["fg_count"]) > 0

    # gradients flow to every output head
    def loss_fn(outs):
        t, _ = segmentation_loss(outs, gt_boxes, gt_labels, gt_valid, jnp.asarray(inst), cfg)
        return t

    grads = jax.grad(loss_fn)(tiny_outputs)
    for name in ("box", "cls", "mcoef"):
        g = np.asarray(grads[name][0])
        assert np.isfinite(g).all()
        assert np.abs(g).sum() > 0, f"no grad to {name}"
    assert np.abs(np.asarray(grads["proto"])).sum() > 0


def test_segmentation_loss_no_gt(tiny_outputs):
    """Image with no lesions: only cls loss active, finite grads."""
    cfg = LossConfig(imgsz=160, max_fg=16)
    gt_boxes = jnp.zeros((2, 2, 4))
    gt_labels = jnp.zeros((2, 2), jnp.int32)
    gt_valid = jnp.zeros((2, 2), bool)
    inst = jnp.zeros((2, 40, 40), jnp.uint8)
    total, parts = segmentation_loss(
        tiny_outputs, gt_boxes, gt_labels, gt_valid, inst, cfg
    )
    assert np.isfinite(float(total))
    assert float(parts["fg_count"]) == 0
    assert float(parts["box"]) == 0 and float(parts["seg"]) == 0


def test_loss_grad_program_has_no_conditionals_or_stray_scatters(tiny_outputs):
    """Regression guard for the TPU perf rewrite: the loss+grad program
    must contain NO conditionals (the old per-chunk lax.cond skip forced
    materialized branch tuples) and at most the single scatter that is
    the mcoef-gather VJP (the counts/targets/DFL selections are
    compare-select reductions)."""
    cfg = LossConfig(imgsz=160, max_fg=16)
    gt_boxes = jnp.asarray(
        [[[40.0, 40, 100, 100], [0, 0, 0, 0]],
         [[10.0, 10, 60, 60], [80, 80, 140, 140]]]
    )
    gt_labels = jnp.zeros((2, 2), jnp.int32)
    gt_valid = jnp.asarray([[True, False], [True, True]])
    inst = jnp.zeros((2, 40, 40), jnp.uint8)

    def loss_fn(outs):
        t, _ = segmentation_loss(outs, gt_boxes, gt_labels, gt_valid, inst, cfg)
        return t

    txt = jax.jit(jax.grad(loss_fn)).lower(tiny_outputs).as_text()
    assert "stablehlo.if" not in txt and "stablehlo.case" not in txt
    n_scatter = txt.count('"stablehlo.scatter"')
    assert n_scatter <= 1, n_scatter  # the mcoef-gather VJP only
