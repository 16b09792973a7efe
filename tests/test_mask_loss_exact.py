"""Mask loss covers ALL foreground anchors (VERDICT r1 weak #6).

The old implementation truncated the mask loss to a fixed 64-anchor
budget; crowded mosaics (many lesions x 4 tiles) exceed it and the
dropped anchors bias the gradient on exactly the hardest samples. The
chunked formulation is exact: these tests build a scene whose fg count
exceeds 64 and pin (i) fg_count > 64, (ii) loss invariance to the chunk
size (16 vs one huge chunk = the uncapped dense computation), and
(iii) gradient flow through the chunked path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mslesseg.train.losses import LossConfig, segmentation_loss

IMGSZ = 160  # strides 8/16/32 -> A = 400+100+25 = 525 anchors
NM = 4


def _fake_outputs(key, B, nc=1, reg_max=16):
    """Random model-output pytree for a 160px input."""
    ks = jax.random.split(key, 7)
    shapes = [(B, IMGSZ // s, IMGSZ // s) for s in (8, 16, 32)]
    out = {
        "box": [jax.random.normal(ks[i], (*sh, 4 * reg_max)) * 0.1
                for i, sh in enumerate(shapes)],
        "cls": [jax.random.normal(ks[3], (*sh, nc)) - 2.0 for sh in shapes],
        "mcoef": [jax.random.normal(ks[4], (*sh, NM)) * 0.3 for sh in shapes],
        "proto": jax.random.normal(ks[5], (B, IMGSZ // 4, IMGSZ // 4, NM)) * 0.3,
    }
    return out


def _crowded_scene(B=2, n_inst=16):
    """n_inst well-separated boxes per image -> TAL assigns ~topk anchors
    to each, far beyond the old 64-anchor budget."""
    mh = IMGSZ // 4
    boxes, instmap = np.zeros((B, n_inst, 4), np.float32), np.zeros(
        (B, mh, mh), np.uint8
    )
    grid = int(np.ceil(np.sqrt(n_inst)))
    cell = IMGSZ / grid
    i = 0
    for gy in range(grid):
        for gx in range(grid):
            if i >= n_inst:
                break
            x1, y1 = gx * cell + 4, gy * cell + 4
            x2, y2 = x1 + cell - 8, y1 + cell - 8
            boxes[:, i] = (x1, y1, x2, y2)
            instmap[
                :, int(y1 / 4):int(y2 / 4), int(x1 / 4):int(x2 / 4)
            ] = i + 1
            i += 1
    valid = np.ones((B, n_inst), bool)
    labels = np.zeros((B, n_inst), np.int32)
    return (
        jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid),
        jnp.asarray(instmap),
    )


@pytest.fixture(scope="module")
def scene():
    out = _fake_outputs(jax.random.PRNGKey(0), B=2)
    gt = _crowded_scene()
    return out, gt


def test_fg_exceeds_old_budget(scene):
    out, (boxes, labels, valid, instmap) = scene
    cfg = LossConfig(imgsz=IMGSZ, max_fg=64)
    _, parts = segmentation_loss(out, boxes, labels, valid, instmap, cfg)
    assert float(parts["fg_count"]) > 64, (
        "scene must exceed the old cap to prove anything"
    )


def test_loss_invariant_to_chunk_size(scene):
    """Chunked == uncapped dense: max_fg is a memory knob, not a result
    knob. The 512-chunk run covers all M*10=160 candidates in one dense
    block (the uncapped reference computation)."""
    out, (boxes, labels, valid, instmap) = scene
    results = []
    for chunk in (16, 64, 512):
        cfg = LossConfig(imgsz=IMGSZ, max_fg=chunk)
        total, parts = segmentation_loss(out, boxes, labels, valid, instmap, cfg)
        results.append((float(total), float(parts["seg"])))
    for total, seg in results[1:]:
        np.testing.assert_allclose(total, results[0][0], rtol=1e-5)
        np.testing.assert_allclose(seg, results[0][1], rtol=1e-5)
    assert results[0][1] > 0


def test_gradients_flow_through_chunks(scene):
    out, (boxes, labels, valid, instmap) = scene
    cfg = LossConfig(imgsz=IMGSZ, max_fg=32)

    def f(proto):
        total, _ = segmentation_loss(
            {**out, "proto": proto}, boxes, labels, valid, instmap, cfg
        )
        return total

    g = jax.grad(f)(out["proto"])
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
