"""Per-epoch validation: val losses + box/mask mAP on the held-out fold.

The counterpart of the Ultralytics validator that fills the reference's
``results.csv`` metric columns. One jitted program per batch produces
losses, NMS'd detections and per-image Ultralytics-exact match bits; the
host only accumulates AP tables (evalx/seg_map.py).

Mask IoU is computed at proto resolution (160x160 for 640 input) — the
mask logits' native grid. This is evaluator PARITY, not an
approximation: Ultralytics' SegmentationValidator also matches masks at
the proto grid (GT downsampled, ops.process_mask without upsample), so
the reference's results.csv anchors carry the same quantization. The
absolute fidelity cost is measured on real demo lesions in
tests/test_seg_map_goldens.py::test_proto_res_mask_iou_error_bound
(mean IoU error ~0.05 under a worst-case 1-voxel perturbation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_mslesseg.evalx import seg_map
from tpu_mslesseg.infer import decode as dec
from tpu_mslesseg.infer.nms import nms_batch
from tpu_mslesseg.train import augment
from tpu_mslesseg.train.losses import LossConfig, segmentation_loss


def val_aug_config(max_inst: int, imgsz: int = 640) -> augment.AugConfig:
    """Deterministic letterbox 'augmentation' (no mosaic/jitter/flip)."""
    return augment.AugConfig(
        imgsz=imgsz, scale=0.0, translate=0.0, fliplr=0.0, hsv_v=0.0,
        max_inst=max_inst, mosaic=False,
    )


def make_val_step(model, loss_cfg: LossConfig, max_det: int = 300,
                  conf: float = 0.001, iou: float = 0.7):
    """Returns jitted fn(variables, batch) -> (losses, match data).

    conf 0.001: mAP needs the full score sweep, not the deploy threshold.
    """

    @jax.jit
    def step(variables, batch):
        out = model.apply(variables, batch["images"], train=False)
        labels = jnp.zeros(batch["valid"].shape, jnp.int32)
        _, parts = segmentation_loss(
            out, batch["boxes"], labels, batch["valid"],
            batch["instmap_proto"], loss_cfg,
        )

        reg_max = model.cfg.reg_max
        box_d, cls_l, mcoef = dec.flatten_level_outputs(out, reg_max)
        S = batch["images"].shape[1]
        anchors, strides = dec.make_anchors(S, S)
        boxes = dec.decode_boxes(box_d, anchors, strides, reg_max)
        scores = jax.nn.sigmoid(cls_l.astype(jnp.float32))[..., 0]
        nb, ns, keep, idx = nms_batch(boxes, scores, conf, iou, max_det)
        kept_coef = jnp.take_along_axis(mcoef, idx[..., None], axis=1)

        proto = out["proto"]
        mh, mw = proto.shape[1], proto.shape[2]

        def per_image(proto_i, coef_i, boxes_i, keep_i, instmap_i, valid_i, gtb_i):
            # predicted masks at proto res, cropped to boxes
            logits = jnp.einsum("kc,hwc->khw", coef_i.astype(jnp.float32),
                                proto_i.astype(jnp.float32))
            bx = boxes_i * (mw / S)
            rows = jnp.arange(mh, dtype=jnp.float32)[None, :, None]
            cols = jnp.arange(mw, dtype=jnp.float32)[None, None, :]
            in_box = (
                (cols >= bx[:, 0][:, None, None]) & (cols < bx[:, 2][:, None, None])
                & (rows >= bx[:, 1][:, None, None]) & (rows < bx[:, 3][:, None, None])
            )
            pmasks = (logits > 0) & in_box & keep_i[:, None, None]

            I = valid_i.shape[0]
            ids = jnp.arange(1, I + 1, dtype=jnp.int32)
            gmasks = instmap_i[None, :, :].astype(jnp.int32) == ids[:, None, None]
            gmasks = gmasks & valid_i[:, None, None]

            iou_b = seg_map.box_iou_pairs(boxes_i, gtb_i)
            iou_m = seg_map.mask_iou_pairs(pmasks, gmasks)
            tp_b = seg_map.match_image(iou_b, keep_i, valid_i)
            tp_m = seg_map.match_image(iou_m, keep_i, valid_i)
            return tp_b, tp_m

        tp_b, tp_m = jax.vmap(per_image)(
            proto, kept_coef, nb, keep,
            batch["instmap_proto"], batch["valid"], batch["boxes"],
        )
        losses = {k: parts[k] for k in ("box", "seg", "cls", "dfl")}
        return losses, {"scores": ns, "keep": keep, "tp_b": tp_b, "tp_m": tp_m}

    return step


def dispatch_validation(model, variables, val_dset, loss_cfg: LossConfig,
                        batch_size: int = 16, imgsz: int = 640, step=None,
                        mesh=None):
    """Enqueue the whole val pass (async dispatch, NO host sync) and
    return the pending device results — a pytree of arrays. Callers fetch
    with ONE `jax.device_get` (combining several folds' pendings into a
    single fetch if desired) and finish with `collect_validation`."""
    acfg = val_aug_config(val_dset.max_inst, imgsz)
    if step is None:
        step = make_val_step(model, loss_cfg)
    n = len(val_dset)
    dd = val_dset.as_dict()
    key = jax.random.PRNGKey(0)

    data_sh = None
    if mesh is not None:
        from tpu_mslesseg.core import mesh as meshlib

        repl_sh = meshlib.replicated(mesh)
        data_sh = meshlib.data_sharding(mesh)
        variables = jax.device_put(variables, repl_sh)
        dd = jax.device_put(dd, repl_sh)
        key = jax.device_put(key, repl_sh)

    pending = []
    for start in range(0, n - n % batch_size + (batch_size if n % batch_size else 0), batch_size):
        idx_np = np.arange(start, min(start + batch_size, n))
        if len(idx_np) < batch_size:  # pad final batch by repeating last
            real = len(idx_np)
            idx_np = np.concatenate([idx_np, np.full(batch_size - len(idx_np), idx_np[-1])])
        else:
            real = batch_size
        idx = jnp.asarray(idx_np)[:, None].repeat(4, axis=1)
        if mesh is not None:
            idx = jax.device_put(idx, data_sh)
        batch = augment.make_batch(key, dd, idx, acfg)
        losses, match = step(variables, batch)
        pending.append((real, {**losses, **match, "valid": batch["valid"]}))
    return pending


def collect_validation(fetched_pending, return_acc: bool = False):
    """Host-side accumulation over an already-fetched pending structure
    (the output of `jax.device_get(dispatch_validation(...))`)."""
    acc = seg_map.SegMapAccumulator()
    loss_sums, n_batches = {}, 0
    for real, fetched in fetched_pending:
        n_batches += 1
        for k in loss_sums.keys() | fetched.keys() - {
            "scores", "keep", "tp_b", "tp_m", "valid"
        }:
            loss_sums[k] = loss_sums.get(k, 0.0) + float(fetched[k])
        for b in range(real):
            acc.add_image(
                fetched["scores"][b], fetched["keep"][b],
                fetched["tp_b"][b], fetched["tp_m"][b],
                int(fetched["valid"][b].sum()),
            )
    metrics = acc.compute()
    val_losses = {k: v / max(n_batches, 1) for k, v in loss_sums.items()}
    if return_acc:  # curve plotting needs the raw score/TP arrays
        return metrics, val_losses, acc
    return metrics, val_losses


def run_validation(model, variables, val_dset, loss_cfg: LossConfig,
                   batch_size: int = 16, imgsz: int = 640, step=None,
                   mesh=None, return_acc: bool = False):
    """Full val pass -> (val_metrics dict for results.csv, val_losses dict).

    Pass a cached `step` from `make_val_step` when validating repeatedly —
    rebuilding it per call recompiles the whole val program. With a mesh,
    variables/dataset are replicated and each val batch shards over the
    'data' axis (the NMS+match program runs SPMD).

    Dispatch is async and the fetch is ONE device_get for the whole pass
    (a per-batch fetch cost a tunnel round trip per 16 slices)."""
    pending = dispatch_validation(
        model, variables, val_dset, loss_cfg,
        batch_size=batch_size, imgsz=imgsz, step=step, mesh=mesh,
    )
    return collect_validation(jax.device_get(pending), return_acc=return_acc)
