"""Fused batched slice predictor: the framework's inference hot path.

The reference predicts slice-by-slice in a Python loop — per-image torch
forward, NMS, mask decode, host round-trips, PNG IO
(``generar_predicciones.py:175-226``, SURVEY §3.4). Here the whole stage is
ONE jitted program over a batch of slices:

    volume-space uint8 slices [N,H,W]
      -> PNG-space orient -> letterbox 640 -> /255, 3ch
      -> YOLO11-seg forward
      -> DFL decode + padded NMS (conf .25, iou .7, max_det 300)
      -> proto-mask decode, per-instance box crop, union at proto res
      -> bilinear sample of mask logits at the exact inverse-letterbox
         source-pixel grid (geometrically exact; no padding distortion)
      -> threshold > 0 -> volume-space binary masks [N,H,W]

The mask semantics match Ultralytics `process_mask(..., upsample=True)`
(matmul proto @ coeffs, crop-to-box, bilinear, logit>0 threshold) composed
with the reference's union-resize step (``generar_predicciones.py:123-133``),
with the letterbox inverse applied analytically instead of resizing the
padded 640 map.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tpu_mslesseg.core import geometry
from tpu_mslesseg.infer import decode as dec
from tpu_mslesseg.infer.mask_union_pallas import (
    mask_union_logits_batch,
    mask_union_logits_ref as _mask_union_logits,  # noqa: F401 (API compat)
)
from tpu_mslesseg.infer.nms import nms_batch
from tpu_mslesseg.model import stem_pallas
from tpu_mslesseg.model.yolo11 import fold_gray_stem


def _bilinear_sample(img, ys, xs):
    """Sample img [H,W] at the outer product of ys [h], xs [w] (bilinear,
    zero padding outside)."""
    H, W = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    v00 = img[y0i][:, x0i]
    v01 = img[y0i][:, x1i]
    v10 = img[y1i][:, x0i]
    v11 = img[y1i][:, x1i]
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


class SlicePredictor:
    """Compiles and runs the fused prediction program for one slice shape.

    Usage:
        pred = SlicePredictor(model, variables, slice_hw=(182, 218))
        masks = pred(slices_u8)   # [N,182,218] bool, volume space
    """

    def __init__(
        self,
        model,
        variables,
        slice_hw,
        imgsz: int = 640,
        conf: float = 0.25,
        iou: float = 0.7,
        max_det: int = 300,
        mask_thresh: float = 0.0,
        platform: str | None = None,
    ):
        self.model = model
        # grayscale input: stem kernel folded over in_ch, network consumes
        # [B, S, S, 1] — skips the 3-channel repeat's HBM broadcast
        self.variables = fold_gray_stem(variables)
        self.platform = platform
        self.slice_hw = tuple(slice_hw)
        self.imgsz = imgsz
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        self.mask_thresh = mask_thresh
        h, w = self.slice_hw
        # PNG-space (model) dims are transposed volume-slice dims
        self.lb = dec.Letterbox(src_h=w, src_w=h, size=imgsz)
        # Opt-in fused Pallas stem (b0+b1 in one VMEM program). Measured
        # SLOWER than XLA's conv chain on v5e (32 vs 10 ms at b=300: the
        # 16/64-lane phase arrays pad to 128 lanes, so the VPU im2col
        # copies dominate) — kept for study behind an env flag. See
        # docs/stem_kernel_analysis.md.
        self._stem_w = stem_pallas.maybe_build(
            self.variables, model.dtype, platform, imgsz
        )
        self._jitted = jax.jit(self._forward)

    def _forward(self, variables, slices_u8):
        lb = self.lb
        reg_max = self.model.cfg.reg_max

        png = geometry.to_png_space_batch(slices_u8)  # [N, w, h]
        x = png.astype(jnp.float32) / 255.0
        x = lb.apply(x)  # [N, S, S]
        # model-dtype cast: numerics identical (the first conv casts
        # anyway), halves the network-input HBM traffic; single-channel
        # input pairs with the fold_gray_stem'd variables
        x = x.astype(self.model.dtype)
        if self._stem_w is not None:
            y = stem_pallas.stem_apply(self._stem_w, stem_pallas.stem_s2d(x))
            out = self.model.apply(variables, y, train=False, from_p2=True)
        else:
            out = self.model.apply(variables, x[..., None], train=False)
        box_d, cls_l, mcoef = dec.flatten_level_outputs(out, reg_max)
        anchors, strides = dec.make_anchors(self.imgsz, self.imgsz)
        boxes = dec.decode_boxes(box_d, anchors, strides, reg_max)
        scores = jax.nn.sigmoid(cls_l.astype(jnp.float32))[..., 0]  # single class

        nb, ns, keep, idx = nms_batch(boxes, scores, self.conf, self.iou, self.max_det)
        kept_coef = jnp.take_along_axis(mcoef, idx[..., None], axis=1)

        proto = out["proto"]  # [N, S/4, S/4, nm]
        union = mask_union_logits_batch(
            proto, kept_coef, nb, keep, platform=self.platform
        )

        # sample logits at source-pixel centers through the inverse letterbox
        ys, xs = lb.src_centers_in_letterbox()
        ys = (ys + 0.5) / 4.0 - 0.5  # letterbox px -> proto px (half-pixel)
        xs = (xs + 0.5) / 4.0 - 0.5
        png_masks = jax.vmap(lambda u: _bilinear_sample(u, ys, xs))(union)
        png_masks = png_masks > self.mask_thresh  # [N, w, h] PNG space

        return geometry.from_png_space_batch(png_masks)  # [N, h, w] volume space

    def __call__(self, slices_u8):
        h, w = self.slice_hw
        assert slices_u8.shape[1:] == (h, w), (slices_u8.shape, self.slice_hw)
        return self._jitted(self.variables, jnp.asarray(slices_u8))
