"""Detection decode: anchors, DFL box regression, letterbox geometry.

Replaces the Ultralytics inference decode the reference calls through
``modelo(img)`` (``generar_predicciones.py:111-120``): anchor grid
generation, distribution-focal-loss box expectation, and xyxy recovery —
all fused, static-shape XLA ops.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

STRIDES = (8, 16, 32)


def make_anchors(h: int, w: int, strides=STRIDES, offset: float = 0.5):
    """Anchor centers (in feature-grid units) and per-anchor strides for a
    letterboxed input of size (h, w). Returns ([A,2] xy, [A,1])."""
    points, stride_vals = [], []
    for s in strides:
        fh, fw = h // s, w // s
        ys = (jnp.arange(fh, dtype=jnp.float32) + offset)[:, None]
        xs = (jnp.arange(fw, dtype=jnp.float32) + offset)[None, :]
        xv = jnp.broadcast_to(xs, (fh, fw))
        yv = jnp.broadcast_to(ys, (fh, fw))
        points.append(jnp.stack([xv, yv], axis=-1).reshape(-1, 2))
        stride_vals.append(jnp.full((fh * fw, 1), float(s), jnp.float32))
    return jnp.concatenate(points, 0), jnp.concatenate(stride_vals, 0)


def dfl_expectation(box_dist, reg_max: int = 16):
    """[..., 4*reg_max] DFL logits -> [..., 4] expected ltrb distances."""
    shape = box_dist.shape[:-1]
    d = box_dist.reshape(*shape, 4, reg_max).astype(jnp.float32)
    p = jax.nn.softmax(d, axis=-1)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    return jnp.sum(p * bins, axis=-1)


def dist2bbox(ltrb, anchor_points):
    """ltrb distances (grid units) + anchor centers -> xyxy (grid units)."""
    lt, rb = ltrb[..., :2], ltrb[..., 2:]
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def flatten_level_outputs(out, reg_max: int = 16):
    """Model output dict -> ([B,A,4*reg_max], [B,A,nc], [B,A,nm]) with
    levels concatenated in stride order (8, 16, 32)."""
    def flat(xs):
        return jnp.concatenate(
            [x.reshape(x.shape[0], -1, x.shape[-1]) for x in xs], axis=1
        )

    return flat(out["box"]), flat(out["cls"]), flat(out["mcoef"])


def decode_boxes(box_dist, anchor_points, stride_vals, reg_max: int = 16):
    """DFL logits -> xyxy boxes in letterbox-pixel units. [B,A,4]."""
    ltrb = dfl_expectation(box_dist, reg_max)
    return dist2bbox(ltrb, anchor_points[None]) * stride_vals[None]


# ---------------------------------------------------------------------------
# letterbox geometry (static per slice shape)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Letterbox:
    """Static letterbox transform from an (h, w) source image to a
    (size, size) network input (reference behavior: Ultralytics LetterBox
    with auto=False — scale to fit, center with gray padding)."""

    src_h: int
    src_w: int
    size: int = 640

    @property
    def ratio(self) -> float:
        return min(self.size / self.src_h, self.size / self.src_w)

    @property
    def new_h(self) -> int:
        return round(self.src_h * self.ratio)

    @property
    def new_w(self) -> int:
        return round(self.src_w * self.ratio)

    @property
    def pad_top(self) -> int:
        return round((self.size - self.new_h) / 2 - 0.1)

    @property
    def pad_left(self) -> int:
        return round((self.size - self.new_w) / 2 - 0.1)

    def apply(self, imgs):
        """[N, src_h, src_w] float in [0,1] -> [N, size, size]."""
        n = imgs.shape[0]
        resized = jax.image.resize(
            imgs, (n, self.new_h, self.new_w), method="bilinear"
        )
        pad_b = self.size - self.new_h - self.pad_top
        pad_r = self.size - self.new_w - self.pad_left
        return jnp.pad(
            resized,
            ((0, 0), (self.pad_top, pad_b), (self.pad_left, pad_r)),
            constant_values=114.0 / 255.0,
        )

    def src_centers_in_letterbox(self):
        """Letterbox-pixel coordinates of every source-pixel center:
        ([src_h], [src_w]) arrays — the exact inverse-letterbox sampling
        grid (no padding distortion, unlike resizing the full 640 map)."""
        rh = self.new_h / self.src_h
        rw = self.new_w / self.src_w
        ys = (jnp.arange(self.src_h, dtype=jnp.float32) + 0.5) * rh - 0.5 + self.pad_top
        xs = (jnp.arange(self.src_w, dtype=jnp.float32) + 0.5) * rw - 0.5 + self.pad_left
        return ys, xs
