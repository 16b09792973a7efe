"""On-device training augmentation: mosaic + affine + flip + value jitter.

The reference trains with Ultralytics' host-side augmentation pipeline
(mosaic 1.0, scale 0.5, translate 0.1, fliplr 0.5, hsv_v 0.4, degrees 0 —
``args.yaml:73-103``). Here augmentation is a *single jitted gather program*
per batch, built on the observation that mosaic placement followed by an
axis-aligned affine is itself an affine map per tile: for every output
pixel we compute its source coordinate in one of the 4 tile images and
bilinearly sample (nearest for instance maps). No host work, no dynamic
shapes, fully fused with the train step's device pipeline.

Instance bookkeeping: each source slice carries a uint8 instance-ID map and
per-instance boxes; tile k's IDs are offset by k*max_inst so the mosaic
keeps every instance distinct (matching overlap_mask=True semantics).
Boxes are transformed analytically (exact for scale/translate/flip),
clipped, and filtered with upstream's box_candidates criteria.

Differentially pinned against a literal NumPy transcription of upstream
Mosaic._mosaic4 + RandomPerspective with injected draws
(tests/test_augment.py::test_mosaic_affine_matches_ultralytics_transcription).
One knowing deviation: pixels within ~1px of a tile seam sample only
their own tile (upstream's warp blends across the pasted canvas seam).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class AugConfig(NamedTuple):
    imgsz: int = 640
    scale: float = 0.5  # uniform(1-s, 1+s)
    translate: float = 0.1
    fliplr: float = 0.5
    hsv_v: float = 0.4
    max_inst: int = 16  # per source slice
    mosaic: bool = True


def _interp_matrix(coords, size: int):
    """1-D bilinear interpolation matrix W [S, size] with rows zeroed
    outside the source range, plus the in-bounds mask [S].

    The mosaic+affine map is axis-separable (scale/translate/flip only),
    so 2-D resampling factorizes into ``Wy @ img @ Wx.T`` — MXU matmuls
    instead of millions of pointwise gathers (which dominate TPU time)."""
    c0 = jnp.floor(coords)
    w1 = coords - c0
    i0 = c0.astype(jnp.int32)
    inb = (coords >= 0) & (coords <= size - 1)
    oh0 = jax.nn.one_hot(jnp.clip(i0, 0, size - 1), size)
    oh1 = jax.nn.one_hot(jnp.clip(i0 + 1, 0, size - 1), size)
    W = oh0 * (1.0 - w1)[:, None] + oh1 * w1[:, None]
    return W * inb[:, None], inb


def _nearest_matrix(coords, size: int):
    """1-D nearest-neighbor selection matrix (exact one-hot rows)."""
    i = jnp.round(coords).astype(jnp.int32)
    inb = (i >= 0) & (i < size)
    W = jax.nn.one_hot(jnp.clip(i, 0, size - 1), size)
    return W * inb[:, None], inb


class _AugParams(NamedTuple):
    """One sample's augmentation draws (canvas center, affine, flip
    uniform, brightness gain) — injectable for differential tests."""

    yc: jnp.ndarray
    xc: jnp.ndarray
    s: jnp.ndarray
    tx: jnp.ndarray
    ty: jnp.ndarray
    flip_u: jnp.ndarray
    gain: jnp.ndarray


def _draw_params(key, cfg: AugConfig) -> _AugParams:
    """The random draws of ``_mosaic_one`` (identical subkey order and
    uniform calls — the training RNG chain is pinned bitwise)."""
    S = cfg.imgsz
    k_cy, k_cx, k_scale, k_tx, k_ty, k_flip, k_gain = jax.random.split(key, 7)
    # integer centers like upstream (int(random.uniform(S/2, 3S/2)))
    yc = jnp.floor(jax.random.uniform(k_cy, (), minval=0.5 * S, maxval=1.5 * S))
    xc = jnp.floor(jax.random.uniform(k_cx, (), minval=0.5 * S, maxval=1.5 * S))
    s = jax.random.uniform(k_scale, (), minval=1 - cfg.scale, maxval=1 + cfg.scale)
    tx = jax.random.uniform(
        k_tx, (), minval=0.5 - cfg.translate, maxval=0.5 + cfg.translate
    ) * S
    ty = jax.random.uniform(
        k_ty, (), minval=0.5 - cfg.translate, maxval=0.5 + cfg.translate
    ) * S
    flip_u = jax.random.uniform(k_flip, ())
    gain = jax.random.uniform(k_gain, (), minval=1 - cfg.hsv_v, maxval=1 + cfg.hsv_v)
    return _AugParams(yc, xc, s, tx, ty, flip_u, gain)


def _mosaic_one(key, images, instmaps, boxes, valid, cfg: AugConfig):
    """Build one augmented sample from 4 source slices.

    images [4,H,W] float (0..255); instmaps [4,H,W] uint8; boxes [4,I,4]
    (source-pixel xyxy); valid [4,I] bool.
    Returns (img [S,S], instmap [S,S] uint8, boxes [4I,4], valid [4I]).
    """
    return _apply_mosaic(
        _draw_params(key, cfg), images, instmaps, boxes, valid, cfg
    )


def _apply_mosaic(p: _AugParams, images, instmaps, boxes, valid,
                  cfg: AugConfig):
    """Apply one sample's augmentation given its draws (see _mosaic_one)."""
    S = cfg.imgsz
    H, W = images.shape[1], images.shape[2]
    s, tx, ty = p.s, p.tx, p.ty

    if cfg.mosaic:
        # mosaic center on the 2S x 2S canvas; tile k's top-left placed
        # so its corner meets the center (upstream mosaic4 quadrants)
        yc, xc = p.yc, p.xc
        offs_y = jnp.stack([yc - H, yc - H, yc, yc])
        offs_x = jnp.stack([xc - W, xc, xc - W, xc])
        canvas = 2 * S
    else:
        # single image centered on an S-canvas (letterbox placement)
        offs_y = jnp.stack([(S - H) / 2.0] + [jnp.inf] * 3)
        offs_x = jnp.stack([(S - W) / 2.0] + [jnp.inf] * 3)
        canvas = S
    # forward map: canvas point c -> s*(c - canvas/2) + (tx, ty)
    # inverse: out pixel p -> (p - t)/s + canvas/2   (separable in y/x)
    ys_out = jnp.arange(S, dtype=jnp.float32)
    xs_out = jnp.arange(S, dtype=jnp.float32)
    cy = (ys_out - ty) / s + canvas / 2.0
    cx = (xs_out - tx) / s + canvas / 2.0

    # tile content exists only INSIDE the canvas (upstream pastes with
    # quadrant crops at the canvas edges; an affine sample that lands
    # off-canvas reads the 114 border even where a tile's nominal extent
    # continues) — mask the per-axis sample coords to [0, canvas-1]
    cyv = (cy >= 0) & (cy <= canvas - 1)
    cxv = (cx >= 0) & (cx <= canvas - 1)

    img_out = jnp.full((S, S), 114.0)
    inst_out = jnp.zeros((S, S), jnp.int32)
    for k in range(4 if cfg.mosaic else 1):
        ys_k = cy - offs_y[k]  # [S]
        xs_k = cx - offs_x[k]  # [S]
        Wy, hy = _interp_matrix(ys_k, H)
        Wx, hx = _interp_matrix(xs_k, W)
        v = Wy @ images[k] @ Wx.T  # separable bilinear resample on the MXU
        hit = (hy & cyv)[:, None] & (hx & cxv)[None, :]
        img_out = jnp.where(hit, v, img_out)

        Ny, ny = _nearest_matrix(ys_k, H)
        Nx, nx = _nearest_matrix(xs_k, W)
        m = (Ny @ instmaps[k].astype(jnp.float32) @ Nx.T).astype(jnp.int32)
        nhit = (ny & cyv)[:, None] & (nx & cxv)[None, :]
        ids = jnp.where(m > 0, m + k * cfg.max_inst, 0)
        inst_out = jnp.where(nhit & (m > 0), ids, inst_out)

    # transform boxes: src -> canvas -> output
    n_tiles = 4 if cfg.mosaic else 1
    all_boxes, all_valid = [], []
    for k in range(n_tiles):
        b = boxes[k]  # [I,4] source pixels
        # canvas coordinates, clipped to the canvas BEFORE the affine —
        # upstream Mosaic._cat_labels clips instances to the 2S canvas,
        # so a box hanging off a cropped tile edge anchors at the border
        cx1 = jnp.clip(b[:, 0] + offs_x[k], 0, canvas)
        cy1 = jnp.clip(b[:, 1] + offs_y[k], 0, canvas)
        cx2 = jnp.clip(b[:, 2] + offs_x[k], 0, canvas)
        cy2 = jnp.clip(b[:, 3] + offs_y[k], 0, canvas)
        bx1 = (cx1 - canvas / 2.0) * s + tx
        by1 = (cy1 - canvas / 2.0) * s + ty
        bx2 = (cx2 - canvas / 2.0) * s + tx
        by2 = (cy2 - canvas / 2.0) * s + ty
        nb = jnp.stack(
            [jnp.clip(bx1, 0, S), jnp.clip(by1, 0, S), jnp.clip(bx2, 0, S),
             jnp.clip(by2, 0, S)], axis=-1
        )
        # upstream box_candidates: min side 2px, aspect < 100, and area
        # ratio > 1% (area_thr 0.01 — the segments branch). box1 is the
        # PRE-affine canvas box, so the ratio absorbs s^2 like upstream
        # (w1/h1 are NOT scaled by s).
        w2 = nb[:, 2] - nb[:, 0]
        h2 = nb[:, 3] - nb[:, 1]
        w1 = cx2 - cx1
        h1 = cy2 - cy1
        eps = 1e-16
        ar = jnp.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
        ok = (
            valid[k]
            & (w2 > 2)
            & (h2 > 2)
            & (ar < 100)
            & (w2 * h2 / (w1 * h1 + eps) > 0.01)
        )
        all_boxes.append(nb)
        all_valid.append(ok)
    if not cfg.mosaic:
        pad_n = boxes.shape[1] * 3
        all_boxes.append(jnp.zeros((pad_n, 4)))
        all_valid.append(jnp.zeros((pad_n,), bool))
    out_boxes = jnp.concatenate(all_boxes, axis=0)  # [4I, 4]
    out_valid = jnp.concatenate(all_valid, axis=0)

    # horizontal flip
    do_flip = p.flip_u < cfg.fliplr
    img_out = jnp.where(do_flip, img_out[:, ::-1], img_out)
    inst_out = jnp.where(do_flip, inst_out[:, ::-1], inst_out)
    fb = jnp.stack(
        [S - out_boxes[:, 2], out_boxes[:, 1], S - out_boxes[:, 0], out_boxes[:, 3]],
        axis=-1,
    )
    out_boxes = jnp.where(do_flip, fb, out_boxes)

    # brightness (grayscale reduction of HSV value jitter)
    img_out = jnp.clip(img_out * p.gain, 0, 255)

    return img_out, inst_out.astype(jnp.uint8), out_boxes, out_valid


@functools.partial(jax.jit, static_argnames=("cfg",))
def make_batch(key, dataset, idx, cfg: AugConfig = AugConfig()):
    """Assemble one augmented training batch fully on device.

    dataset: dict of device arrays
        images [M, H, W] uint8, instmaps [M, H, W] uint8,
        boxes [M, I, 4] f32, valid [M, I] bool
    idx: [B, 4] int32 source-slice indices (4 per mosaic).

    Returns dict: images [B,S,S,3] f32 in [0,1], instmap [B,mh,mw] uint8
    (proto res S/4), boxes [B,4I,4], valid [B,4I].
    """
    B = idx.shape[0]
    keys = jax.random.split(key, B)
    if not cfg.mosaic:
        idx = idx[:, :1]  # only the primary slice is consumed: skip 3/4
        # of the gather traffic in val batches / close-mosaic epochs

    def one(k, ids):
        imgs = dataset["images"][ids].astype(jnp.float32)
        insts = dataset["instmaps"][ids]
        bxs = dataset["boxes"][ids]
        vld = dataset["valid"][ids]
        return _mosaic_one(k, imgs, insts, bxs, vld, cfg)

    img, inst, boxes, valid = jax.vmap(one)(keys, idx)

    # proto-res instance map (nearest, stride 4)
    S = cfg.imgsz
    mh = S // 4
    centers = (jnp.arange(mh) * 4 + 1.5).astype(jnp.int32)
    inst_proto = inst[:, centers][:, :, centers]

    x = (img / 255.0)[..., None]
    x = jnp.repeat(x, 3, axis=-1)
    return {
        "images": x,
        "instmap": inst,
        "instmap_proto": inst_proto,
        "boxes": boxes,
        "valid": valid,
    }
