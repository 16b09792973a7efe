"""Image-enhancement suite: HE / CLAHE / GC / LT as batched jitted kernels.

The reference applies OpenCV enhancements per-slice on the host
(``utils/mejora_imagen.py``); here each enhancement is a vectorized JAX
program over a batch of uint8 slices ``[N, H, W]`` so a whole patient (or
fold) is enhanced in one device call.

Numerics are matched to the reference's effective grayscale transform
(every slice is grayscale, so the BGR/YUV/LAB round-trips collapse to
1-D maps — verified empirically against OpenCV):

* HE    — ``cv2.equalizeHist`` on the luma channel (``mejora_imagen.py:52-67``).
  The YUV round-trip is exactly the identity for gray input; our histogram
  LUT reproduces cv2 bit-for-bit.
* CLAHE — clip 2.0, 8x8 tiles on the LAB L channel (``:91-117``). The
  L-channel forward/backward maps are the sRGB-gamma CIELAB transforms
  (analytic; within +-1/256 of cv2's fixed-point tables), and the CLAHE
  core (histogram clip + redistribution + bilinear tile blending) follows
  cv2's algorithm exactly.
* GC    — LUT ``uint8((linspace(0,1,256)**gamma)*255)``, gamma=2.0 (``:139-151``).
* LT    — ``c*log(1+v)`` with ``c = 255/log(1+max)`` per slice (``:166-184``).

All kernels take/return uint8; `enhance_batch` optionally does the
min-max-to-uint8 normalization that the reference's ``convertir_a_bgr``
performs first (``utils/utils.py:396-418``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MEJORAS = ("HE", "CLAHE", "GC", "LT")


# ---------------------------------------------------------------------------
# uint8 normalization (reference `normalizar_a_uint8`)
# ---------------------------------------------------------------------------


def normalize_to_uint8(slices):
    """Per-slice min-max to [0,255] uint8 (truncating, like `.astype`).

    `slices`: float [N, H, W] (or [H, W])."""
    x = jnp.asarray(slices, dtype=jnp.float32)
    batched = x.ndim == 3
    axes = (1, 2) if batched else (0, 1)
    lo = x.min(axis=axes, keepdims=True)
    ptp = x.max(axis=axes, keepdims=True) - lo
    y = jnp.where(ptp > 0, 255.0 * (x - lo) / jnp.where(ptp > 0, ptp, 1.0), 0.0)
    return y.astype(jnp.uint8)


# ---------------------------------------------------------------------------
# HE — histogram equalization (cv2.equalizeHist-exact)
# ---------------------------------------------------------------------------


def _equalize_one(img):
    """cv2.equalizeHist semantics on one uint8 image [H, W]."""
    flat = img.reshape(-1).astype(jnp.int32)
    hist = jnp.zeros((256,), jnp.int32).at[flat].add(1)
    i0 = jnp.argmax(hist > 0)
    total = flat.shape[0]
    denom = total - hist[i0]
    cdf = jnp.cumsum(hist)
    scale = 255.0 / jnp.maximum(denom, 1).astype(jnp.float32)
    lut = jnp.clip(jnp.round((cdf - cdf[i0]).astype(jnp.float32) * scale), 0, 255)
    lut = lut.astype(jnp.uint8)
    out = lut[flat].reshape(img.shape)
    # constant image: cv2 returns the input unchanged
    return jnp.where(denom == 0, img, out)


@jax.jit
def he_batch(imgs_u8):
    return jax.vmap(_equalize_one)(imgs_u8)


# ---------------------------------------------------------------------------
# CLAHE — contrast-limited adaptive histogram equalization
# ---------------------------------------------------------------------------


def _lab_luts():
    """Forward (gray->L8) and backward (L8->gray) CIELAB luma maps.

    These are the sRGB-gamma CIELAB transforms for neutral gray, with a
    per-entry integer correction table so the maps agree bit-for-bit with
    OpenCV's fixed-point colorspace tables (the reference's effective
    numerics); the analytic formula alone is within +-1 on ~50/256 entries,
    which CLAHE's steep tile LUTs would amplify. Correctness is asserted
    against cv2-generated goldens in tests/test_enhance.py.
    """
    v = np.arange(256) / 255.0
    vlin = np.where(v <= 0.04045, v / 12.92, ((v + 0.055) / 1.055) ** 2.4)
    L = np.where(vlin > 0.008856, 116.0 * np.cbrt(vlin) - 16.0, 903.3 * vlin)
    fwd = np.round(L * 255.0 / 100.0).astype(np.int32)

    l8 = np.arange(256)
    Lf = l8 * 100.0 / 255.0
    fy = (Lf + 16.0) / 116.0
    Y = np.where(Lf > 903.3 * 0.008856, fy**3, Lf / 903.3)
    srgb = np.where(Y <= 0.0031308, 12.92 * Y, 1.055 * np.power(Y, 1 / 2.4) - 0.055)
    bwd = np.clip(np.round(srgb * 255.0), 0, 255).astype(np.int32)

    # fixed-point corrections: {index: delta} vs the analytic formula
    fwd_fix = {
        4: -1, 6: 1, 9: 1, 12: 1, 17: -1, 23: -1, 25: 1, 28: 1, 30: -1, 33: 1,
        37: 1, 42: -1, 47: 1, 67: 1, 75: 1, 77: -1, 89: 1, 110: 1, 112: 1,
        113: 1, 143: 1, 144: 1, 145: 1, 146: 1, 147: 1, 171: 1, 172: 1,
        187: 1, 188: 1, 189: 1, 201: 1, 202: 1, 213: 1, 214: 1, 224: 1,
        233: 1, 234: 1, 243: 1, 251: 1, 252: 1,
    }
    bwd_fix = {
        1: 1, 19: 1, 23: -1, 33: 1, 38: 1, 44: 1, 50: 1, 56: -1, 64: -1,
        121: -1,
    }
    for i, d in fwd_fix.items():
        fwd[i] += d
    for i, d in bwd_fix.items():
        bwd[i] += d
    return fwd.astype(np.uint8), bwd.astype(np.uint8)


_LAB_FWD, _LAB_BWD = _lab_luts()


def _clahe_core(img, clip_limit: float, tiles_x: int, tiles_y: int):
    """cv2 CLAHE algorithm on one uint8 image [H, W] (static shape)."""
    H, W = img.shape
    tw = -(-W // tiles_x)
    th = -(-H // tiles_y)
    pad_w = tw * tiles_x - W
    pad_h = th * tiles_y - H
    ext = jnp.pad(img, ((0, pad_h), (0, pad_w)), mode="reflect")  # REFLECT_101

    tile_area = tw * th
    limit = max(int(clip_limit * tile_area / 256), 1)
    lut_scale = 255.0 / tile_area

    # [tY, tX, th*tw] tile pixels
    tiles = ext.reshape(tiles_y, th, tiles_x, tw).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(tiles_y * tiles_x, tile_area).astype(jnp.int32)

    def tile_lut(pix):
        hist = jnp.zeros((256,), jnp.int32).at[pix].add(1)
        clipped = jnp.sum(jnp.maximum(hist - limit, 0))
        hist = jnp.minimum(hist, limit)
        rb = clipped // 256
        residual = clipped - rb * 256
        hist = hist + rb
        # residual redistribution: +1 at bins k*step for k in [0, residual)
        step = jnp.maximum(256 // jnp.maximum(residual, 1), 1)
        bins = jnp.arange(256)
        bonus = ((bins % step == 0) & (bins // step < residual)).astype(jnp.int32)
        hist = hist + bonus
        lut = jnp.clip(jnp.round(jnp.cumsum(hist).astype(jnp.float32) * lut_scale), 0, 255)
        return lut.astype(jnp.float32)

    luts = jax.vmap(tile_lut)(tiles).reshape(tiles_y, tiles_x, 256)

    # bilinear blend of the 4 neighboring tile LUTs, cv2-style
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    txf = xs / tw - 0.5
    tyf = ys / th - 0.5
    tx1 = jnp.floor(txf).astype(jnp.int32)
    ty1 = jnp.floor(tyf).astype(jnp.int32)
    xa = (txf - tx1).astype(jnp.float32)
    ya = (tyf - ty1).astype(jnp.float32)
    tx1c = jnp.clip(tx1, 0, tiles_x - 1)
    tx2c = jnp.clip(tx1 + 1, 0, tiles_x - 1)
    ty1c = jnp.clip(ty1, 0, tiles_y - 1)
    ty2c = jnp.clip(ty1 + 1, 0, tiles_y - 1)

    v = img.astype(jnp.int32)
    ty1b = jnp.broadcast_to(ty1c, (H, W))
    ty2b = jnp.broadcast_to(ty2c, (H, W))
    tx1b = jnp.broadcast_to(tx1c, (H, W))
    tx2b = jnp.broadcast_to(tx2c, (H, W))
    p11 = luts[ty1b, tx1b, v]
    p21 = luts[ty1b, tx2b, v]
    p12 = luts[ty2b, tx1b, v]
    p22 = luts[ty2b, tx2b, v]
    xab = jnp.broadcast_to(xa, (H, W))
    yab = jnp.broadcast_to(ya, (H, W))
    res = (p11 * (1 - xab) + p21 * xab) * (1 - yab) + (p12 * (1 - xab) + p22 * xab) * yab
    return jnp.clip(jnp.round(res), 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("clip_limit", "tiles_x", "tiles_y"))
def clahe_batch(imgs_u8, clip_limit: float = 2.0, tiles_x: int = 8, tiles_y: int = 8):
    """Reference CLAHE chain: gray -> LAB L -> CLAHE -> back to gray."""
    fwd = jnp.asarray(_LAB_FWD)
    bwd = jnp.asarray(_LAB_BWD)
    l_imgs = fwd[imgs_u8.astype(jnp.int32)]
    out = jax.vmap(lambda im: _clahe_core(im, clip_limit, tiles_x, tiles_y))(l_imgs)
    return bwd[out.astype(jnp.int32)]


# ---------------------------------------------------------------------------
# GC — gamma correction
# ---------------------------------------------------------------------------


def _gc_lut(gamma: float) -> np.ndarray:
    # truncating cast, like the reference's np.array(..., dtype=np.uint8)
    return (np.linspace(0, 1, 256) ** gamma * 255).astype(np.uint8)


@functools.lru_cache(maxsize=None)
def _gc_elementwise_exact(gamma: float) -> bool:
    """Whether the f32 elementwise formula floor((x/255)^gamma * 255) —
    with the power as repeated multiplication — reproduces `_gc_lut(gamma)`
    on ALL 256 inputs.

    Why this matters: a 256-entry LUT gather over a slice batch is the
    single hottest op in the fused inference program on TPU (~15 ms per
    50 slices, more than the whole letterbox), while the elementwise form
    fuses into the surrounding program for ~free. Why the check is sound:
    the candidate uses only *, / and floor, which IEEE-754 requires to be
    correctly rounded, so this host-side numpy-f32 verification transfers
    bit-for-bit to the device; `pow` would NOT qualify (platform-specific
    transcendental approximations), hence integer gammas only.
    """
    g = int(gamma)
    if g != gamma or not (1 <= g <= 16):
        return False
    x = np.arange(256, dtype=np.float32)
    t = x / np.float32(255.0)
    acc = t.copy()
    for _ in range(g - 1):
        acc = acc * t
    cand = np.floor(acc * np.float32(255.0)).astype(np.uint8)
    return bool(np.array_equal(cand, _gc_lut(gamma)))


@functools.partial(jax.jit, static_argnames=("gamma",))
def gc_batch(imgs_u8, gamma: float = 2.0):
    if _gc_elementwise_exact(gamma):  # trace-time constant
        g = int(gamma)
        t = imgs_u8.astype(jnp.float32) / 255.0
        acc = t
        for _ in range(g - 1):
            acc = acc * t
        return jnp.floor(acc * 255.0).astype(jnp.uint8)
    lut = jnp.asarray(_gc_lut(gamma))
    return lut[imgs_u8.astype(jnp.int32)]


# ---------------------------------------------------------------------------
# LT — log transform
# ---------------------------------------------------------------------------


@jax.jit
def lt_batch(imgs_u8):
    x = imgs_u8.astype(jnp.float32)
    m = x.max(axis=(1, 2), keepdims=True)
    c = 255.0 / jnp.log1p(m)
    y = c * jnp.log1p(x)
    # reference: np.clip(...).astype(np.uint8) — truncation
    return jnp.floor(jnp.clip(y, 0, 255)).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# dispatcher
# ---------------------------------------------------------------------------

_KERNELS = {
    "HE": he_batch,
    "CLAHE": clahe_batch,
    "GC": gc_batch,
    "LT": lt_batch,
}


def enhance_batch(slices, mejora: str | None, normalize: bool = True):
    """Apply an enhancement to a batch of slices.

    `slices`: float volume-space slices [N, H, W] (normalize=True) or
    uint8 images (normalize=False). Returns uint8 [N, H, W].
    """
    imgs = normalize_to_uint8(slices) if normalize else jnp.asarray(slices)
    if mejora is None:
        return imgs
    if mejora not in _KERNELS:
        raise ValueError(f"Mejora no reconocida: {mejora}.")
    return _KERNELS[mejora](imgs)


@functools.partial(jax.jit, static_argnames=("mejora",))
def enhance_for_model(slices, mejora: str | None):
    """Enhancement followed by the per-slice min-max stretch the PNG
    artifacts carry (``plt.imsave`` re-normalizes each slice,
    ``extraer_dataset.py:192``) — the reference model trains on the
    stretched PNGs, so model inputs must match. Only CLAHE's output can
    differ from the plain enhancement (its clipped LUT need not span
    [0, 255]). One fused jit program (eager dispatch through the TPU
    tunnel costs more than the math)."""
    return normalize_to_uint8(enhance_batch(slices, mejora))
