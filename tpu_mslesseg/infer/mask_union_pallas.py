"""Proto-mask union as a fused Pallas kernel.

The union-of-instance-masks step (Ultralytics ``process_mask`` semantics:
``masks = sigmoid(coef @ proto)`` cropped to each detection's box, here
kept in logit space and max-reduced — see ``mask_union_logits_ref``) is
the second-hottest op in the fused inference program after the conv
forward. The XLA formulation pays twice: it materializes a
``[imgs, max_det, mh, mw]`` f32 tensor (300 x 300 x 160 x 160 = 9.2 GB
of HBM write+read at the serving batch) AND runs the crop-predicate /
select / max over every one of the 300 padded detection slots even
though a lesion slice keeps only a handful after NMS — measured at
~31 ms of the 134 ms end-to-end program (and the traffic-free naive
Pallas port stayed VPU-bound at the same cost).

This kernel fixes both:

* streaming — grid over (image, pixel-tile); each detection chunk's
  logits ``coef_chunk @ protoT`` ([KC, TILE_P], MXU) live only in VMEM
  and fold into a running max; the per-detection mask maps never touch
  HBM;
* runtime work-skipping — NMS survivors sit inside the score-sorted
  valid prefix, so the per-image count of live slots (max kept index +
  1, scalar-prefetched) bounds a ``fori_loop`` over detection chunks:
  an image with 7 lesions does 1 chunk of 64, not 300 slots.

Numerics: products are computed in f32 exactly like the XLA path (proto
may arrive bf16 — the bf16->f32 cast is exact); only the 32-term
contraction order differs, so results match to float rounding and the
downstream >0 threshold is unaffected. Exactness vs the XLA reference is
pinned by ``tests/test_mask_union_pallas.py`` and was verified
bit-identical end-to-end (consensus volumes) on the demo patients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e4  # large-negative instead of -inf: survives bilinear sampling
_LANE = 128
_MAX_TILE_P = 12800  # VMEM budget: chunk logits [KC, TILE_P] f32 ~ 3.3 MB
_KC = 64  # detection-chunk size (sublane axis of the chunk matmul)
_BIG = 1e9  # x1 sentinel that makes a slot's crop predicate false


def mask_union_logits_ref(proto, mcoef, boxes_lb, keep, proto_stride: int = 4):
    """XLA reference (single image): union of cropped per-instance mask
    logits at proto resolution. proto [mh, mw, nm]; mcoef [K, nm];
    boxes_lb [K, 4] letterbox px; keep [K] bool -> [mh, mw] f32.

    Replicates what the reference gets from Ultralytics'
    ``ops.process_mask`` + ``np.maximum`` union
    (``generar_predicciones.py:123-133``), in logit space.
    """
    mh, mw, nm = proto.shape
    logits = jnp.einsum(
        "kc,hwc->khw", mcoef.astype(jnp.float32), proto.astype(jnp.float32)
    )
    boxes_p = boxes_lb / proto_stride
    rows = jnp.arange(mh, dtype=jnp.float32)[None, :, None]
    cols = jnp.arange(mw, dtype=jnp.float32)[None, None, :]
    x1 = boxes_p[:, 0][:, None, None]
    y1 = boxes_p[:, 1][:, None, None]
    x2 = boxes_p[:, 2][:, None, None]
    y2 = boxes_p[:, 3][:, None, None]
    inside = (cols >= x1) & (cols < x2) & (rows >= y1) & (rows < y2)
    ok = inside & keep[:, None, None]
    masked = jnp.where(ok, logits, _NEG)
    return jnp.max(masked, axis=0)


def _pick_tile(npix: int) -> int | None:
    """Largest lane-aligned pixel tile dividing npix, or None if npix is
    not lane-aligned (kernel unsupported -> caller falls back to XLA)."""
    if npix % _LANE:
        return None
    groups = npix // _LANE
    while _LANE * groups > _MAX_TILE_P and groups % 2 == 0:
        groups //= 2
    tile = _LANE * groups
    return tile if tile <= _MAX_TILE_P else None


def _union_kernel(
    nact_ref, coef_ref, bounds_ref, protoT_ref, out_ref, *, tile_p, mw
):
    i = pl.program_id(0)
    t = pl.program_id(1)
    protoT = protoT_ref[0].astype(jnp.float32)  # [nm, TILE_P]
    pix = t * tile_p + jax.lax.broadcasted_iota(jnp.int32, (1, tile_p), 1)
    row = (pix // mw).astype(jnp.float32)  # [1, TILE_P]
    col = (pix % mw).astype(jnp.float32)

    def chunk(c, acc):
        coef_c = coef_ref[0, pl.ds(c * _KC, _KC), :]  # [KC, nm] f32
        b = bounds_ref[0, pl.ds(c * _KC, _KC), :]  # [KC, 4]
        # [KC, TILE_P] detection-mask logits — VMEM-only; this is the
        # tensor the XLA path spills to HBM for all 300 slots
        logits = jax.lax.dot_general(
            coef_c, protoT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        inside = (
            (col >= b[:, 0][:, None])
            & (col < b[:, 2][:, None])
            & (row >= b[:, 1][:, None])
            & (row < b[:, 3][:, None])
        )
        masked = jnp.where(inside, logits, _NEG)
        return jnp.maximum(acc, jnp.max(masked, axis=0, keepdims=True))

    acc = jnp.full((1, tile_p), _NEG, jnp.float32)
    n_chunks = (nact_ref[i] + _KC - 1) // _KC  # live-slot bound, per image
    union = jax.lax.fori_loop(0, n_chunks, chunk, acc)
    # Mosaic cannot relayout a 1D lane vector into (sublane, lane) tiles;
    # broadcasting across the 8-sublane minimum keeps the write legal
    # (the caller reads sublane 0). Costs 8x on the tiny union output.
    out_ref[0, 0] = jnp.broadcast_to(union, (8, tile_p))


def mask_union_logits_batch(
    proto,
    mcoef,
    boxes_lb,
    keep,
    proto_stride: int = 4,
    platform: str | None = None,
    interpret: bool = False,
):
    """Batched union of cropped instance-mask logits.

    proto [N, mh, mw, nm]; mcoef [N, K, nm]; boxes_lb [N, K, 4]; keep
    [N, K] bool -> [N, mh, mw] f32. Uses the Pallas kernel on TPU (or
    when ``interpret=True`` for testing); the XLA reference elsewhere —
    trace-time selection, identical results either way.
    """
    n, mh, mw, nm = proto.shape
    k = mcoef.shape[1]
    npix = mh * mw
    tile_p = _pick_tile(npix)
    platform = platform or jax.default_backend()
    if tile_p is None or (platform != "tpu" and not interpret):
        return jax.vmap(
            functools.partial(mask_union_logits_ref, proto_stride=proto_stride)
        )(proto, mcoef, boxes_lb, keep)

    kpad = -(-k // _KC) * _KC
    protoT = proto.reshape(n, npix, nm).transpose(0, 2, 1)  # [N, nm, NPIX]
    coef = jnp.pad(
        mcoef.astype(jnp.float32), ((0, 0), (0, kpad - k), (0, 0))
    )  # [N, Kpad, nm]
    # fold `keep` and the K-padding into the bounds: a dead slot gets
    # x1=+BIG so its crop predicate is false everywhere (-> _NEG, exactly
    # the masked value the reference assigns non-kept detections)
    bounds = boxes_lb.astype(jnp.float32) / proto_stride  # [N, K, 4]
    dead = ~keep[:, :, None]
    bounds = jnp.where(
        jnp.concatenate([dead, jnp.zeros_like(dead)] * 2, axis=2), _BIG, bounds
    )
    bounds = jnp.pad(
        bounds, ((0, 0), (0, kpad - k), (0, 0)), constant_values=_BIG
    )  # [N, Kpad, 4]
    # survivors live inside the score-sorted valid prefix: the highest
    # kept slot + 1 bounds the kernel's detection loop per image
    slot = jnp.arange(k, dtype=jnp.int32)[None, :]
    n_active = jnp.max(jnp.where(keep, slot + 1, 0), axis=1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, npix // tile_p),
        in_specs=[
            pl.BlockSpec(
                (1, kpad, nm), lambda i, t, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, kpad, 4), lambda i, t, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nm, tile_p), lambda i, t, *_: (i, 0, t),
                memory_space=pltpu.VMEM,
            ),
        ],
        # last two block dims (8, tile_p) satisfy Mosaic's (8, 128)
        # divisibility rule; pixels stay lane-major throughout
        out_specs=pl.BlockSpec(
            (1, 1, 8, tile_p), lambda i, t, *_: (i, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(_union_kernel, tile_p=tile_p, mw=mw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n, npix // tile_p, 8, tile_p), jnp.float32
        ),
        interpret=interpret,
    )(n_active, coef, bounds, protoT)
    return out[:, :, 0, :].reshape(n, mh, mw)
