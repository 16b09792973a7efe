"""Fused YOLO11 stem (b0+b1) as a space-to-depth Pallas kernel.

The first two stride-2 convs run at the network's largest spatial dims
with its smallest channel counts (1->16 @640^2, 16->32 @320^2). XLA's
TPU conv schedule lays these out batch-minor and runs them at <10% of
the MXU plus a full-image relayout copy — measured ~12 ms of the ~93 ms
serving program at batch 300 (see CLAUDE.md round-3 perf notes).

This kernel reformulates both convs over a 4x4 space-to-depth phase
image, which turns each 3x3/s2 conv into a dense 2x2/s1 conv with a
lane-friendly contraction:

    x [B, S, S]  ->  xs2d [B, S/4, S/4, 16]          (XLA reshape)
    b0: k3 s2 (cin 1)   ==  k2 s1 over 16 phases  -> GEMM K=64,  N=64
        (output kept in its own 2x2-phase form: 4 x 16 channels)
    b1: k3 s2 (cin 16)  ==  k2 s1 over b0 phases  -> GEMM K=256, N=32

Both stages stay in VMEM (the whole per-image activation set fits), so
the fused stem costs ONE HBM read of the input and ONE write of the
[B, S/4, S/4, 32] result — no intermediate round trip, no layout copy.

The k2/s1 equivalence: an output row r = 2Y+qy of a pad-1 k3/s2 conv
reads input rows 2r-1..2r+1 = 4Y + (2qy-1..2qy+1), which all live in
phase-rows Y-1..Y of the space-to-depth image; the tap-to-(phase, k)
mapping is folded into the rearranged weights by `build_stem_weights`
(zero slots for the 7/16 never-hit positions — exact zeros, so the
accumulated result equals the original conv up to f32 summation order).

BatchNorm (inference stats) and SiLU are fused per stage with the exact
Flax formula ((x - mean) * scale*rsqrt(var+eps) + bias), and each
stage's output is cast to the compute dtype exactly like
``blocks.Conv`` does. Numerics therefore match the XLA path to float
rounding (contraction order differs); CPU paths keep the standard conv
chain (`YOLO11Seg.__call__(from_p2=False)`), and equality is pinned at
tolerance by tests/test_stem_pallas.py in interpret mode.

Reference consumption parity: this replaces only the internal schedule
of the first two Ultralytics blocks (`yolo11n-seg` layers 0-1); the
serving stages consume it through the predictors transparently.

OUTCOME (measured, v5e, b=300 @640): this kernel runs at 32.2 ms vs
XLA's 9.8 ms conv chain — the 16/32/64-channel phase arrays pad to the
128-lane VMEM tile, so the VPU im2col scratch copies (8x/4x/2x wasted
vector throughput) dominate the two small GEMMs (K=64/N=64, K=256/N=32
both underfill the MXU). It is therefore DISABLED by default (env
``TPU_MSLESSEG_PALLAS_STEM=1`` opts in) and kept as a correct,
parity-tested study artifact; the full analysis and the bandwidth
ceiling math live in docs/stem_kernel_analysis.md.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Opt-in only: measured slower than the XLA conv chain (see module doc)
ENABLED = os.environ.get("TPU_MSLESSEG_PALLAS_STEM", "0") == "1"


def maybe_build(variables, dtype, platform, imgsz: int):
    """Single gate for the opt-in fused stem, shared by the predictors:
    returns rearranged stem weights when enabled and applicable (TPU
    backend, imgsz divisible by the space-to-depth factor), else None.
    `variables` may be one pytree or a per-plane dict of pytrees."""
    backend = platform or jax.default_backend()
    if not (ENABLED and backend == "tpu" and imgsz % 4 == 0):
        return None
    if isinstance(variables, dict) and "params" not in variables:
        return {p: build_stem_weights(v, dtype) for p, v in variables.items()}
    return build_stem_weights(variables, dtype)


def stem_s2d(x):
    """[B, S, S] -> [B, S/4, S/4, 16] phase image (p = py*4 + px)."""
    b, s, s2 = x.shape
    assert s % 4 == 0 and s2 % 4 == 0, (s, s2)
    h, w = s // 4, s2 // 4
    return (
        x.reshape(b, h, 4, w, 4).transpose(0, 1, 3, 2, 4).reshape(b, h, w, 16)
    )


def _bn_terms(variables, name):
    p = variables["params"][name]["bn"]
    st = variables["batch_stats"][name]["bn"]
    mul = np.asarray(p["scale"], np.float32) * jax.lax.rsqrt(
        np.asarray(st["var"], np.float32) + 1e-3
    )
    return (
        np.asarray(st["mean"], np.float32),
        np.asarray(mul, np.float32),
        np.asarray(p["bias"], np.float32),
    )


def build_stem_weights(variables, dtype=jnp.bfloat16):
    """Rearranged phase-space weights + folded BN terms from the model's
    b0/b1 Conv blocks (post fold_gray_stem: b0 kernel is [3,3,1,16])."""
    w0 = np.asarray(variables["params"]["b0"]["conv"]["kernel"], np.float32)
    w1 = np.asarray(variables["params"]["b1"]["conv"]["kernel"], np.float32)
    assert w0.shape[:3] == (3, 3, 1), w0.shape
    c0 = w0.shape[3]  # 16 at n-scale
    c1 = w1.shape[3]  # 32
    assert w1.shape[:3] == (3, 3, c0), w1.shape

    # stage 1: A0 channel = (ky*2+kx)*16 + py*4+px ; out = (qy*2+qx)*c0 + c
    w0f = np.zeros((64, 4 * c0), np.float32)
    for qy in range(2):
        for qx in range(2):
            for dy in range(3):
                for dx in range(3):
                    ny, nx = 2 * qy + dy - 1, 2 * qx + dx - 1
                    ky, py = ny // 4 + 1, ny % 4
                    kx, px = nx // 4 + 1, nx % 4
                    w0f[(ky * 2 + kx) * 16 + py * 4 + px,
                        (qy * 2 + qx) * c0:(qy * 2 + qx + 1) * c0] += w0[dy, dx, 0]

    # stage 2: A1 channel = (ky*2+kx)*4c0 + (qy*2+qx)*c0 + ci ; out = co
    w1f = np.zeros((16 * c0, c1), np.float32)
    for dy in range(3):
        for dx in range(3):
            ny, nx = dy - 1, dx - 1
            ky, qy = ny // 2 + 1, ny % 2
            kx, qx = nx // 2 + 1, nx % 2
            base = (ky * 2 + kx) * 4 * c0 + (qy * 2 + qx) * c0
            w1f[base:base + c0, :] += w1[dy, dx]

    m0, s0, b0 = _bn_terms(variables, "b0")
    m1, s1, b1 = _bn_terms(variables, "b1")
    tile4 = lambda v: np.tile(v, 4)[None, :]  # per-phase copies of BN terms
    return {
        "w0": jnp.asarray(w0f, dtype),
        "m0": jnp.asarray(tile4(m0)),
        "s0": jnp.asarray(tile4(s0)),
        "b0": jnp.asarray(tile4(b0)),
        "w1": jnp.asarray(w1f, dtype),
        "m1": jnp.asarray(m1[None, :]),
        "s1": jnp.asarray(s1[None, :]),
        "b1": jnp.asarray(b1[None, :]),
    }


def _stem_kernel(x_ref, w0_ref, m0_ref, s0_ref, b0_ref,
                 w1_ref, m1_ref, s1_ref, b1_ref, out_ref,
                 xband, halo, o0band, a0_scr, a1_scr, *, h, w, c0, c1, bd,
                 dtype):
    """Grid (image, band). Per band of BD output rows: BlockSpec delivers
    the band's xs2d rows; the 2-row top halo is the PREVIOUS band's tail,
    carried across the (sequential on TPU) grid steps in a VMEM scratch —
    a manual HBM DMA of the 16-lane phase array is un-lowerable (Mosaic
    requires lane slices aligned to the 128 tiling).

    Sub-128 lane dims pad to 128 in VMEM, so scratches are band-sized
    (a full-image [h+1, w+1, 64] scratch padded to 128 lanes alone
    exceeds the 16 MB VMEM budget at h=w=160)."""
    f32 = jnp.float32
    j = pl.program_id(1)

    # xband[t, 1+x, :] == xs2d[i, j*bd-2+t, x, :]; row 0-1 / col 0 = halo
    x = x_ref[0]  # [bd, w, 16] — this band's rows
    xband[:, 0:1, :] = jnp.zeros_like(xband[:, 0:1, :])

    @pl.when(j == 0)
    def _():
        xband[0:2, 1:1 + w, :] = jnp.zeros((2, w, 16), dtype)

    @pl.when(j > 0)
    def _():
        xband[0:2, 1:1 + w, :] = halo[:]

    xband[2:2 + bd, 1:1 + w, :] = x
    halo[:] = x[bd - 2:bd]  # tail rows -> next band's top halo

    w0 = w0_ref[:]
    w1 = w1_ref[:]
    taps = [(0, 0), (0, 1), (1, 0), (1, 1)]  # == weight k-slot order

    # stage 1: b0 in 2x2-phase form — o0 rows [y0-1, y0+bd) (bd+1 rows;
    # o0band[t] == o0 row y0-1+t, col 0 is the left halo).
    # im2col assembled through scratch stores (a lane-offset concat of
    # shifted slices is unimplemented in Mosaic).
    o0band[:, 0:1, :] = jnp.zeros_like(o0band[:, 0:1, :])
    for t, (ky, kx) in enumerate(taps):
        a0_scr[:, :, t * 16:(t + 1) * 16] = xband[ky:ky + bd + 1, kx:kx + w, :]
    a0 = a0_scr[:].reshape((bd + 1) * w, 64)
    acc = jax.lax.dot_general(
        a0, w0, (((1,), (0,)), ((), ())), preferred_element_type=f32
    )
    o = (acc - m0_ref[:]) * s0_ref[:] + b0_ref[:]
    o = jax.nn.silu(o).astype(dtype)
    o0band[:, 1:1 + w, :] = o.reshape(bd + 1, w, 4 * c0)

    # o0 row -1 (the first band's top row) is b1's ZERO padding of the
    # b0 output — it must not be the BN+SiLU image of zeroed input
    # (silu(bn(0)) != 0 for trained, nonzero BN stats; with init stats
    # the difference vanishes, which is why only stats-perturbed parity
    # tests can see it)
    @pl.when(j == 0)
    def _():
        o0band[0:1, :, :] = jnp.zeros_like(o0band[0:1, :, :])

    # stage 2: b1 back to real resolution — out rows [y0, y0+bd)
    for t, (ky, kx) in enumerate(taps):
        a1_scr[:, :, t * 4 * c0:(t + 1) * 4 * c0] = (
            o0band[ky:ky + bd, kx:kx + w, :]
        )
    a1 = a1_scr[:].reshape(bd * w, 16 * c0)
    acc = jax.lax.dot_general(
        a1, w1, (((1,), (0,)), ((), ())), preferred_element_type=f32
    )
    o = (acc - m1_ref[:]) * s1_ref[:] + b1_ref[:]
    o = jax.nn.silu(o).astype(dtype)
    out_ref[0] = o.reshape(bd, w, c1)


def stem_apply(weights, xs2d, interpret: bool = False):
    """Apply the fused stem. xs2d [B, H, W, 16] (from ``stem_s2d``) ->
    [B, H, W, c1] in the weights' compute dtype."""
    b, h, w, p16 = xs2d.shape
    assert p16 == 16, xs2d.shape
    c0 = weights["w0"].shape[1] // 4
    c1 = weights["w1"].shape[1]
    dtype = weights["w0"].dtype
    bd = h
    for cand in (32, 16, 8, 4, 2, 1):  # band rows: bound VMEM scratches
        if h % cand == 0:
            bd = cand
            break

    kernel = functools.partial(
        _stem_kernel, h=h, w=w, c0=c0, c1=c1, bd=bd, dtype=dtype
    )
    full = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b, h // bd),
        in_specs=[
            # non-overlapping band blocks; halo carried in kernel scratch
            pl.BlockSpec((1, bd, w, 16), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            *[full(weights[k]) for k in
              ("w0", "m0", "s0", "b0", "w1", "m1", "s1", "b1")],
        ],
        out_specs=pl.BlockSpec((1, bd, w, c1), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c1), dtype),
        scratch_shapes=[
            pltpu.VMEM((bd + 2, w + 1, 16), dtype),
            pltpu.VMEM((2, w, 16), dtype),
            pltpu.VMEM((bd + 1, w + 1, 4 * c0), dtype),
            pltpu.VMEM((bd + 1, w, 64), dtype),
            pltpu.VMEM((bd, w, 16 * c0), dtype),
        ],
        interpret=interpret,
    )(xs2d, *[weights[k] for k in
              ("w0", "m0", "s0", "b0", "w1", "m1", "s1", "b1")])


def stem_reference(model, variables, x):
    """XLA reference: the model's own b0+b1 chain on [B, S, S] grayscale
    input (fold_gray_stem'd variables), for parity tests."""
    from tpu_mslesseg.model.blocks import Conv

    cfg, dt = model.cfg, model.dtype
    y = x.astype(dt)[..., None]
    b0 = Conv(cfg.ch(64), 3, 2, dtype=dt)
    y, _ = b0.apply(
        {"params": variables["params"]["b0"],
         "batch_stats": variables["batch_stats"]["b0"]},
        y, False, mutable=["batch_stats"],
    )
    b1 = Conv(cfg.ch(128), 3, 2, dtype=dt)
    y, _ = b1.apply(
        {"params": variables["params"]["b1"],
         "batch_stats": variables["batch_stats"]["b1"]},
        y, False, mutable=["batch_stats"],
    )
    return y
