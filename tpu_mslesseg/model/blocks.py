"""YOLO11 building blocks in Flax (NHWC, TPU-layout).

Architectural parity targets the published YOLO11 topology that the
reference consumes through Ultralytics (`yolo11n-seg.pt`, reference
`configs/ConfigTrain.py:139`): Conv(+BN+SiLU), Bottleneck, C3k, C3k2,
SPPF, Attention/PSABlock/C2PSA, Proto. Implementation is original and
JAX-idiomatic: modules are thin `nn.compact` functions over NHWC arrays,
compute dtype is configurable (bf16 on TPU), and batch-norm statistics
live in the standard Flax `batch_stats` collection.

Conventions (matching the torch originals so weights/shapes correspond):
* conv padding is symmetric k//2 (torch `autopad`);
* BN eps 1e-3, momentum 0.03 (flax momentum = 0.97);
* activation SiLU unless `act=False`.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class Conv(nn.Module):
    """Conv2d(no bias) + BatchNorm + SiLU."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.k // 2
        x = nn.Conv(
            self.c2,
            (self.k, self.k),
            strides=(self.s, self.s),
            padding=[(p, p), (p, p)],
            feature_group_count=self.g,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.97,
            epsilon=1e-3,
            dtype=jnp.float32,
            name="bn",
        )(x)
        x = nn.silu(x) if self.act else x
        # AMP semantics (torch autocast parity): BN+SiLU compute in f32,
        # but the block's OUTPUT is consumed in the compute dtype. The
        # explicit cast keeps the f32 intermediate inside the XLA fusion —
        # without it every conv fusion materializes BOTH a bf16 and an
        # f32 copy of the activation (measured ~2x HBM write traffic).
        # Deviation note: downstream residual adds/concats therefore run
        # in bf16, whereas strict torch autocast keeps them f32 and casts
        # only at the next conv input. Empirically benign (capacity DSC
        # 0.836 > 0.808 anchor) and the HBM-traffic win is measured.
        return x.astype(self.dtype)


class DWConv(nn.Module):
    """Depthwise Conv (groups == channels)."""

    c2: int
    k: int = 3
    s: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = min(x.shape[-1], self.c2)
        return Conv(self.c2, self.k, self.s, g=g, act=self.act, dtype=self.dtype)(
            x, train
        )


class Bottleneck(nn.Module):
    c2: int
    shortcut: bool = True
    g: int = 1
    k: Tuple[int, int] = (3, 3)
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c_, self.k[0], 1, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(self.c2, self.k[1], 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            y = x + y
        return y


class C3k(nn.Module):
    """CSP bottleneck with 3 convs and kernel-k inner bottlenecks."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    k: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck(
                c_, self.shortcut, self.g, k=(self.k, self.k), e=1.0,
                dtype=self.dtype, name=f"m{i}",
            )(a, train)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], axis=-1), train
        )


class C3k2(nn.Module):
    """C2f-style split block whose inner module is C3k or Bottleneck."""

    c2: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    g: int = 1
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            if self.c3k:
                m = C3k(c, 2, self.shortcut, self.g, dtype=self.dtype, name=f"m{i}")
            else:
                m = Bottleneck(
                    c, self.shortcut, self.g, k=(3, 3), e=0.5,
                    dtype=self.dtype, name=f"m{i}",
                )
            ys.append(m(ys[-1], train))
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(ys, axis=-1), train
        )


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained stride-1 max-pools."""

    c2: int
    k: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        p = self.k // 2
        pool = lambda t: nn.max_pool(
            t, (self.k, self.k), strides=(1, 1), padding=[(p, p), (p, p)]
        )
        y1 = pool(y)
        y2 = pool(y1)
        y3 = pool(y2)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([y, y1, y2, y3], axis=-1), train
        )


class Attention(nn.Module):
    """Multi-head attention over H*W tokens with depthwise positional
    encoding (as used inside C2PSA)."""

    dim: int
    num_heads: int
    attn_ratio: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        N = H * W
        head_dim = self.dim // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        scale = key_dim**-0.5
        nh_kd = key_dim * self.num_heads
        h = self.dim + nh_kd * 2

        qkv = Conv(h, 1, act=False, dtype=self.dtype, name="qkv")(x, train)
        qkv = qkv.reshape(B, N, self.num_heads, key_dim * 2 + head_dim)
        q = qkv[..., :key_dim]
        k = qkv[..., key_dim : 2 * key_dim]
        v = qkv[..., 2 * key_dim :]

        # [B, heads, N, d]
        q = jnp.swapaxes(q, 1, 2)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = jnp.swapaxes(out, 1, 2).reshape(B, H, W, self.dim)

        vmap = jnp.swapaxes(v, 1, 2).reshape(B, H, W, self.dim)
        pe = DWConv(self.dim, 3, act=False, dtype=self.dtype, name="pe")(vmap, train)
        return Conv(self.dim, 1, act=False, dtype=self.dtype, name="proj")(
            out + pe, train
        )


class PSABlock(nn.Module):
    c: int
    attn_ratio: float = 0.5
    num_heads: int = 4
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = Attention(
            self.c, self.num_heads, self.attn_ratio, dtype=self.dtype, name="attn"
        )(x, train)
        x = x + a if self.shortcut else a
        f = Conv(self.c * 2, 1, dtype=self.dtype, name="ffn1")(x, train)
        f = Conv(self.c, 1, act=False, dtype=self.dtype, name="ffn2")(f, train)
        return x + f if self.shortcut else f


class C2PSA(nn.Module):
    c2: int
    n: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        for i in range(self.n):
            b = PSABlock(
                c, attn_ratio=0.5, num_heads=max(c // 64, 1),
                dtype=self.dtype, name=f"m{i}",
            )(b, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([a, b], axis=-1), train
        )


class Proto(nn.Module):
    """Prototype-mask head: conv -> 2x deconv -> conv -> 1x1 to nm masks."""

    c_: int
    nm: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.c_, 3, dtype=self.dtype, name="cv1")(x, train)
        x = nn.ConvTranspose(
            self.c_, (2, 2), strides=(2, 2), padding="VALID", use_bias=True,
            dtype=self.dtype, name="upsample",
        )(x)
        x = Conv(self.c_, 3, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.nm, 1, dtype=self.dtype, name="cv3")(x, train)


def upsample2x(x):
    """Exact 2x nearest-neighbor upsample (repeat, not resize)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
