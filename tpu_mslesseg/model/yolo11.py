"""YOLO11-seg model family (n/s/m/l/x) in Flax.

Topology parity with the published YOLO11 segmentation architecture the
reference fine-tunes (`yolo11n-seg`, see SURVEY §2.2): CSP backbone
(Conv/C3k2/SPPF/C2PSA), PAN-FPN neck, decoupled detect head with DFL box
regression, class head, 32-dim proto-mask coefficient head, and a Proto
mask-prototype branch at P3/2.

TPU-first details: NHWC layout, bf16-able compute dtype, static shapes
(inputs must be divisible by 32), and raw per-level outputs returned as a
pytree so the loss/ decode stages stay fused under one jit.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, List

import jax.numpy as jnp
from flax import linen as nn

from tpu_mslesseg.model import blocks
from tpu_mslesseg.model.blocks import C2PSA, C3k2, Conv, DWConv, Proto, SPPF, upsample2x

# depth multiple, width multiple, max channels — the published YOLO11 scales
SCALES = {
    "n": (0.50, 0.25, 1024),
    "s": (0.50, 0.50, 1024),
    "m": (0.50, 1.00, 512),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.50, 512),
}

STRIDES = (8, 16, 32)


def make_divisible(x: float, divisor: int = 8) -> int:
    return max(divisor, int(x + divisor / 2) // divisor * divisor)


@dataclass(frozen=True)
class YoloConfig:
    nc: int = 1
    scale: str = "n"
    reg_max: int = 16
    nm: int = 32  # mask coefficients
    npr: int = 256  # proto channels (pre width-scaling)
    depth: float = field(init=False)
    width: float = field(init=False)
    max_ch: int = field(init=False)

    def __post_init__(self):
        d, w, mc = SCALES[self.scale]
        object.__setattr__(self, "depth", d)
        object.__setattr__(self, "width", w)
        object.__setattr__(self, "max_ch", mc)

    def ch(self, c: int) -> int:
        """Width-scaled channel count."""
        return make_divisible(min(c, self.max_ch) * self.width, 8)

    def rep(self, n: int) -> int:
        """Depth-scaled repeat count."""
        return max(round(n * self.depth), 1) if n > 1 else n

    @property
    def c3k_deep(self) -> bool:
        """m/l/x force c3k=True in every C3k2 (Ultralytics scale rule)."""
        return self.scale in ("m", "l", "x")

    @property
    def head_ch(self):
        """(P3, P4, P5) output channels of the neck."""
        return (self.ch(256), self.ch(512), self.ch(1024))

    @property
    def no(self) -> int:
        """Detect output channels per anchor: 4*reg_max + nc."""
        return 4 * self.reg_max + self.nc


class YOLO11Seg(nn.Module):
    """Full YOLO11-seg network. Input: NHWC float [B, H, W, 3], H/W % 32 == 0.

    Returns a dict:
      box:   list of 3 [B, Hi, Wi, 4*reg_max] DFL box distributions
      cls:   list of 3 [B, Hi, Wi, nc] class logits
      mcoef: list of 3 [B, Hi, Wi, nm] mask coefficients
      proto: [B, H/4, W/4, nm] mask prototypes
    """

    cfg: YoloConfig
    dtype: Any = jnp.float32
    # rematerialize the big blocks in the backward pass: activations of
    # every C3k2/C2PSA/SPPF are recomputed instead of stored, trading
    # FLOPs for the HBM that caps the train batch (the auto-batch probe
    # measures ~650 MiB/image without it). No effect on inference.
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, from_p2: bool = False):
        cfg, dt = self.cfg, self.dtype
        c3k = cfg.c3k_deep
        n2 = cfg.rep(2)
        if self.remat:
            # static_argnums: `train` (arg 2 incl. self) is a Python bool
            _C3k2 = nn.remat(C3k2, static_argnums=(2,))
            _C2PSA = nn.remat(C2PSA, static_argnums=(2,))
            _SPPF = nn.remat(SPPF, static_argnums=(2,))
        else:
            _C3k2, _C2PSA, _SPPF = C3k2, C2PSA, SPPF

        x = x.astype(dt)

        # ---- backbone ----
        if from_p2:
            # x is already the P2/4 feature map (the Pallas fused stem
            # computed b0+b1 — see model/stem_pallas.py); the unused
            # b0/b1 params stay in `variables` untouched
            y = x
        else:
            y = Conv(cfg.ch(64), 3, 2, dtype=dt, name="b0")(x, train)   # P1/2
            y = Conv(cfg.ch(128), 3, 2, dtype=dt, name="b1")(y, train)  # P2/4
        y = _C3k2(cfg.ch(256), n2, c3k, e=0.25, dtype=dt, name="b2")(y, train)
        y = Conv(cfg.ch(256), 3, 2, dtype=dt, name="b3")(y, train)      # P3/8
        p3b = _C3k2(cfg.ch(512), n2, c3k, e=0.25, dtype=dt, name="b4")(y, train)
        y = Conv(cfg.ch(512), 3, 2, dtype=dt, name="b5")(p3b, train)    # P4/16
        p4b = _C3k2(cfg.ch(512), n2, True, dtype=dt, name="b6")(y, train)
        y = Conv(cfg.ch(1024), 3, 2, dtype=dt, name="b7")(p4b, train)   # P5/32
        y = _C3k2(cfg.ch(1024), n2, True, dtype=dt, name="b8")(y, train)
        y = _SPPF(cfg.ch(1024), 5, dtype=dt, name="b9")(y, train)
        p5b = _C2PSA(cfg.ch(1024), n2, dtype=dt, name="b10")(y, train)

        # ---- PAN-FPN neck ----
        y = jnp.concatenate([upsample2x(p5b), p4b], axis=-1)            # 12
        n13 = _C3k2(cfg.ch(512), n2, c3k, dtype=dt, name="h13")(y, train)
        y = jnp.concatenate([upsample2x(n13), p3b], axis=-1)            # 15
        p3 = _C3k2(cfg.ch(256), n2, c3k, dtype=dt, name="h16")(y, train)  # P3 out
        y = Conv(cfg.ch(256), 3, 2, dtype=dt, name="h17")(p3, train)
        y = jnp.concatenate([y, n13], axis=-1)                          # 18
        p4 = _C3k2(cfg.ch(512), n2, c3k, dtype=dt, name="h19")(y, train)  # P4 out
        y = Conv(cfg.ch(512), 3, 2, dtype=dt, name="h20")(p4, train)
        y = jnp.concatenate([y, p5b], axis=-1)                          # 21
        p5 = _C3k2(cfg.ch(1024), n2, True, dtype=dt, name="h22")(y, train)  # P5 out

        feats = [p3, p4, p5]
        ch = cfg.head_ch

        # ---- Segment head ----
        # proto branch off P3
        proto = Proto(cfg.ch(cfg.npr), cfg.nm, dtype=dt, name="proto")(p3, train)

        c2 = max(16, ch[0] // 4, cfg.reg_max * 4)
        c3 = max(ch[0], min(cfg.nc, 100))
        c4 = max(ch[0] // 4, cfg.nm)

        box_out, cls_out, mcoef_out = [], [], []
        for i, f in enumerate(feats):
            b = Conv(c2, 3, dtype=dt, name=f"box{i}_0")(f, train)
            b = Conv(c2, 3, dtype=dt, name=f"box{i}_1")(b, train)
            b = nn.Conv(4 * cfg.reg_max, (1, 1), use_bias=True, dtype=dt,
                        name=f"box{i}_2")(b)
            box_out.append(b)

            c = DWConv(f.shape[-1], 3, dtype=dt, name=f"cls{i}_0dw")(f, train)
            c = Conv(c3, 1, dtype=dt, name=f"cls{i}_0pw")(c, train)
            c = DWConv(c3, 3, dtype=dt, name=f"cls{i}_1dw")(c, train)
            c = Conv(c3, 1, dtype=dt, name=f"cls{i}_1pw")(c, train)
            c = nn.Conv(cfg.nc, (1, 1), use_bias=True, dtype=dt,
                        bias_init=cls_bias_init(cfg.nc, STRIDES[i]),
                        name=f"cls{i}_2")(c)
            cls_out.append(c)

            m = Conv(c4, 3, dtype=dt, name=f"mc{i}_0")(f, train)
            m = Conv(c4, 3, dtype=dt, name=f"mc{i}_1")(m, train)
            m = nn.Conv(cfg.nm, (1, 1), use_bias=True, dtype=dt,
                        name=f"mc{i}_2")(m)
            mcoef_out.append(m)

        return {
            "box": box_out,
            "cls": cls_out,
            "mcoef": mcoef_out,
            "proto": proto,
        }


def cls_bias_init(nc: int, stride: int, imgsz: int = 640):
    """Detect-head prior: initialize class-logit bias so initial objectness
    is ~5 objects per 640x640 image (stabilizes early training)."""
    val = math.log(5 / nc / (imgsz / stride) ** 2)

    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, val, dtype)

    return init


def create_model(nc: int = 1, scale: str = "n", dtype=jnp.float32,
                 remat: bool = False):
    cfg = YoloConfig(nc=nc, scale=scale)
    return YOLO11Seg(cfg=cfg, dtype=dtype, remat=remat), cfg


def create_model_from_env():
    """Serving-model construction from the TPU_MSLESSEG_{DTYPE,SCALE,
    IMGSZ} env knobs — the ONE resolution the prediction stage and the
    --rapido fast path both use (their bitwise-equality contract breaks
    if the two resolve dtype/scale/imgsz independently and drift).
    Returns (model, cfg, imgsz)."""
    import os

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        os.environ.get("TPU_MSLESSEG_DTYPE", "bfloat16")
    ]
    model, cfg = create_model(
        nc=1, scale=os.environ.get("TPU_MSLESSEG_SCALE", "n"), dtype=dtype
    )
    return model, cfg, int(os.environ.get("TPU_MSLESSEG_IMGSZ", "640"))


def fold_gray_stem(variables):
    """Inference-only variables transform for grayscale inputs.

    The pipeline's slices are single-channel; the reference feeds the
    model 3-channel PNGs whose channels are equal copies. Since
    ``conv(repeat(x, 3), W) == conv(x, W.sum(in_ch))`` exactly (in the
    conv's accumulation dtype), summing the stem kernel over its
    input-channel axis lets the network consume [B, H, W, 1] directly —
    skipping the [B, 640, 640, 3] repeat that costs ~5 ms of HBM
    broadcast traffic per serving batch (b=300, measured). The f32 sum
    is exact; under bf16 compute the single post-sum cast rounds once
    where the 3-term accumulation rounded thrice (sub-ulp difference).

    Returns a new variables pytree (input untouched); idempotent.
    """
    import jax
    import numpy as np

    k = variables["params"]["b0"]["conv"]["kernel"]
    if k.shape[2] == 1:
        return variables
    new = jax.tree_util.tree_map(lambda x: x, variables)  # fresh containers
    # sum on HOST (numpy): an eager throwaway-shape device op through the
    # TPU tunnel costs seconds per predictor construction (CLAUDE.md
    # host-compute rule); np.asarray is one small fetch
    new["params"]["b0"]["conv"]["kernel"] = jnp.asarray(
        np.asarray(k).sum(axis=2, keepdims=True), k.dtype
    )
    return new


def param_count(params) -> int:
    import jax

    return sum(p.size for p in jax.tree_util.tree_leaves(params))
