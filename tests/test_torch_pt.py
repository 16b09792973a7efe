"""Differential tests for the torch-free .pt importer.

Two layers of evidence:

1. ``io/torch_pt.py`` parses real ``torch.save`` zip checkpoints bitwise
   (fixtures generated here with the environment's torch-cpu).
2. ``model/import_pt.py``'s name map + layout transposes are validated by
   building a torch *replica* of the YOLO11-seg module tree whose
   attribute names reproduce the real ultralytics state_dict keys
   (``model.0.conv.weight`` ... ``model.23.cv4.2.2.bias``), importing its
   checkpoint through the torch-free path, and checking **forward
   equivalence** of the full network (torch NCHW vs our Flax NHWC model)
   — which exercises every transpose, the ConvTranspose spatial flip, the
   attention head layout, and the BN stat mapping at once.

The replica is test-local and built from the published YOLO11
architecture (same knowledge our Flax model encodes); the reference repo
contains no Ultralytics source (SURVEY §2.2 — it consumes the pip
package).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tn = torch.nn

from tpu_mslesseg.io import torch_pt
from tpu_mslesseg.model import import_pt
from tpu_mslesseg.model.yolo11 import YoloConfig, create_model

# ---------------------------------------------------------------- replica


class TConv(tn.Module):
    def __init__(self, c1, c2, k=1, s=1, g=1, act=True):
        super().__init__()
        self.conv = tn.Conv2d(c1, c2, k, s, k // 2, groups=g, bias=False)
        self.bn = tn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = tn.SiLU() if act else tn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TDWConv(TConv):
    def __init__(self, c1, c2, k=3, s=1, act=True):
        super().__init__(c1, c2, k, s, g=math.gcd(c1, c2), act=act)


class TBottleneck(tn.Module):
    def __init__(self, c1, c2, shortcut=True, g=1, k=(3, 3), e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, k[0], 1)
        self.cv2 = TConv(c_, c2, k[1], 1, g=g)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC3k(tn.Module):
    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5, k=3):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, 1, 1)
        self.cv2 = TConv(c1, c_, 1, 1)
        self.cv3 = TConv(2 * c_, c2, 1)
        self.m = tn.Sequential(
            *(TBottleneck(c_, c_, shortcut, g, k=(k, k), e=1.0)
              for _ in range(n))
        )

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class TC3k2(tn.Module):
    def __init__(self, c1, c2, n=1, c3k=False, e=0.5, g=1, shortcut=True):
        super().__init__()
        self.c = int(c2 * e)
        self.cv1 = TConv(c1, 2 * self.c, 1, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1)
        self.m = tn.ModuleList(
            TC3k(self.c, self.c, 2, shortcut, g) if c3k
            else TBottleneck(self.c, self.c, shortcut, g, k=(3, 3), e=0.5)
            for _ in range(n)
        )

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class TSPPF(tn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1, 1)
        self.cv2 = TConv(c_ * 4, c2, 1, 1)
        self.m = tn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class TAttention(tn.Module):
    def __init__(self, dim, num_heads=8, attn_ratio=0.5):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.key_dim = int(self.head_dim * attn_ratio)
        self.scale = self.key_dim**-0.5
        h = dim + self.key_dim * num_heads * 2
        self.qkv = TConv(dim, h, 1, act=False)
        self.proj = TConv(dim, dim, 1, act=False)
        self.pe = TConv(dim, dim, 3, 1, g=dim, act=False)

    def forward(self, x):
        B, C, H, W = x.shape
        N = H * W
        qkv = self.qkv(x)
        q, k, v = qkv.view(
            B, self.num_heads, self.key_dim * 2 + self.head_dim, N
        ).split([self.key_dim, self.key_dim, self.head_dim], dim=2)
        attn = (q.transpose(-2, -1) @ k) * self.scale
        attn = attn.softmax(dim=-1)
        x = (v @ attn.transpose(-2, -1)).view(B, C, H, W) + self.pe(
            v.reshape(B, C, H, W)
        )
        return self.proj(x)


class TPSABlock(tn.Module):
    def __init__(self, c, attn_ratio=0.5, num_heads=4, shortcut=True):
        super().__init__()
        self.attn = TAttention(c, num_heads=num_heads, attn_ratio=attn_ratio)
        self.ffn = tn.Sequential(
            TConv(c, c * 2, 1), TConv(c * 2, c, 1, act=False)
        )
        self.add = shortcut

    def forward(self, x):
        x = x + self.attn(x) if self.add else self.attn(x)
        return x + self.ffn(x) if self.add else self.ffn(x)


class TC2PSA(tn.Module):
    def __init__(self, c1, c2, n=1, e=0.5):
        super().__init__()
        self.c = int(c1 * e)
        self.cv1 = TConv(c1, 2 * self.c, 1, 1)
        self.cv2 = TConv(2 * self.c, c1, 1)
        self.m = tn.Sequential(
            *(TPSABlock(self.c, attn_ratio=0.5,
                        num_heads=max(self.c // 64, 1)) for _ in range(n))
        )

    def forward(self, x):
        a, b = self.cv1(x).split((self.c, self.c), dim=1)
        b = self.m(b)
        return self.cv2(torch.cat((a, b), 1))


class TProto(tn.Module):
    def __init__(self, c1, c_=256, c2=32):
        super().__init__()
        self.cv1 = TConv(c1, c_, k=3)
        self.upsample = tn.ConvTranspose2d(c_, c_, 2, 2, 0, bias=True)
        self.cv2 = TConv(c_, c_, k=3)
        self.cv3 = TConv(c_, c2)

    def forward(self, x):
        return self.cv3(self.cv2(self.upsample(self.cv1(x))))


class TDFL(tn.Module):
    def __init__(self, c1=16):
        super().__init__()
        self.conv = tn.Conv2d(c1, 1, 1, bias=False).requires_grad_(False)
        self.conv.weight.data[:] = torch.arange(c1, dtype=torch.float).view(
            1, c1, 1, 1
        )


class TSegment(tn.Module):
    """Detect+Segment head branches (raw per-level outputs, no decode)."""

    def __init__(self, nc, ch, reg_max=16, nm=32, npr=256):
        super().__init__()
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        c4 = max(ch[0] // 4, nm)
        self.cv2 = tn.ModuleList(
            tn.Sequential(TConv(x, c2, 3), TConv(c2, c2, 3),
                          tn.Conv2d(c2, 4 * reg_max, 1)) for x in ch
        )
        self.cv3 = tn.ModuleList(
            tn.Sequential(
                tn.Sequential(TDWConv(x, x, 3), TConv(x, c3, 1)),
                tn.Sequential(TDWConv(c3, c3, 3), TConv(c3, c3, 1)),
                tn.Conv2d(c3, nc, 1),
            ) for x in ch
        )
        self.cv4 = tn.ModuleList(
            tn.Sequential(TConv(x, c4, 3), TConv(c4, c4, 3),
                          tn.Conv2d(c4, nm, 1)) for x in ch
        )
        self.proto = TProto(ch[0], npr, nm)
        self.dfl = TDFL(reg_max)

    def forward(self, feats):
        return {
            "box": [self.cv2[i](f) for i, f in enumerate(feats)],
            "cls": [self.cv3[i](f) for i, f in enumerate(feats)],
            "mcoef": [self.cv4[i](f) for i, f in enumerate(feats)],
            "proto": self.proto(feats[0]),
        }


class TConcat(tn.Module):
    def forward(self, xs):
        return torch.cat(xs, 1)


class TYolo11Seg(tn.Module):
    """Full YOLO11-seg replica; child index == ultralytics layer index."""

    def __init__(self, cfg: YoloConfig):
        super().__init__()
        ch, n2, c3k = cfg.ch, cfg.rep(2), cfg.c3k_deep
        up = lambda: tn.Upsample(scale_factor=2, mode="nearest")
        self.model = tn.Sequential(
            TConv(3, ch(64), 3, 2),                                   # 0
            TConv(ch(64), ch(128), 3, 2),                             # 1
            TC3k2(ch(128), ch(256), n2, c3k, e=0.25),                 # 2
            TConv(ch(256), ch(256), 3, 2),                            # 3
            TC3k2(ch(256), ch(512), n2, c3k, e=0.25),                 # 4
            TConv(ch(512), ch(512), 3, 2),                            # 5
            TC3k2(ch(512), ch(512), n2, True),                        # 6
            TConv(ch(512), ch(1024), 3, 2),                           # 7
            TC3k2(ch(1024), ch(1024), n2, True),                      # 8
            TSPPF(ch(1024), ch(1024), 5),                             # 9
            TC2PSA(ch(1024), ch(1024), n2),                           # 10
            up(), TConcat(),                                          # 11,12
            TC3k2(ch(1024) + ch(512), ch(512), n2, c3k),              # 13
            up(), TConcat(),                                          # 14,15
            TC3k2(ch(512) + ch(512), ch(256), n2, c3k),               # 16
            TConv(ch(256), ch(256), 3, 2),                            # 17
            TConcat(),                                                # 18
            TC3k2(ch(256) + ch(512), ch(512), n2, c3k),               # 19
            TConv(ch(512), ch(512), 3, 2),                            # 20
            TConcat(),                                                # 21
            TC3k2(ch(512) + ch(1024), ch(1024), n2, True),            # 22
            TSegment(cfg.nc, (ch(256), ch(512), ch(1024)),
                     cfg.reg_max, cfg.nm, cfg.ch(cfg.npr)),           # 23
        )

    def forward(self, x):
        m = self.model
        y = m[1](m[0](x))
        y = m[3](m[2](y))
        p3b = m[4](y)
        p4b = m[6](m[5](p3b))
        y = m[8](m[7](p4b))
        p5b = m[10](m[9](y))
        n13 = m[13](m[12]([m[11](p5b), p4b]))
        p3 = m[16](m[15]([m[14](n13), p3b]))
        p4 = m[19](m[18]([m[17](p3), n13]))
        p5 = m[22](m[21]([m[20](p4), p5b]))
        return m[23]([p3, p4, p5])


# ------------------------------------------------------------------ tests


def _save_ckpt(tmp_path, module, **extra):
    path = tmp_path / "ckpt.pt"
    torch.save({"model": module, "ema": None,
                "train_args": {"nc": module_nc(module)}, **extra}, path)
    return path


def module_nc(m):
    return m.model[23].cv3[0][2].out_channels


class _Inner(tn.Module):  # module scope: torch.save pickles by reference
    def __init__(self):
        super().__init__()
        self.cv1 = tn.Conv2d(4, 8, 3, bias=False)
        self.bn = tn.BatchNorm2d(8)


class _Outer(tn.Module):
    def __init__(self):
        super().__init__()
        self.m0 = _Inner()
        self.up = tn.ConvTranspose2d(8, 4, 2, stride=2)
        self.lin = tn.Linear(3, 5)


def test_reader_bitwise_vs_torch_load(tmp_path):
    torch.manual_seed(0)
    m = _Outer().half()
    path = tmp_path / "fix.pt"
    torch.save({"model": m, "train_args": {"lr0": 0.01}}, path)

    sd, args = torch_pt.load_ultralytics_checkpoint(path)
    assert args == {"lr0": 0.01}
    ref = {k: v.numpy() for k, v in m.state_dict().items()}
    assert sorted(sd) == sorted(ref)
    for k in ref:
        assert sd[k].dtype == ref[k].dtype, k
        assert np.array_equal(sd[k], ref[k]), k


def test_reader_noncontiguous_tensor(tmp_path):
    # strided views exercise the offset/stride reconstruction
    t = torch.arange(24, dtype=torch.float32).reshape(4, 6)
    view = t[1:, ::2].t()
    path = tmp_path / "v.pt"
    torch.save({"v": view, "scalar": torch.tensor(3.5)}, path)
    sd = torch_pt.load_pt(path)
    assert np.array_equal(sd["v"], view.numpy())
    assert sd["scalar"].shape == () and float(sd["scalar"]) == 3.5


def test_full_import_same_nc(tmp_path):
    """nc=80 COCO-shaped checkpoint into an nc=80 model: every one of our
    leaves transfers; only dfl + num_batches_tracked go unused."""
    torch.manual_seed(1)
    cfg = YoloConfig(nc=80, scale="n")
    rep = TYolo11Seg(cfg).half()
    path = _save_ckpt(tmp_path, rep)

    import jax

    model, _ = create_model(nc=80, scale="n")
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32)
    )
    new, report = import_pt.load_pretrained(path, variables)
    assert report["unmapped_ours"] == []
    assert report["mismatched"] == []
    assert len(report["transferred"]) == report["total_ours"]
    leftovers = {
        k for k in report["unused_theirs"]
        if not k.endswith("num_batches_tracked")
    }
    assert leftovers == {"model.23.dfl.conv.weight"}
    assert report["train_args"]["nc"] == 80


def test_intersect_on_nc_mismatch(tmp_path):
    """COCO nc=80 weights into the experiment's nc=1 model: ultralytics'
    intersect-on-shape semantics — cls tower beyond the first DWConv
    keeps its fresh init (c3: 80 vs 64), everything else transfers."""
    torch.manual_seed(2)
    rep = TYolo11Seg(YoloConfig(nc=80, scale="n")).half()
    path = _save_ckpt(tmp_path, rep)

    import jax

    model, _ = create_model(nc=1, scale="n")
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32)
    )
    new, report = import_pt.load_pretrained(path, variables)
    assert report["unmapped_ours"] == []
    bad = [k for k in report["mismatched"]
           if not k.startswith("model.23.cv3.")]
    assert bad == []  # only the cls towers mismatch
    # the first DWConv of each cls tower is x->x: it must transfer
    for i in range(3):
        assert any(
            k.startswith(f"model.23.cv3.{i}.0.0.") for k in report["transferred"]
        )
    # class-head final bias keeps the detection prior init
    b = np.asarray(new["params"]["cls0_2"]["bias"])
    assert np.allclose(b, math.log(5 / 1 / (640 / 8) ** 2))


@pytest.mark.parametrize("scale", ["n"])
def test_forward_equivalence_full_model(tmp_path, scale):
    """Torch replica forward (NCHW) == our Flax forward (NHWC) with the
    imported weights — validates every transpose, the ConvTranspose
    flip, attention head layout, and BN mapping in one shot."""
    torch.manual_seed(3)
    cfg = YoloConfig(nc=1, scale=scale)
    rep = TYolo11Seg(cfg)

    # make BN stats non-trivial so the mapping of running_mean/var matters
    rep.train()
    with torch.no_grad():
        for _ in range(2):
            rep(torch.randn(2, 3, 64, 64))
    rep.eval()

    path = _save_ckpt(tmp_path, rep)  # f32: forward comparison is tight

    import jax

    model, _ = create_model(nc=1, scale=scale)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32)
    )
    new, report = import_pt.load_pretrained(path, variables)
    assert report["mismatched"] == []

    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref = rep(x)
    out = model.apply(
        {"params": new["params"], "batch_stats": new["batch_stats"]},
        np.asarray(x.numpy().transpose(0, 2, 3, 1)),
        train=False,
    )
    for key in ("box", "cls", "mcoef"):
        for lvl in range(3):
            a = np.asarray(out[key][lvl]).transpose(0, 3, 1, 2)
            b = ref[key][lvl].numpy()
            np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-3,
                                       err_msg=f"{key}[{lvl}]")
    np.testing.assert_allclose(
        np.asarray(out["proto"]).transpose(0, 3, 1, 2),
        ref["proto"].numpy(), atol=2e-4, rtol=1e-3,
    )


def test_init_train_state_pretrained(tmp_path):
    """cfg.pretrained warm-starts params AND ema through the normal
    trainer entry point."""
    torch.manual_seed(4)
    rep = TYolo11Seg(YoloConfig(nc=80, scale="n")).half()
    path = _save_ckpt(tmp_path, rep)

    from tpu_mslesseg.model.yolo11 import create_model as cm
    from tpu_mslesseg.train import trainer

    model, _ = cm(nc=1, scale="n")
    cfg = trainer.TrainConfig(
        epochs=1, batch_size=2, imgsz=64, pretrained=str(path)
    )
    state = trainer.init_train_state(model, cfg, steps_per_epoch=1)
    w = np.asarray(state.params["b0"]["conv"]["kernel"])
    ref = rep.model[0].conv.weight.detach().float().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(w, ref.astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(state.ema_params["b0"]["conv"]["kernel"]), w
    )
