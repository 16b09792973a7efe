"""Byte-faithful ultralytics checkpoint fixtures (VERDICT r4 missing #2).

`tests/test_torch_pt.py` pins the torch-free reader against real
``torch.save`` zips, but its pickle streams name replica classes defined
in the test file. The actual ``yolo11n-seg.pt`` the reference warm-starts
from (``configs/ConfigTrain.py:139``) pickles an
``ultralytics.nn.tasks.SegmentationModel`` object graph: real class
paths, ``_non_persistent_buffers_set`` on every module, ``train_args``,
``ema``/``epoch``/``best_fitness`` keys in strip_optimizer's layout, and
fp16 storages. These tests build THAT file byte-faithfully:

* fake ``ultralytics.*`` modules are registered in ``sys.modules`` and
  the replica module tree is re-classed onto types whose
  ``__module__``/``__qualname__`` are the real ultralytics paths, so
  ``torch.save`` pickles the genuine class-path layout (asserted on the
  raw ``data.pkl`` bytes);
* the checkpoint dict mirrors ``ultralytics.utils.torch_utils
  .strip_optimizer`` output: epoch=-1, best_fitness=None, model (half),
  ema=None, updates=None, optimizer=None, train_args dict, date/version
  metadata;
* the restricted unpickler + ``load_pretrained`` then run end-to-end on
  it, pinned bitwise against torch's own ``state_dict()``.
"""

from __future__ import annotations

import sys
import types
import zipfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")
tn = torch.nn

from tests import test_torch_pt as rep  # the replica module tree
from tpu_mslesseg.io import torch_pt
from tpu_mslesseg.model import import_pt
from tpu_mslesseg.model.yolo11 import YoloConfig, create_model

# real ultralytics class paths for every replica class (the pip package's
# layout, ultralytics==8.3.x — the reference's pinned engine)
_ULTRA_PATHS = {
    rep.TConv: ("ultralytics.nn.modules.conv", "Conv"),
    rep.TDWConv: ("ultralytics.nn.modules.conv", "DWConv"),
    rep.TConcat: ("ultralytics.nn.modules.conv", "Concat"),
    rep.TBottleneck: ("ultralytics.nn.modules.block", "Bottleneck"),
    rep.TC3k: ("ultralytics.nn.modules.block", "C3k"),
    rep.TC3k2: ("ultralytics.nn.modules.block", "C3k2"),
    rep.TSPPF: ("ultralytics.nn.modules.block", "SPPF"),
    rep.TAttention: ("ultralytics.nn.modules.block", "Attention"),
    rep.TPSABlock: ("ultralytics.nn.modules.block", "PSABlock"),
    rep.TC2PSA: ("ultralytics.nn.modules.block", "C2PSA"),
    rep.TProto: ("ultralytics.nn.modules.block", "Proto"),
    rep.TDFL: ("ultralytics.nn.modules.block", "DFL"),
    rep.TSegment: ("ultralytics.nn.modules.head", "Segment"),
    rep.TYolo11Seg: ("ultralytics.nn.tasks", "SegmentationModel"),
}

# representative slice of the real yolo11n-seg.pt train_args (COCO run)
TRAIN_ARGS = {
    "task": "segment", "mode": "train", "model": "yolo11n-seg.yaml",
    "data": "coco.yaml", "epochs": 500, "batch": 16, "imgsz": 640,
    "optimizer": "auto", "seed": 0, "deterministic": True, "lr0": 0.01,
    "lrf": 0.01, "momentum": 0.937, "weight_decay": 0.0005, "nbs": 64,
    "box": 7.5, "cls": 0.5, "dfl": 1.5, "overlap_mask": True,
}


@pytest.fixture
def ultra_modules(monkeypatch):
    """Register fake ``ultralytics.*`` modules in sys.modules and return
    {replica class -> ultralytics-pathed subclass}. pickle saves classes
    by reference (module + qualname) and VERIFIES the lookup, so the
    paths must resolve at save time; teardown removes every entry so no
    other test (e.g. bench's ``import ultralytics`` probe) sees them."""
    mods = {}
    for name in (
        "ultralytics", "ultralytics.nn", "ultralytics.nn.tasks",
        "ultralytics.nn.modules", "ultralytics.nn.modules.conv",
        "ultralytics.nn.modules.block", "ultralytics.nn.modules.head",
        "ultralytics.utils",
    ):
        m = types.ModuleType(name)
        mods[name] = m
        monkeypatch.setitem(sys.modules, name, m)
        parent, _, child = name.rpartition(".")
        if parent:
            setattr(mods[parent], child, m)

    classmap = {}
    for base, (module, qualname) in _ULTRA_PATHS.items():
        cls = type(qualname, (base,), {"__module__": module})
        setattr(mods[module], qualname, cls)
        classmap[base] = cls

    class IterableSimpleNamespace(types.SimpleNamespace):
        __module__ = "ultralytics.utils"
        __qualname__ = "IterableSimpleNamespace"

    mods["ultralytics.utils"].IterableSimpleNamespace = IterableSimpleNamespace
    classmap["args_ns"] = IterableSimpleNamespace
    return classmap


def _build_ultra_model(classmap, nc=80, seed=7):
    """Replica tree re-classed onto the ultralytics paths, with the
    attribute surface a real SegmentationModel carries when saved."""
    torch.manual_seed(seed)
    model = rep.TYolo11Seg(YoloConfig(nc=nc, scale="n"))
    # non-trivial BN stats so running_mean/var mapping matters
    model.train()
    with torch.no_grad():
        for _ in range(2):
            model(torch.randn(2, 3, 64, 64))
    model.eval()
    for m in model.modules():
        if type(m) in classmap:
            m.__class__ = classmap[type(m)]
    model.__class__ = classmap[rep.TYolo11Seg]
    # real SegmentationModel attribute surface (BaseModel + trainer)
    model.yaml = {"nc": nc, "scale": "n", "yaml_file": "yolo11n-seg.yaml"}
    model.names = {i: str(i) for i in range(nc)}
    model.stride = torch.tensor([8.0, 16.0, 32.0])
    model.task = "segment"
    model.inplace = True
    model.end2end = False
    model.save = [4, 6, 10, 13, 16, 19, 22]
    model.args = classmap["args_ns"](**TRAIN_ARGS)
    return model


def _save_strip_optimizer_ckpt(path, model, ema=None):
    """The exact dict layout ultralytics' strip_optimizer leaves in
    best.pt / the released yolo11n-seg.pt."""
    torch.save({
        "epoch": -1,
        "best_fitness": None,
        "model": model.half(),
        "ema": None if ema is None else ema.half(),
        "updates": None,
        "optimizer": None,
        "scaler": None,
        "train_args": dict(TRAIN_ARGS),
        "train_metrics": {"fitness": 0.39},
        "train_results": None,
        "date": "2024-09-27T00:00:00.000000",
        "version": "8.3.70",
        "license": "AGPL-3.0 License (https://ultralytics.com/license)",
        "docs": "https://docs.ultralytics.com",
    }, path)


def test_pickle_stream_names_real_class_paths(ultra_modules, tmp_path):
    """The fixture's data.pkl carries the genuine ultralytics module
    paths — and nothing pointing back at this test file."""
    path = tmp_path / "yolo11n-seg.pt"
    _save_strip_optimizer_ckpt(path, _build_ultra_model(ultra_modules))
    with zipfile.ZipFile(path) as zf:
        pkl_name = [n for n in zf.namelist() if n.endswith("data.pkl")][0]
        raw = zf.read(pkl_name)
    for needle in (
        b"ultralytics.nn.tasks", b"SegmentationModel",
        b"ultralytics.nn.modules.conv", b"ultralytics.nn.modules.block",
        b"ultralytics.nn.modules.head", b"IterableSimpleNamespace",
        b"_non_persistent_buffers_set", b"train_args", b"HalfStorage",
    ):
        assert needle in raw, needle
    assert b"test_torch_pt" not in raw  # no replica-module leakage


def test_reader_bitwise_on_ultralytics_graph(ultra_modules, tmp_path):
    model = _build_ultra_model(ultra_modules)
    path = tmp_path / "yolo11n-seg.pt"
    _save_strip_optimizer_ckpt(path, model)

    sd, args = torch_pt.load_ultralytics_checkpoint(path)
    assert args == TRAIN_ARGS
    ref = {k: v.numpy() for k, v in model.state_dict().items()}
    assert set(sd) == set(ref)
    assert "model.0.conv.weight" in sd  # the real dotted naming
    assert "model.23.proto.upsample.weight" in sd
    for k in ref:
        assert sd[k].dtype == ref[k].dtype, k  # fp16 storages
        np.testing.assert_array_equal(sd[k], ref[k], err_msg=k)


def test_ema_graph_preferred_over_model(ultra_modules, tmp_path):
    """Mid-training last.pt keeps a live EMA module — the importer must
    deploy it, like ultralytics does (``attempt_load_one_weight``)."""
    model = _build_ultra_model(ultra_modules, seed=7)
    ema = _build_ultra_model(ultra_modules, seed=8)
    path = tmp_path / "last.pt"
    _save_strip_optimizer_ckpt(path, model, ema=ema)

    sd, _ = torch_pt.load_ultralytics_checkpoint(path)
    ref = {k: v.numpy() for k, v in ema.state_dict().items()}
    np.testing.assert_array_equal(
        sd["model.0.conv.weight"], ref["model.0.conv.weight"]
    )


def test_non_persistent_buffers_excluded(tmp_path):
    """torch's state_dict drops buffers registered persistent=False;
    the stub walk must honor the pickled _non_persistent_buffers_set."""
    m = tn.BatchNorm2d(4)
    m.register_buffer("npb", torch.zeros(3), persistent=False)
    path = tmp_path / "m.pt"
    torch.save({"model": m, "train_args": {}}, path)

    sd, _ = torch_pt.load_ultralytics_checkpoint(path)
    assert set(sd) == set(k for k, _ in m.state_dict().items())
    assert "npb" not in sd


def test_load_pretrained_end_to_end_nc_mismatch(ultra_modules, tmp_path):
    """The full COCO->lesion warm start on the byte-faithful fixture:
    nc=80 checkpoint into the nc=1 Flax tree — intersect-on-shape keeps
    every backbone/neck/proto leaf, drops only the cls-head finals."""
    model = _build_ultra_model(ultra_modules, nc=80)
    path = tmp_path / "yolo11n-seg.pt"
    _save_strip_optimizer_ckpt(path, model)

    import jax

    flax_model, _ = create_model(nc=1, scale="n")
    variables = flax_model.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32)
    )
    new, report = import_pt.load_pretrained(path, variables)
    # the only shape mismatches are the nc-dependent cls-branch finals
    assert report["mismatched"], "nc 80->1 must mismatch the cls finals"
    assert all("cv3" in k for k in report["mismatched"]), report["mismatched"]
    assert report["transferred"]
    w = np.asarray(new["params"]["b0"]["conv"]["kernel"])
    ref = (
        model.model[0].conv.weight.detach().float().numpy()
        .transpose(2, 3, 1, 0)
    )
    np.testing.assert_array_equal(w, ref.astype(np.float32))
    # BN running stats landed too (half -> f32)
    bs = np.asarray(new["batch_stats"]["b0"]["bn"]["mean"])
    np.testing.assert_array_equal(
        bs, model.model[0].bn.running_mean.detach().float().numpy()
    )
