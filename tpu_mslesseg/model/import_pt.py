"""Ultralytics ``yolo11*-seg.pt`` → Flax variables importer (torch-free).

The reference warm-starts from COCO-pretrained ``yolo11n-seg.pt``
(reference ``configs/ConfigTrain.py:139``; loaded via ``YOLO(weights)`` at
``utils/utils.py:232-238``; ``args.yaml: pretrained: true``). This module
gives the rebuild the same capability from an offline file: it reads the
checkpoint with :mod:`tpu_mslesseg.io.torch_pt` (no torch import) and
name-maps every torch parameter/buffer onto :func:`create_model`'s
params/batch_stats tree.

Name correspondence is mechanical because our module names mirror the
YOLO11 layer indices (``b0..b10`` = ``model.0..10``, ``h13/16/17/19/20/22``
= the neck layers, head branches = ``model.23.{cv2,cv3,cv4,proto}``).
Layout transforms (verified numerically vs torch in
tests/test_torch_pt.py):

* Conv2d weight ``(O, I/g, kh, kw)`` → flax kernel ``(kh, kw, I/g, O)``;
* ConvTranspose2d weight ``(I, O, kh, kw)`` → spatial flip then
  ``(kh, kw, I, O)`` (flax ``ConvTranspose`` does not mirror the kernel);
* BatchNorm weight/bias → ``bn.scale``/``bn.bias`` (params) and
  running_mean/running_var → ``bn.mean``/``bn.var`` (batch_stats).

Shape-mismatched entries (the ``nc``-dependent class-head finals when
fine-tuning COCO nc=80 → nc=1) keep their fresh initialization — the same
``intersect_dicts`` semantics ultralytics applies on ``pretrained=True``.
``model.23.dfl.conv.weight`` has no counterpart by design: our DFL
expectation is a fixed arange contraction inside the loss/decode, not a
stored conv (the torch buffer is frozen to the same arange).
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np

# our top-level module name -> torch prefix under the Sequential
_TOP = {
    **{f"b{i}": f"model.{i}" for i in range(11)},
    **{f"h{i}": f"model.{i}" for i in (13, 16, 17, 19, 20, 22)},
    "proto": "model.23.proto",
}
_HEAD_BRANCH = {"box": "cv2", "mc": "cv4"}
_CLS_SUFFIX = {"0dw": "0.0", "0pw": "0.1", "1dw": "1.0", "1pw": "1.1", "2": "2"}


def _top_prefix(name: str) -> str:
    if name in _TOP:
        return _TOP[name]
    m = re.fullmatch(r"(box|mc)(\d)_(\d)", name)
    if m:
        return f"model.23.{_HEAD_BRANCH[m.group(1)]}.{m.group(2)}.{m.group(3)}"
    m = re.fullmatch(r"cls(\d)_(\w+)", name)
    if m:
        return f"model.23.cv3.{m.group(1)}.{_CLS_SUFFIX[m.group(2)]}"
    raise KeyError(f"no torch mapping for top-level module {name!r}")


def _inner(component: str) -> str | None:
    """Torch name of one intermediate path component (None = drop)."""
    if component == "Conv_0":  # our DWConv wraps Conv; torch DWConv IS Conv
        return None
    m = re.fullmatch(r"m(\d+)", component)
    if m:
        return f"m.{m.group(1)}"
    if component == "ffn1":
        return "ffn.0"
    if component == "ffn2":
        return "ffn.1"
    return component  # cv1/cv2/cv3/attn/qkv/proj/pe/upsample/conv/bn


_LEAF = {
    ("params", "kernel"): "weight",
    ("params", "bias"): "bias",
    ("params", "scale"): "weight",  # bn
    ("batch_stats", "mean"): "running_mean",
    ("batch_stats", "var"): "running_var",
}


def torch_key(collection: str, path: Tuple[str, ...]) -> str:
    """Torch state_dict key for one leaf of our variables tree."""
    parts = [_top_prefix(path[0])]
    for comp in path[1:-1]:
        t = _inner(comp)
        if t is not None:
            parts.append(t)
    leaf = _LEAF.get((collection, path[-1]))
    if leaf is None:
        raise KeyError(f"unmapped leaf {collection}/{'/'.join(path)}")
    return ".".join(parts + [leaf])


def _transform(path: Tuple[str, ...], leaf: str, w: np.ndarray) -> np.ndarray:
    if leaf == "kernel":
        if w.ndim != 4:
            raise ValueError(f"{path}: kernel with ndim {w.ndim}")
        if "upsample" in path:  # ConvTranspose2d (I, O, kh, kw)
            return np.ascontiguousarray(
                w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
            )
        return np.ascontiguousarray(w.transpose(2, 3, 1, 0))
    return w


def map_state_dict(variables, sd: Dict[str, np.ndarray]):
    """Map a torch state_dict onto our variables tree.

    Returns ``(new_variables, report)`` where report has ``transferred``
    (list of torch keys used), ``mismatched`` (present but wrong shape —
    kept at init), ``unmapped_ours`` (our leaves with no torch key — empty
    by construction or a naming bug), and ``unused_theirs`` (torch keys
    never consumed, e.g. ``dfl`` and ``num_batches_tracked``).
    """
    import jax

    flat = {}
    for col in ("params", "batch_stats"):
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            variables[col]
        )[0]:
            names = tuple(p.key for p in path)
            flat[(col, names)] = leaf

    new = {col: jax.tree_util.tree_map(lambda x: x, variables[col])
           for col in variables}
    transferred: List[str] = []
    mismatched: List[str] = []
    unmapped: List[str] = []
    used = set()
    for (col, names), leaf in flat.items():
        try:
            tk = torch_key(col, names)
        except KeyError:
            unmapped.append(f"{col}/{'/'.join(names)}")
            continue
        w = sd.get(tk)
        if w is None:
            mismatched.append(tk + " (absent)")
            continue
        w = _transform(names, names[-1], np.asarray(w))
        # shape/dtype via attributes only — leaves may be device arrays
        # behind the TPU tunnel where any host fetch costs milliseconds
        if tuple(w.shape) != tuple(np.shape(leaf)):
            mismatched.append(
                f"{tk} {tuple(w.shape)} != {tuple(np.shape(leaf))}"
            )
            continue
        node = new[col]
        for n in names[:-1]:
            node = node[n]
        node[names[-1]] = np.asarray(w, dtype=leaf.dtype)
        transferred.append(tk)
        used.add(tk)
    report = {
        "transferred": transferred,
        "mismatched": mismatched,
        "unmapped_ours": unmapped,
        "unused_theirs": sorted(k for k in sd if k not in used),
        "total_ours": len(flat),
    }
    return new, report


def load_pretrained(path, variables):
    """Warm-start our variables from an ultralytics ``.pt`` on disk.

    Returns ``(new_variables, report)``; raises if the file maps to
    nothing (wrong architecture/scale)."""
    from tpu_mslesseg.io.torch_pt import load_ultralytics_checkpoint

    sd, train_args = load_ultralytics_checkpoint(path)
    new, report = map_state_dict(variables, sd)
    report["train_args"] = train_args
    if not report["transferred"]:
        raise ValueError(
            f"{path}: no parameter matched the model "
            f"(mismatched: {len(report['mismatched'])})"
        )
    return new, report
