import json
from pathlib import Path

import numpy as np
import pytest

from tpu_mslesseg.pipeline.labels import mask_to_polygons, trace_boundary, write_yolo_seg_label
from tpu_mslesseg.viz import overlay


def test_trace_boundary_square():
    m = np.zeros((10, 10), bool)
    m[2:6, 3:8] = True
    b = trace_boundary(m)
    assert len(b) >= 8
    rows = [p[0] for p in b]
    cols = [p[1] for p in b]
    assert min(rows) == 2 and max(rows) == 5
    assert min(cols) == 3 and max(cols) == 7
    # all boundary points are on the mask
    assert all(m[r, c] for r, c in b)


def test_mask_to_polygons_two_components():
    m = np.zeros((20, 20), np.uint8)
    m[2:6, 2:6] = 1
    m[12:18, 10:16] = 1
    polys = mask_to_polygons(m)
    assert len(polys) == 2


def test_write_yolo_seg_label(tmp_path):
    m = np.zeros((32, 64), np.uint8)
    m[10:20, 20:40] = 1
    out = tmp_path / "lbl.txt"
    write_yolo_seg_label(m, out)
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 1
    parts = lines[0].split()
    assert parts[0] == "0"
    xs = [float(v) for v in parts[1::2]]
    ys = [float(v) for v in parts[2::2]]
    # normalized by W=64 / H=32 and inside the box
    assert 20 / 64 <= min(xs) <= max(xs) <= 40 / 64
    assert 10 / 32 <= min(ys) <= max(ys) <= 20 / 32


def test_render_overlay_colors():
    img = np.full((8, 8), 100.0)
    pred = np.zeros((8, 8))
    gt = np.zeros((8, 8))
    pred[2, 2] = 1  # FP
    gt[3, 3] = 1  # FN
    pred[4, 4] = gt[4, 4] = 1  # TP
    frame = overlay.render_overlay(img, pred, gt)
    assert frame.shape == (8, 8, 3)
    # TP pixel dominated by green, FP by red, FN by blue
    assert frame[4, 4, 1] > frame[4, 4, 0] and frame[4, 4, 1] > frame[4, 4, 2]
    assert frame[2, 2, 0] > frame[2, 2, 2]
    assert frame[3, 3, 2] > frame[3, 3, 0]


def test_slice_dsc():
    a = np.zeros((4, 4))
    a[1:3, 1:3] = 1
    assert overlay.slice_dsc(a, a) == 1.0
    assert overlay.slice_dsc(a, np.zeros((4, 4))) == 0.0


def test_analizar_and_componer(tmp_path):
    from tpu_mslesseg.extras import analizar_pacientes_dsc as apd
    from tpu_mslesseg.extras import componer_resultados as cr

    root = tmp_path / "results"
    cfg = root / "Base" / "FLAIR_P50c_5folds_50epochs"
    for pid, d in (("P1", 0.8), ("P2", 0.3)):
        for plano, dd in (("axial", d), ("coronal", d - 0.1)):
            f = cfg / "fold1" / pid / f"{pid}_{plano}_results.json"
            f.parent.mkdir(parents=True, exist_ok=True)
            f.write_text(json.dumps({"DSC": dd, "AUC": 0.9, "Precision": 0.7, "Recall": 0.6}))
    # consensus must be excluded from best/worst
    fcons = cfg / "fold1" / "P2" / "P2_consenso_results.json"
    fcons.write_text(json.dumps({"DSC": 0.99}))

    res = apd.analizar_resultados(root)
    key = "Base/FLAIR_P50c_5folds_50epochs"
    assert res[key]["mejor"]["paciente"] == "P1"
    assert res[key]["mejor"]["DSC"] == 0.8
    assert res[key]["peor"]["paciente"] == "P2"

    # global jsons for the table
    for plano in ("axial", "consenso"):
        g = cfg / f"global_{plano}_results.json"
        g.write_text(json.dumps({m: {"media": 0.5, "std": 0.1} for m in
                                 ("DSC", "AUC", "Precision", "Recall")}))
    df = cr.componer_resultados(root)
    assert len(df) == 2
    assert df.iloc[0]["Plano"] == "Axial"  # axial ordered before consenso
    assert "±" in df.iloc[0]["DSC"]
