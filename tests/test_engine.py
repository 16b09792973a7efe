"""Fold-training engine on a tiny synthetic dataset (CPU): results.csv,
checkpoints, resume, success criterion."""

import csv
import os
from pathlib import Path

import numpy as np
import pytest

from tpu_mslesseg.io import nifti
from tpu_mslesseg.model.yolo11 import create_model
from tpu_mslesseg.train import engine
from tpu_mslesseg.train.trainer import TrainConfig


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("engine_ds")
    rng = np.random.default_rng(0)
    shape = (24, 28, 24)
    ds = root / "MSLesSeg-Dataset" / "train"
    for pid in ("P1", "P2", "P30"):
        vol = rng.normal(800, 150, shape).astype(np.float32)
        mask = np.zeros(shape, np.float32)
        mask[6:14, 8:18, 4:20] = 1
        nifti.save(vol, np.eye(4), ds / pid / "T1" / f"{pid}_T1_FLAIR.nii.gz")
        nifti.save(mask, np.eye(4), ds / pid / "T1" / f"{pid}_T1_MASK.nii.gz")
    return ds


def test_train_fold_end_to_end(synth_dataset, tmp_path):
    out = tmp_path / "fold1"
    cfg = TrainConfig(epochs=2, batch_size=4, imgsz=64, max_fg=8, close_mosaic=1)
    model, _ = create_model(nc=1, scale="n")
    # P1,P2 -> fold1 (test); P30 -> fold3 of 5... with k_folds=2: P1..P27
    # fold1, P28..P53 fold2 => train=[P30], test=[P1,P2]
    summary = engine.train_fold(
        model=model, fold_test=1, patients=["P1", "P2", "P30"], plano="axial",
        modalidades=["FLAIR"], mejora=None, num_cortes=6,
        dataset_dir=synth_dataset, output_dir=out, cfg=cfg, k_folds=2,
    )
    assert engine.entrenamiento_exitoso(out)
    assert summary["train_slices"] > 0 and summary["val_slices"] > 0
    # visual artifacts next to results.csv (reference run-dir parity)
    for f in ("results.png", "BoxPR_curve.png", "MaskF1_curve.png",
              "confusion_matrix.png", "train_batch0.jpg", "labels.jpg",
              "val_batch0_labels.jpg", "val_batch0_pred.jpg"):
        assert (out / f).exists(), f

    with open(out / "results.csv") as f:
        rows = list(csv.reader(f))
    assert rows[0][0] == "epoch"
    assert len(rows) == 3  # header + 2 epochs
    assert all(len(r) == len(rows[0]) for r in rows[1:])
    # losses are finite numbers
    for r in rows[1:]:
        for v in r[2:6]:
            assert np.isfinite(float(v))


def test_train_fold_resume(synth_dataset, tmp_path):
    out = tmp_path / "foldr"
    cfg = TrainConfig(epochs=10, batch_size=4, imgsz=64, max_fg=8, close_mosaic=1)
    model, _ = create_model(nc=1, scale="n")
    common = dict(
        model=model, fold_test=1, patients=["P1", "P2", "P30"], plano="axial",
        modalidades=["FLAIR"], mejora=None, num_cortes=6,
        dataset_dir=synth_dataset, output_dir=out, k_folds=2, val_every=10,
    )
    engine.train_fold(cfg=cfg, **common)
    # resume run should start past epoch 10 and finish immediately
    cfg2 = TrainConfig(epochs=10, batch_size=4, imgsz=64, max_fg=8, close_mosaic=1)
    summary = engine.train_fold(cfg=cfg2, **common)
    assert engine.entrenamiento_exitoso(out)


def test_patience_and_save_period(synth_dataset, tmp_path, monkeypatch):
    """Upstream EarlyStopping + save_period semantics (args.yaml:7,10):
    training breaks once `patience` epochs pass without a fitness
    improvement, and weights/epoch<N>.ckpt snapshots appear every
    save_period epochs. Validation is stubbed with a declining fitness so
    the stop point is deterministic."""
    import json

    from tpu_mslesseg.train import checkpoint, validate as tval

    fits = [0.5, 0.4, 0.3, 0.2, 0.1, 0.1, 0.1, 0.1]
    calls = []

    def fake_run_validation(*a, **kw):
        m = {"map50_m": fits[len(calls)], "map_m": fits[len(calls)]}
        calls.append(1)
        out = (m, {"box": 0.0, "seg": 0.0, "cls": 0.0, "dfl": 0.0})
        return out + ((None,) if kw.get("return_acc") else ())

    monkeypatch.setattr(tval, "run_validation", fake_run_validation)

    out = tmp_path / "foldp"
    cfg = TrainConfig(epochs=8, batch_size=4, imgsz=64, max_fg=8,
                      close_mosaic=0, patience=3, save_period=2, plots=False)
    model, _ = create_model(nc=1, scale="n")
    engine.train_fold(
        model=model, fold_test=1, patients=["P1", "P2", "P30"], plano="axial",
        modalidades=["FLAIR"], mejora=None, num_cortes=6,
        dataset_dir=synth_dataset, output_dir=out, cfg=cfg, k_folds=2,
    )
    with open(out / "results.csv") as f:
        rows = list(csv.reader(f))
    # best fitness at epoch 1 -> stop at epoch 1 + patience = 4
    assert [r[0] for r in rows[1:]] == ["1", "2", "3", "4"]
    w = out / "weights"
    assert checkpoint.checkpoint_exists(w / "best.ckpt")
    assert checkpoint.checkpoint_exists(w / "last.ckpt")  # saved at the break
    # periodic snapshots at epochs 2 and 4, none past the stop
    assert checkpoint.checkpoint_exists(w / "epoch2.ckpt")
    assert checkpoint.checkpoint_exists(w / "epoch4.ckpt")
    assert not checkpoint.checkpoint_exists(w / "epoch6.ckpt")
    note = json.loads((w / "fitness.json").read_text())
    assert note["best_epoch"] == 1
    assert abs(note["best_fitness"] - 0.5) < 1e-9


def test_patience_counter_survives_resume(synth_dataset, tmp_path, monkeypatch):
    """The stopper state is reconstructed on resume from the persisted
    best_epoch: a plateau that began before the interruption counts, so
    the resumed run stops immediately instead of re-earning the patience."""
    from tpu_mslesseg.train import validate as tval

    calls = []

    def fake_run_validation(*a, **kw):
        # epoch 1 improves (first val beats best_fit=-1), then plateau
        m = {"map50_m": 0.5 if not calls else 0.1,
             "map_m": 0.5 if not calls else 0.1}
        calls.append(1)
        out = (m, {"box": 0.0, "seg": 0.0, "cls": 0.0, "dfl": 0.0})
        return out + ((None,) if kw.get("return_acc") else ())

    monkeypatch.setattr(tval, "run_validation", fake_run_validation)

    out = tmp_path / "foldpr"
    model, _ = create_model(nc=1, scale="n")
    common = dict(
        model=model, fold_test=1, patients=["P1", "P2", "P30"], plano="axial",
        modalidades=["FLAIR"], mejora=None, num_cortes=6,
        dataset_dir=synth_dataset, output_dir=out, k_folds=2,
    )
    # phase 1: patience high enough not to fire; 10 epochs (checkpointed)
    cfg = TrainConfig(epochs=10, batch_size=4, imgsz=64, max_fg=8,
                      close_mosaic=0, patience=100, plots=False)
    engine.train_fold(cfg=cfg, **common)
    # phase 2: resume at epoch 11 with patience=3 — best_epoch=1 persisted,
    # so vals_since_best reconstructs to 9 >= 3 and epoch 11 stops at once
    cfg2 = TrainConfig(epochs=20, batch_size=4, imgsz=64, max_fg=8,
                       close_mosaic=0, patience=3, plots=False)
    summary = engine.train_fold(cfg=cfg2, **common)
    assert summary["epochs"] == 11
    with open(out / "results.csv") as f:
        rows = list(csv.reader(f))
    assert [r[0] for r in rows[1:]] == [str(e) for e in range(1, 12)]
