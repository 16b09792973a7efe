"""ConfigEval.verificar_paths precondition parity (VERDICT r1 weak #9 /
next #10): the reference verifies inputs up front per mode
(ConfigEval.py:401-424) instead of failing mid-stage."""

import numpy as np
import pytest

from tpu_mslesseg.io import nifti
from tpu_mslesseg.pipeline.modelo import Modelo
from tpu_mslesseg.pipeline.paciente import Paciente
from tpu_mslesseg.pipeline.paths import ConfigEval


def _modelo():
    return Modelo(
        plano="axial", num_cortes=8, modalidad=["FLAIR"], k_folds=2, mejora=None
    )


def _vol(path):
    nifti.save(np.ones((4, 4, 4), np.float32), np.eye(4), path)


def _paciente(root):
    return Paciente(
        id="P1", plano="axial", modalidad=["FLAIR"],
        dataset_dir=root / "MSLesSeg-Dataset" / "train",
    )


def test_patient_mode_missing_gt_raises(tmp_path):
    cfg = ConfigEval(
        modelo=_modelo(), root=tmp_path, epochs=2, k_folds=2,
        paciente=_paciente(tmp_path),
    )
    with pytest.raises(FileNotFoundError, match="GT del paciente P1"):
        cfg.verificar_paths()


def test_patient_mode_missing_pred_raises(tmp_path):
    cfg = ConfigEval(
        modelo=_modelo(), root=tmp_path, epochs=2, k_folds=2,
        paciente=_paciente(tmp_path),
    )
    _vol(cfg.paths_paciente("P1")["gt_vol"])
    with pytest.raises(FileNotFoundError, match="predicción del paciente P1"):
        cfg.verificar_paths()


def test_patient_mode_complete_passes(tmp_path):
    cfg = ConfigEval(
        modelo=_modelo(), root=tmp_path, epochs=2, k_folds=2,
        paciente=_paciente(tmp_path),
    )
    p = cfg.paths_paciente("P1")
    _vol(p["gt_vol"])
    _vol(p["pred_vol"])
    cfg.verificar_paths()
    assert p["results_json"].parent.is_dir()


def test_fold_mode_missing_gt_for_present_patient_raises(tmp_path):
    cfg = ConfigEval(modelo=_modelo(), root=tmp_path, epochs=2, k_folds=2,
                     fold_test=1)
    _vol(cfg.paths_paciente("P1")["pred_vol"])  # patient dir exists, GT absent
    with pytest.raises(FileNotFoundError, match="ground truth del paciente P1"):
        cfg.verificar_paths()


def test_fold_mode_absent_dir_is_lenient(tmp_path):
    # warn-and-skip contract: a fold with no predictions yet must not
    # abort at the precondition; the stage warns downstream
    cfg = ConfigEval(modelo=_modelo(), root=tmp_path, epochs=2, k_folds=2,
                     fold_test=1)
    cfg.verificar_paths()
    assert cfg.results_fold_dir.is_dir()


def test_experiment_mode_lists_missing_folds(tmp_path):
    cfg = ConfigEval(modelo=_modelo(), root=tmp_path, epochs=2, k_folds=2)
    cfg.fold_jsons()[0].parent.mkdir(parents=True, exist_ok=True)
    cfg.fold_jsons()[0].write_text("{}")
    with pytest.raises(FileNotFoundError, match=r"\['fold2'\]"):
        cfg.verificar_paths()


def test_experiment_mode_complete_passes(tmp_path):
    cfg = ConfigEval(modelo=_modelo(), root=tmp_path, epochs=2, k_folds=2)
    for j in cfg.fold_jsons():
        j.parent.mkdir(parents=True, exist_ok=True)
        j.write_text("{}")
    cfg.verificar_paths()
