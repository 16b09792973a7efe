"""Patient-mode fast path == the stage chain, artifact by artifact.

VERDICT r2 next #6: `--rapido` must make the fused ~3100 slices/s program
a product feature with artifact parity. Here the same synthetic patient
runs (a) the per-stage chain (predictions -> reconstruction -> eval) for
each plane, and (b) the fused fast path once — volumes must match
bitwise and metrics JSONs must be equal.
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

import jax

from tpu_mslesseg.io import nifti
from tpu_mslesseg.pipeline import ejecutar_pipeline as orch
from tpu_mslesseg.pipeline import paths as pp
from tpu_mslesseg.pipeline.modelo import Modelo
from tpu_mslesseg.pipeline.paciente import Paciente

SHAPE = (24, 28, 24)
PLANES = ("axial", "coronal", "sagital")
EPOCHS = 1
PID = "P1"  # fold 1 of 2


def _modelo(plano):
    return Modelo(
        plano=plano, num_cortes=6, modalidad=["FLAIR"], k_folds=2, mejora="GC"
    )


def _paciente(plano):
    return Paciente(
        id=PID, plano=plano, modalidad=["FLAIR"], mejora="GC",
        dataset_dir="MSLesSeg-Dataset/train",
    )


@pytest.fixture(scope="module")
def patient_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("rapido")
    rng = np.random.default_rng(1)
    ds = root / "MSLesSeg-Dataset" / "train"
    gt_root = root / "GT" / "train"
    vol = rng.normal(1000, 200, SHAPE).astype(np.float32)
    mask = np.zeros(SHAPE, np.float32)
    mask[8:14, 10:18, 6:18] = 1
    pdir = ds / PID / "T1"
    nifti.save(vol, np.eye(4), pdir / f"{PID}_T1_FLAIR.nii.gz")
    nifti.save(mask, np.eye(4), pdir / f"{PID}_T1_MASK.nii.gz")
    nifti.save(mask.astype(np.uint8), np.eye(4), gt_root / PID / f"{PID}_MASK.nii.gz")

    old = os.getcwd()
    os.chdir(root)

    import jax.numpy as jnp

    from tpu_mslesseg.model.yolo11 import create_model
    from tpu_mslesseg.train import checkpoint as ckpt_mod

    model, _ = create_model(nc=1, scale="n")
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)), train=False
    )

    class FakeState:
        params = variables["params"]
        batch_stats = variables["batch_stats"]
        ema_params = variables["params"]
        step = np.int32(1)
        opt_state = ()

    for plano in PLANES:
        cfg = pp.ConfigTrain(
            modelo=_modelo(plano), epochs=EPOCHS, fold_test=1, root=root
        )
        ckpt_mod.save_checkpoint(cfg.weights_dir / "best.ckpt", FakeState)
        ckpt_mod.save_checkpoint(cfg.weights_dir / "last.ckpt", FakeState)
        (cfg.fold_dir / "results.csv").write_text("epoch\n1\n")

    os.environ["TPU_MSLESSEG_IMGSZ"] = "96"
    yield root
    os.environ.pop("TPU_MSLESSEG_IMGSZ", None)
    os.chdir(old)


@pytest.mark.slow
def test_rapido_matches_stage_chain(patient_dir):
    # (a) per-stage chain, patient mode, all three planes
    for plano in PLANES:
        orch.ejecutar_pipeline(_modelo(plano), epochs=EPOCHS, paciente=_paciente(plano))

    base = Path("pred_vols") / f"{_modelo('axial').base_path}_{EPOCHS}epochs" / "fold1"
    results = Path("results") / f"{_modelo('axial').base_path}_{EPOCHS}epochs" / "fold1"
    chain_vols, chain_mets = {}, {}
    for plano in PLANES:
        vp = base / PID / f"{PID}_{plano}.nii.gz"
        assert vp.exists()
        chain_vols[plano] = nifti.load(vp).get_fdata()
        rj = results / PID / f"{PID}_{plano}_results.json"
        assert rj.exists()
        chain_mets[plano] = json.loads(rj.read_text())

    # wipe the chain's volume/metric artifacts; keep stage-1 extraction
    import shutil

    shutil.rmtree(base)
    shutil.rmtree(results)

    # (b) the fused fast path (one program; consensus included since all
    # three planes have fold-1 weights)
    orch.ejecutar_pipeline(
        _modelo("axial"), epochs=EPOCHS, paciente=_paciente("axial"), rapido=True
    )

    for plano in PLANES:
        vol = nifti.load(base / PID / f"{PID}_{plano}.nii.gz").get_fdata()
        np.testing.assert_array_equal(vol, chain_vols[plano], err_msg=plano)
        met = json.loads((results / PID / f"{PID}_{plano}_results.json").read_text())
        assert met == chain_mets[plano], (plano, met, chain_mets[plano])

    # consensus artifacts (a superset of patient-mode chain output)
    cvol = base / PID / f"{PID}_consenso.nii.gz"
    assert cvol.exists()
    cons = nifti.load(cvol).get_fdata()
    votes = sum((chain_vols[p] > 0).astype(int) for p in PLANES)
    np.testing.assert_array_equal(cons > 0, votes >= 2)
    cmet = json.loads((results / PID / f"{PID}_consenso_results.json").read_text())
    assert set(cmet) == {"DSC", "AUC", "Precision", "Recall"}


@pytest.mark.slow
def test_rapido_falls_back_without_weights(patient_dir):
    """A missing trained model must return the chain path, not crash."""
    modelo = Modelo(
        plano="axial", num_cortes=6, modalidad=["FLAIR"], k_folds=2, mejora="LT"
    )  # LT experiment was never 'trained' in the fixture
    from tpu_mslesseg.pipeline import rapido as rapido_mod

    ok = rapido_mod.ejecutar_paciente_rapido(
        modelo, _paciente("axial"), epochs=EPOCHS, k_folds=2
    )
    assert ok is False


@pytest.mark.slow
def test_rapido_limpiar_and_pair_consistency(patient_dir):
    """--rapido --limpiar regenerates the artifacts it owns, an
    incomplete (volume, json) pair is rewritten WHOLE, and a complete
    run is a full skip (idempotence like the stage chain)."""
    from tpu_mslesseg.pipeline import rapido as rapido_mod

    modelo = _modelo("axial")
    base = Path("pred_vols") / f"{modelo.base_path}_{EPOCHS}epochs" / "fold1"
    results = Path("results") / f"{modelo.base_path}_{EPOCHS}epochs" / "fold1"
    vp = base / PID / f"{PID}_axial.nii.gz"
    rj = results / PID / f"{PID}_axial_results.json"

    ok = rapido_mod.ejecutar_paciente_rapido(
        modelo, _paciente("axial"), epochs=EPOCHS, k_folds=2
    )
    assert ok and vp.exists() and rj.exists()
    good_vol = nifti.load(vp).get_fdata()
    good_met = json.loads(rj.read_text())

    # (1) limpiar: plant a bogus volume; it must be REPLACED, not kept
    nifti.save(np.zeros_like(good_vol), np.eye(4), vp)
    ok = rapido_mod.ejecutar_paciente_rapido(
        modelo, _paciente("axial"), epochs=EPOCHS, k_folds=2, limpiar=True
    )
    assert ok
    np.testing.assert_array_equal(nifti.load(vp).get_fdata(), good_vol)

    # (2) incomplete pair: stale volume + missing json -> both rewritten
    nifti.save(np.zeros_like(good_vol), np.eye(4), vp)
    rj.unlink()
    ok = rapido_mod.ejecutar_paciente_rapido(
        modelo, _paciente("axial"), epochs=EPOCHS, k_folds=2
    )
    assert ok
    np.testing.assert_array_equal(nifti.load(vp).get_fdata(), good_vol)
    assert json.loads(rj.read_text()) == good_met

    # (3) complete pair: a second run keeps mtimes (full skip)
    m0 = (vp.stat().st_mtime_ns, rj.stat().st_mtime_ns)
    ok = rapido_mod.ejecutar_paciente_rapido(
        modelo, _paciente("axial"), epochs=EPOCHS, k_folds=2
    )
    assert ok
    assert (vp.stat().st_mtime_ns, rj.stat().st_mtime_ns) == m0
