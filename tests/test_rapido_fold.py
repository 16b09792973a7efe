"""Full-mode fast path == the stage chain, fold-wide (VERDICT r3 #4).

``--completo --rapido`` serves each fold's patients 4 per fused dispatch
(the measured serving knee). Here three fold-1 patients run (a) the
per-stage chain — one full-pipeline invocation per plane, per-patient
programs — and (b) one ``--rapido`` invocation, which serves all three
patients in ONE lote program (the 4th batch slot pads by repeating the
last patient): volumes and metrics JSONs must match bitwise, and the
chain stages after the fast path must reduce to skips + the same fold
aggregate.
"""

import json
import os
import shutil
from pathlib import Path

import numpy as np
import pytest

import jax

from tpu_mslesseg.io import nifti
from tpu_mslesseg.pipeline import ejecutar_pipeline as orch
from tpu_mslesseg.pipeline import paths as pp
from tpu_mslesseg.pipeline.modelo import Modelo

SHAPE = (24, 28, 24)
PLANES = ("axial", "coronal", "sagital")
EPOCHS = 1
PIDS = ("P1", "P2", "P3")  # all fold 1 of 2 (array_split over IDs 1..53)


def _modelo(plano):
    return Modelo(
        plano=plano, num_cortes=6, modalidad=["FLAIR"], k_folds=2, mejora="GC"
    )


@pytest.fixture(scope="module")
def fold_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("rapido_fold")
    rng = np.random.default_rng(7)
    ds = root / "MSLesSeg-Dataset" / "train"
    gt_root = root / "GT" / "train"
    for i, pid in enumerate(PIDS):
        vol = rng.normal(1000, 200, SHAPE).astype(np.float32)
        mask = np.zeros(SHAPE, np.float32)
        mask[6 + i : 14, 8 + i : 18, 6 : 18 - i] = 1
        pdir = ds / pid / "T1"
        nifti.save(vol, np.eye(4), pdir / f"{pid}_T1_FLAIR.nii.gz")
        nifti.save(mask, np.eye(4), pdir / f"{pid}_T1_MASK.nii.gz")
        nifti.save(
            mask.astype(np.uint8), np.eye(4), gt_root / pid / f"{pid}_MASK.nii.gz"
        )

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
def test_fold_rapido_matches_stage_chain(fold_root):
    # (a) per-stage chain: one full-pipeline run per plane (the reference
    # experiment layout; consensus gate stays off — fold 2 has no data)
    for plano in PLANES:
        orch.ejecutar_pipeline(_modelo(plano), epochs=EPOCHS)

    base = Path("pred_vols") / f"{_modelo('axial').base_path}_{EPOCHS}epochs" / "fold1"
    results = Path("results") / f"{_modelo('axial').base_path}_{EPOCHS}epochs"
    chain_vols, chain_mets = {}, {}
    for pid in PIDS:
        for plano in PLANES:
            vp = base / pid / f"{pid}_{plano}.nii.gz"
            assert vp.exists(), vp
            chain_vols[(pid, plano)] = nifti.load(vp).get_fdata()
            rj = results / "fold1" / pid / f"{pid}_{plano}_results.json"
            chain_mets[(pid, plano)] = json.loads(rj.read_text())
    fold_json = results / "fold1" / "fold1_axial_results.json"
    assert fold_json.exists()
    chain_fold = json.loads(fold_json.read_text())

    # wipe everything downstream of extraction; keep weights + dataset
    shutil.rmtree(base)
    shutil.rmtree(results)

    # (b) ONE --completo --rapido invocation (axial experiment): all three
    # patients in one lote program, all planes' artifacts + consenso
    orch.ejecutar_pipeline(_modelo("axial"), epochs=EPOCHS, rapido=True)

    for pid in PIDS:
        for plano in PLANES:
            vol = nifti.load(base / pid / f"{pid}_{plano}.nii.gz").get_fdata()
            np.testing.assert_array_equal(
                vol, chain_vols[(pid, plano)], err_msg=f"{pid}/{plano}"
            )
            met = json.loads(
                (results / "fold1" / pid / f"{pid}_{plano}_results.json").read_text()
            )
            assert met == chain_mets[(pid, plano)], (pid, plano)
        # consenso artifacts: a superset of the single-plane chain run
        cvol = base / pid / f"{pid}_consenso.nii.gz"
        assert cvol.exists()
        votes = sum((chain_vols[(pid, p)] > 0).astype(int) for p in PLANES)
        np.testing.assert_array_equal(
            nifti.load(cvol).get_fdata() > 0, votes >= 2
        )
        cmet = json.loads(
            (results / "fold1" / pid / f"{pid}_consenso_results.json").read_text()
        )
        assert set(cmet) == {"DSC", "AUC", "Precision", "Recall"}

    # the chain's fold aggregate is rebuilt identically from the fast
    # path's per-patient JSONs
    assert json.loads(fold_json.read_text()) == chain_fold


@pytest.mark.slow
def test_fold_rapido_idempotent_and_fallback(fold_root):
    """A second --rapido run is a full skip; a fold missing extracted
    images falls back (returns False) instead of crashing."""
    from tpu_mslesseg.pipeline import rapido as rapido_mod

    modelo = _modelo("axial")
    base = Path("pred_vols") / f"{modelo.base_path}_{EPOCHS}epochs" / "fold1"
    probe = base / PIDS[0] / f"{PIDS[0]}_axial.nii.gz"
    m0 = probe.stat().st_mtime_ns
    ok = rapido_mod.ejecutar_fold_rapido(
        modelo, epochs=EPOCHS, k_folds=2, fold_test=1
    )
    assert ok
    assert probe.stat().st_mtime_ns == m0  # untouched: full skip

    ok = rapido_mod.ejecutar_fold_rapido(
        modelo, epochs=EPOCHS, k_folds=2, fold_test=2
    )
    assert ok is False  # fold 2 has no extracted patients
