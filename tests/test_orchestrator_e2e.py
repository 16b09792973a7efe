"""Orchestrator end-to-end (VERDICT r1 weak #8): drive
`ejecutar_pipeline.ejecutar_pipeline()` itself — not the stages one by
one — through all three planes on a synthetic 2-patient dataset with
random-weight checkpoints, asserting the consensus gate
(ejecutar_pipeline.py:136-160), the double eval (per-plane + consenso),
the full artifact tree, and the skip behavior of a second run.
"""

import json
import os
from pathlib import Path

import jax
import numpy as np
import pytest

from tpu_mslesseg.io import nifti
from tpu_mslesseg.pipeline import ejecutar_pipeline as orch
from tpu_mslesseg.pipeline import paths as pp
from tpu_mslesseg.pipeline.modelo import Modelo

SHAPE = (24, 28, 24)
PLANES = ("axial", "coronal", "sagital")
EPOCHS = 1


def _modelo(plano):
    return Modelo(
        plano=plano, num_cortes=6, modalidad=["FLAIR"], k_folds=2, mejora=None
    )


@pytest.fixture(scope="module")
def experiment_dir(tmp_path_factory):
    """2 patients spanning both folds (P1 -> fold1, P30 -> fold2), plus a
    random-weight 'trained' checkpoint for every plane x fold."""
    root = tmp_path_factory.mktemp("orch")
    rng = np.random.default_rng(0)
    ds = root / "MSLesSeg-Dataset" / "train"
    gt_root = root / "GT" / "train"
    for pid in ("P1", "P30"):
        vol = rng.normal(1000, 200, SHAPE).astype(np.float32)
        mask = np.zeros(SHAPE, np.float32)
        mask[8:14, 10:18, 6:18] = 1
        pdir = ds / pid / "T1"
        nifti.save(vol, np.eye(4), pdir / f"{pid}_T1_FLAIR.nii.gz")
        nifti.save(mask, np.eye(4), pdir / f"{pid}_T1_MASK.nii.gz")
        nifti.save(
            mask.astype(np.uint8), np.eye(4), gt_root / pid / f"{pid}_MASK.nii.gz"
        )

    old = os.getcwd()
    os.chdir(root)

    # plant random-weight checkpoints (the run uses --entrenar=False)
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
        for k in (1, 2):
            cfg = pp.ConfigTrain(
                modelo=_modelo(plano), epochs=EPOCHS, fold_test=k, root=root
            )
            ckpt_mod.save_checkpoint(cfg.weights_dir / "best.ckpt", FakeState)
            ckpt_mod.save_checkpoint(cfg.weights_dir / "last.ckpt", FakeState)
            (cfg.fold_dir / "results.csv").write_text("epoch\n1\n")

    os.environ["TPU_MSLESSEG_IMGSZ"] = "96"
    yield root
    os.environ.pop("TPU_MSLESSEG_IMGSZ", None)
    os.chdir(old)


def test_full_experiment_all_planes_consensus_and_aggregation(experiment_dir):
    # first two planes: consensus must stay gated (missing plane volumes)
    for plano in PLANES[:2]:
        orch.ejecutar_pipeline(_modelo(plano), epochs=EPOCHS)
        base = Path("pred_vols") / f"{_modelo(plano).base_path}_{EPOCHS}epochs"
        assert not list(base.rglob("*_consenso.nii.gz")), (
            "consensus must not run before all three planes exist"
        )

    # third plane completes the set -> consensus + consenso eval + both
    # aggregations fire inside THIS orchestrator call
    orch.ejecutar_pipeline(_modelo(PLANES[2]), epochs=EPOCHS)

    base = Path("pred_vols") / f"{_modelo('axial').base_path}_{EPOCHS}epochs"
    results = Path("results") / f"{_modelo('axial').base_path}_{EPOCHS}epochs"
    for k, pid in ((1, "P1"), (2, "P30")):
        for plano in PLANES:
            assert (base / f"fold{k}" / pid / f"{pid}_{plano}.nii.gz").exists()
        # consensus volume + its affine/shape
        cvol = base / f"fold{k}" / pid / f"{pid}_consenso.nii.gz"
        assert cvol.exists()
        assert nifti.load(cvol).shape == SHAPE
        # per-plane + consenso fold JSONs
        for plano in (*PLANES, "consenso"):
            fj = results / f"fold{k}" / f"fold{k}_{plano}_results.json"
            assert fj.exists(), fj
            stats = json.loads(fj.read_text())
            assert set(stats) == {"DSC", "AUC", "Precision", "Recall"}

    # global aggregation for the last plane AND the consensus
    for plano in ("sagital", "consenso"):
        gj = results / f"global_{plano}_results.json"
        assert gj.exists()
        g = json.loads(gj.read_text())
        assert "DSC" in g and "media" in g["DSC"]


def test_second_run_is_all_skips(experiment_dir):
    """Re-running the orchestrator must be an incremental no-op for every
    skip-stable artifact (filesystem-as-memo-table contract).

    Exception faithful to the reference: an all-empty prediction volume
    (random weights find nothing) is deliberately REBUILT on every run
    (reference reconstruir_volumen.py:240-257 rebuilds missing/empty/
    mismatched volumes), so plane volumes are asserted valid, not
    untouched."""
    base = Path("pred_vols") / f"{_modelo('axial').base_path}_{EPOCHS}epochs"
    results = Path("results") / f"{_modelo('axial').base_path}_{EPOCHS}epochs"
    ds = Path("datasets") / _modelo("axial").base_path
    tracked = [
        results / "fold1" / "fold1_axial_results.json",
        results / "fold1" / "fold1_consenso_results.json",
        results / "global_consenso_results.json",
        next((ds / "fold1" / "P1" / "axial" / "pred_masks").glob("*.png")),
    ]
    before = {p: p.stat().st_mtime_ns for p in tracked}
    orch.ejecutar_pipeline(_modelo("axial"), epochs=EPOCHS)
    for p, t in before.items():
        assert p.stat().st_mtime_ns == t, f"{p} was rewritten on a skip run"
    # the (empty) plane volume may be rebuilt but must stay shape-valid
    v = base / "fold1" / "P1" / "P1_axial.nii.gz"
    assert nifti.load(v).shape == SHAPE
