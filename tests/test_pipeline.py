"""End-to-end pipeline stage tests on a tiny synthetic dataset (CPU).

Covers the filesystem contract: extraction artifacts, prediction PNGs,
reconstruction NIfTIs, consensus volumes, metric JSONs, fold aggregation,
and the skip-if-exists resume semantics.
"""

import json
import os
from pathlib import Path

import jax
import numpy as np
import pytest

from tpu_mslesseg.io import nifti
from tpu_mslesseg.pipeline.modelo import Modelo
from tpu_mslesseg.pipeline.paciente import Paciente
from tpu_mslesseg.pipeline import paths as pp
from tpu_mslesseg.pipeline.stages import (
    eval as eval_stage,
    extraer_dataset,
    generar_consenso,
    promediar_folds,
    reconstruir_volumen,
)

SHAPE = (24, 28, 24)


@pytest.fixture(scope="module")
def experiment_dir(tmp_path_factory):
    """Synthetic MSLesSeg-Dataset + GT with 2 patients, cwd-chdir'd."""
    root = tmp_path_factory.mktemp("exp")
    rng = np.random.default_rng(0)
    ds = root / "MSLesSeg-Dataset" / "train"
    gt_root = root / "GT" / "train"
    for pid in ("P1", "P2"):
        vol = rng.normal(1000, 200, SHAPE).astype(np.float32)
        mask = np.zeros(SHAPE, np.float32)
        mask[8:14, 10:18, 6:18] = 1  # one lesion block spanning slices
        pdir = ds / pid / "T1"
        nifti.save(vol, np.eye(4), pdir / f"{pid}_T1_FLAIR.nii.gz")
        nifti.save(vol * 0.8, np.eye(4), pdir / f"{pid}_T1_T1.nii.gz")
        nifti.save(mask, np.eye(4), pdir / f"{pid}_T1_MASK.nii.gz")
        nifti.save(mask.astype(np.uint8), np.eye(4), gt_root / pid / f"{pid}_MASK.nii.gz")
    old = os.getcwd()
    os.chdir(root)
    yield root
    os.chdir(old)


@pytest.fixture(scope="module")
def modelo():
    return Modelo(plano="axial", num_cortes=8, modalidad=["FLAIR"], k_folds=2, mejora=None)


def test_extraction_stage(experiment_dir, modelo):
    res = extraer_dataset.ejecutar_dataset_pipeline(modelo, k_folds=2)
    assert res is True
    # P1 -> fold 1, P2 -> fold 1 (IDs 1-27 in fold1 of 2 folds)
    d = Path("datasets") / modelo.base_path / "fold1" / "P1" / "axial"
    imgs = list((d / "images").glob("*.png"))
    masks = list((d / "GT_masks").glob("*.png"))
    labels = list((d / "labels").glob("*.txt"))
    assert len(imgs) == len(masks) == len(labels) > 0
    # mask PNGs binary {0,1}; labels have polygon rows
    from PIL import Image

    m = np.array(Image.open(masks[0]))
    assert set(np.unique(m)) <= {0, 1}
    text = labels[0].read_text().strip()
    assert text.startswith("0 ")
    coords = [float(x) for x in text.split()[1:]]
    assert len(coords) >= 6 and all(0 <= c <= 1 for c in coords)

    # skip-if-exists resume
    res2 = extraer_dataset.ejecutar_dataset_pipeline(modelo, k_folds=2)
    assert res2 is None


def test_prediction_recon_eval_stages(experiment_dir, modelo):
    """Random-weight checkpoint -> predictions -> volumes -> metrics."""
    os.environ["TPU_MSLESSEG_IMGSZ"] = "96"
    try:
        import jax.numpy as jnp

        from tpu_mslesseg.model.yolo11 import create_model
        from tpu_mslesseg.train import checkpoint as ckpt_mod
        from tpu_mslesseg.pipeline.stages import generar_predicciones

        # fake trained checkpoint
        cfg_train = pp.ConfigTrain(modelo=modelo, epochs=1, fold_test=1, root=Path.cwd())
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

        ckpt_mod.save_checkpoint(cfg_train.weights_dir / "best.ckpt", FakeState)

        config = pp.ConfigPred(
            modelo=modelo, epochs=1, k_folds=2, fold_test=1, root=Path.cwd()
        )
        res = generar_predicciones.ejecutar_flujo_pred(config)
        assert res in (True, "parcial")
        pred_dir = Path("datasets") / modelo.base_path / "fold1" / "P1" / "axial" / "pred_masks"
        preds = list(pred_dir.glob("*.png"))
        assert len(preds) > 0
        # filename contract (reference `generar_prediccion_2D` naming):
        # <paciente>_<modalidad>_<corte>.png — reconstruction and the viz
        # extras parse these names
        import re

        for f in preds:
            assert re.fullmatch(r"P1_FLAIR_\d+\.png", f.name), f.name

        # second run skips
        assert generar_predicciones.ejecutar_flujo_pred(config) is None

        # reconstruction
        config_rv = pp.ConfigRecVol(
            modelo=modelo, epochs=1, k_folds=2, fold_test=1, root=Path.cwd()
        )
        res = reconstruir_volumen.ejecutar_flujo_recvol(config_rv)
        vol_path = config_rv.vol_path("P1")
        assert vol_path.exists()
        img = nifti.load(vol_path)
        assert img.shape == SHAPE

        # evaluation (random weights -> empty preds -> DSC 0, AUC defined)
        config_ev = pp.ConfigEval(
            modelo=modelo, epochs=1, k_folds=2, fold_test=1, root=Path.cwd()
        )
        eval_stage.ejecutar_flujo_eval(config_ev)
        fold_json = config_ev.results_fold_json
        assert fold_json.exists()
        stats = json.loads(fold_json.read_text())
        assert set(stats) == {"DSC", "AUC", "Precision", "Recall"}
        assert "media" in stats["DSC"] and "std" in stats["DSC"]
    finally:
        os.environ.pop("TPU_MSLESSEG_IMGSZ", None)


def test_consensus_and_aggregation(experiment_dir, modelo):
    """Fake three plane volumes -> consensus + global aggregation."""
    rng = np.random.default_rng(1)
    config = pp.ConfigConsenso(
        modelo=modelo, epochs=1, k_folds=2, fold_test=1, umbral=2, root=Path.cwd()
    )
    vol = (rng.random(SHAPE) > 0.5).astype(np.float32)
    for pid in ("P1", "P2"):
        for plano in ("axial", "coronal", "sagital"):
            p = config.pred_vols_fold_dir / pid / f"{pid}_{plano}.nii.gz"
            if not p.exists():
                nifti.save(vol, np.eye(4), p)
    res = generar_consenso.ejecutar_flujo_consenso(config)
    cons = nifti.load(config.consenso_path("P1")).get_fdata()
    np.testing.assert_array_equal(cons, vol)  # identical planes -> identity
    assert generar_consenso.ejecutar_flujo_consenso(config) is None  # skip

    # eval consensus for both folds... fold2 has no patients; aggregate on fold1 only
    for k in (1,):
        ev = pp.ConfigEval(
            modelo=modelo, epochs=1, k_folds=2, fold_test=k,
            plano_forzado="consenso", root=Path.cwd(),
        )
        eval_stage.ejecutar_flujo_eval(ev)

    # aggregation requires all k folds; simulate fold2 json
    ev1 = pp.ConfigEval(
        modelo=modelo, epochs=1, k_folds=2, fold_test=1,
        plano_forzado="consenso", root=Path.cwd(),
    )
    fold2_json = ev1.config_dir / "fold2" / "fold2_consenso_results.json"
    fold2_json.parent.mkdir(parents=True, exist_ok=True)
    fold2_json.write_text(json.dumps(json.loads(ev1.results_fold_json.read_text())))

    res = promediar_folds.ejecutar_flujo_promediar(ev1)
    assert res is not None
    g = json.loads(ev1.global_json.read_text())
    assert "DSC" in g and "media" in g["DSC"]
    assert promediar_folds.ejecutar_flujo_promediar(ev1) is None  # skip


def test_dataset_yaml_artifact(tmp_path):
    """Per-fold dataset YAML (reference train.py:317-344 archives
    <model_string>.yaml in the fold dir; same keys)."""
    import yaml

    from tpu_mslesseg.pipeline.modelo import Modelo
    from tpu_mslesseg.pipeline.stages.train import _escribir_dataset_yaml

    modelo = Modelo(
        plano="axial", num_cortes=6, modalidad=["FLAIR"], k_folds=2, mejora=None
    )
    _escribir_dataset_yaml(
        tmp_path, modelo, tmp_path / "ds", ["P1", "P2", "P30"], 1, 2
    )
    files = list(tmp_path.glob("*.yaml"))
    assert len(files) == 1 and files[0].name == f"{modelo.model_string}.yaml"
    d = yaml.safe_load(files[0].read_text())
    assert set(d) == {"path", "train", "val", "names", "nc"}
    assert d["nc"] == 1 and d["names"] == ["lesion"]
    assert set(d["train"]) | set(d["val"]) == {"P1", "P2", "P30"}
    assert not set(d["train"]) & set(d["val"])
