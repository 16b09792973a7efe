"""Patient-mode fast path: the fused consensus program as a product
feature (VERDICT r2 missing #4 / next #6).

The stage chain (``generar_predicciones`` -> ``reconstruir_volumen`` ->
``generar_consenso`` -> ``eval``) round-trips every intermediate through
PNG/NIfTI files and pays a dispatch per stage. This path runs the SAME
computation — enhancement, letterbox, per-plane forward with that plane's
trained fold weights, NMS, proto-mask union, per-modality mask union,
inverse-letterbox sampling, volume scatter, consensus vote, confusion
counts — as ONE fused XLA program (`infer.consensus3.ConsensusPredictor`,
the ~3100 slices/s/chip bench program), then writes the standard
artifacts:

* ``pred_vols/<base>_<E>epochs/fold<k>/<pid>/<pid>_<plano>.nii.gz``
* ``..._consenso.nii.gz``           (when all three planes have weights)
* ``results/.../<pid>_<plano>_results.json``  (+ consenso) — identical
  schema and values as the eval stage (counts -> metrics is the same
  kernel `evalx.metrics` uses).

Prediction-PNG intermediates are NOT written (they exist for the stage
chain's resumability; `--rapido` recomputes from the volume). Slice
indices come from the stage-1 extracted images, so the served slices are
exactly the stage chain's. Artifact equality against the stage chain is
pinned in tests/test_rapido.py.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from tpu_mslesseg.pipeline.logging_setup import get_logger

logger = get_logger(__file__)

PLANOS = ("axial", "coronal", "sagital")


def _cargar_variables(config_pred):
    from tpu_mslesseg.train import checkpoint

    ckpt = checkpoint.load_checkpoint(config_pred.model_path)
    return checkpoint.inference_variables(ckpt)


def ejecutar_paciente_rapido(
    modelo, paciente, epochs: int = 50, k_folds: int = 5, umbral: int = 2,
    limpiar: bool = False,
) -> bool:
    """Serve one patient through the fused program and write the standard
    volume + metrics artifacts. Returns True on success, False when the
    preconditions fail (caller falls back to the stage chain).

    Idempotence matches the stage chain: complete (volume, metrics) PAIRS
    skip; an incomplete pair is rewritten WHOLE from the fresh program so
    the metrics on disk always describe the volume next to them; and
    ``limpiar`` invalidates everything this path owns first."""
    import jax
    import jax.numpy as jnp

    from tpu_mslesseg.evalx import metrics as mx
    from tpu_mslesseg.infer.consensus3 import ConsensusPredictor
    from tpu_mslesseg.io import nifti
    from tpu_mslesseg.model.yolo11 import create_model_from_env
    from tpu_mslesseg.pipeline.modelo import Modelo
    from tpu_mslesseg.pipeline.paciente import Paciente, calcular_fold
    from tpu_mslesseg.pipeline.paths import (
        ConfigConsenso,
        ConfigEval,
        ConfigPred,
        existe_modelo_entrenado,
    )
    from tpu_mslesseg.pipeline.stages.eval import escribir_json
    from tpu_mslesseg.pipeline.stages.generar_predicciones import indices_de_imagenes

    pid = paciente.id
    fold = calcular_fold(pid, k_folds)

    # --- collect the planes that have trained weights + extracted slices
    planes, variables, slices, idx = [], {}, {}, {}
    eval_cfgs = {}
    for plano in PLANOS:
        m = Modelo(
            plano=plano, num_cortes=modelo.num_cortes,
            modalidad=modelo.modalidad, k_folds=k_folds, mejora=modelo.mejora,
        )
        if not existe_modelo_entrenado(m, epochs, fold):
            continue
        pac = Paciente(
            id=pid, plano=plano, modalidad=m.modalidad, mejora=m.mejora,
            dataset_dir=paciente.base_dir.parent,  # Paciente stores <ds>/<pid>
        )
        cfgp = ConfigPred(modelo=m, epochs=epochs, k_folds=k_folds, paciente=pac)
        dirs = cfgp.paciente_dirs(pid)
        indices = indices_de_imagenes(dirs["images"]) if dirs["images"].is_dir() else []
        if not indices:
            logger.warning(f"⚠️ Sin imágenes extraídas ({plano}) para {pid}.")
            continue
        planes.append(plano)
        variables[plano] = _cargar_variables(cfgp)
        idx[plano] = np.asarray(indices, np.int32)
        slices[plano] = {
            mod: np.asarray(pac.cortes_imagen_batch(indices, mod))
            for mod in m.modalidad
        }
        eval_cfgs[plano] = ConfigEval(
            modelo=m, epochs=epochs, k_folds=k_folds, paciente=pac,
        )

    if modelo.plano not in planes:
        logger.warning(
            f"⚠️ Vía rápida no disponible para {pid}: falta el modelo "
            f"{modelo.plano} del fold {fold}."
        )
        return False

    # --- artifact pairs this path owns: (volume, metrics json) per plane,
    # plus the consenso pair when all three planes serve
    pares = []
    for plano in planes:
        paths = eval_cfgs[plano].paths_paciente(pid)
        pares.append((plano, Path(paths["pred_vol"]), Path(paths["results_json"])))
    if len(planes) == 3:
        cc = ConfigConsenso(
            modelo=modelo, epochs=epochs, k_folds=k_folds,
            paciente=paciente, umbral=umbral,
        )
        me = ConfigEval(
            modelo=modelo, epochs=epochs, k_folds=k_folds,
            paciente=paciente, plano_forzado="consenso",
        )
        pares.append((
            "consenso", Path(cc.consenso_path(pid)),
            Path(me.paths_paciente(pid)["results_json"]),
        ))

    if limpiar:
        for _, vol_path, rj in pares:
            for p in (vol_path, rj):
                if p.exists():
                    p.unlink()
                    logger.info(f"🧹 Eliminado {p}.")
    elif all(v.exists() and r.exists() for _, v, r in pares):
        logger.skip(f"⏩ Vía rápida: artefactos completos para {pid}.")
        return True

    # --- GT volume + geometry
    ce = eval_cfgs[modelo.plano]
    gt_path = ce.paths_paciente(pid)["gt_vol"]
    if not gt_path.exists():
        logger.warning(f"⚠️ Sin GT para {pid}: {gt_path}.")
        return False
    gt_img = nifti.load(gt_path)
    gt = gt_img.get_fdata().astype(np.float32)
    affine = gt_img.affine

    # --- the fused program (per-plane weights; consensus iff 3 planes).
    # Model resolution shared with the prediction stage (bitwise contract)
    model, _, imgsz = create_model_from_env()
    cp = ConsensusPredictor(
        model, variables, gt.shape, mejora=modelo.mejora, imgsz=imgsz,
        umbral=umbral, planes=tuple(planes), per_plane_counts=True,
    )
    counts, cons, vols = cp(slices, idx, jnp.asarray(gt))

    # one host sync for everything (volumes + counts)
    counts, cons, vols = jax.device_get((counts, cons, vols))

    # --- standard artifacts: a complete (volume, json) pair skips; an
    # incomplete pair is rewritten WHOLE so the metrics on disk always
    # describe the volume sitting next to them
    for plano, vol_path, rj in pares:
        if vol_path.exists() and rj.exists():
            logger.skip(f"⏩ Par de artefactos existente ({plano}).")
            continue
        vol_arr = cons if plano == "consenso" else vols[plano]
        vol_path.parent.mkdir(parents=True, exist_ok=True)
        nifti.save(np.asarray(vol_arr, np.float32), affine, vol_path)
        met = mx.metrics_from_counts(counts[plano])
        escribir_json(met, rj)
        logger.info(f"✅ Métricas ({plano}): {met}")

    logger.info(
        f"⚡ Vía rápida completada para {pid} "
        f"({len(planes)} plano(s), fold {fold})."
    )
    return True
