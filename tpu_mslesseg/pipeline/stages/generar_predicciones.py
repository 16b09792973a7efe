"""Stage 3 — 2D prediction: trained model over every test-fold slice.

Reference: ``scripts/generar_predicciones.py`` — a serial per-image Python
loop (SURVEY §3.4 hot loop). Here each patient's slices run as ONE fused
device call (SlicePredictor) and only the final binary PNGs touch disk.
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

import numpy as np

from tpu_mslesseg.io import png
from tpu_mslesseg.model.yolo11 import create_model
from tpu_mslesseg.pipeline.logging_setup import evaluate_results, get_logger, log_fold_status
from tpu_mslesseg.pipeline.modelo import Modelo
from tpu_mslesseg.pipeline.paciente import Paciente, calcular_fold, listar_pacientes
from tpu_mslesseg.pipeline.paths import ConfigPred
from tpu_mslesseg.preproc.slices import int_o_percentil
from tpu_mslesseg.train import checkpoint
from tpu_mslesseg.infer.predictor import SlicePredictor

logger = get_logger(__file__)

# max patients with device results in flight (dispatch/fetch pipeline):
# deep enough to hide the tunnel round trip, shallow enough that
# device-resident pending buffers stay bounded on full-dataset runs
PIPELINE_DEPTH = 4

_SLICE_RE = re.compile(r".*_(\d+)(?:_[^_]*)?\.png$")


def cargar_predictor(config: ConfigPred, slice_hw) -> SlicePredictor:
    """Load best checkpoint for the fold and compile the fused predictor."""
    from tpu_mslesseg.model.yolo11 import create_model_from_env

    model, _, imgsz = create_model_from_env()
    ckpt = checkpoint.load_checkpoint(config.model_path)
    variables = checkpoint.inference_variables(ckpt)
    return SlicePredictor(model, variables, slice_hw=slice_hw, imgsz=imgsz)


def indices_de_imagenes(images_dir: Path) -> list:
    out = set()
    for f in images_dir.glob("*.png"):
        m = _SLICE_RE.match(f.name)
        if m:
            out.add(int(m.group(1)))
    return sorted(out)


def predicciones_completas(dirs: dict) -> bool:
    imgs = indices_de_imagenes(dirs["images"]) if dirs["images"].is_dir() else []
    if not imgs:
        return False
    preds = dirs["pred_masks"]
    if not preds.is_dir():
        return False
    have = indices_de_imagenes(preds)
    return set(imgs) <= set(have)


def despachar_paciente_predicciones(paciente_id, config, predictor_cache):
    """Enqueue the fused prediction program(s) for one patient WITHOUT
    fetching: returns None (skip), False (no images) or a pending tuple
    for `finalizar_paciente_predicciones`. Dispatch is async, so queueing
    every patient first lets the device pipeline their programs while the
    host loads the next patient's volume and writes the previous PNGs."""
    dirs = config.paciente_dirs(paciente_id)
    if predicciones_completas(dirs):
        return None  # skip

    indices = indices_de_imagenes(dirs["images"])
    if not indices:
        logger.warning(f"⚠️ Sin imágenes extraídas para {paciente_id}.")
        return False

    paciente = Paciente(
        id=paciente_id, plano=config.modelo.plano, modalidad=config.modelo.modalidad,
        mejora=config.modelo.mejora, dataset_dir=config.dataset_entrada,
    )
    # enhanced slices straight from the volume (equivalent to reading back
    # the stage-1 PNGs); multimodal experiments predict every modality and
    # union the masks ON DEVICE (the reference's reconstruction likewise
    # folds every modality's prediction PNG into the same volume)
    from tpu_mslesseg.preproc import enhance

    masks = None
    for mod in config.modelo.modalidad:
        raw = paciente.cortes_imagen_batch(indices, mod)
        imgs = enhance.enhance_for_model(raw, config.modelo.mejora)
        hw = tuple(imgs.shape[1:])
        if hw not in predictor_cache:
            predictor_cache[hw] = cargar_predictor(config, hw)
        m = predictor_cache[hw](imgs)  # device array: no host sync
        masks = m if masks is None else (masks | m)
    return paciente_id, indices, masks, dirs, paciente.modalidad_str


def finalizar_paciente_predicciones(pendiente) -> bool:
    """Fetch a dispatched patient's masks and write the PNG artifacts."""
    paciente_id, indices, masks, dirs, mod = pendiente
    masks_np = np.asarray(masks)
    dirs["pred_masks"].mkdir(parents=True, exist_ok=True)
    png.save_gray_batch(
        [dirs["pred_masks"] / f"{paciente_id}_{mod}_{i}.png" for i in indices],
        (masks_np > 0).astype(np.uint8) * 255,
    )
    return True


def procesar_paciente_predicciones(paciente_id, config, predictor_cache):
    """Predict all slices of one patient in one device call."""
    pendiente = despachar_paciente_predicciones(
        paciente_id, config, predictor_cache
    )
    if pendiente is None or pendiente is False:
        return pendiente
    return finalizar_paciente_predicciones(pendiente)


def ejecutar_flujo_pred(config: ConfigPred, limpiar=False, verbose=False):
    if verbose:
        target = (
            f"paciente {config.paciente}"
            if config.es_paciente_individual
            else f"fold {config.fold_test}"
        )
        logger.header(f"\n🔮 Generando predicciones 2D para el {target}.")

    if limpiar:
        if verbose:
            logger.info("♻️ Limpiando predicciones previas.")
        config.limpiar_predicciones()

    config.verificar_paths()
    cache = {}

    if config.es_paciente_individual:
        res = procesar_paciente_predicciones(config.paciente.id, config, cache)
        if res is None:
            logger.skip("⏩ Predicciones ya existentes.")
        elif res:
            logger.info("✅ Predicciones generadas.")
        return res

    resultados = []
    pacientes = (
        listar_pacientes(config.dataset_fold_dir)
        if config.dataset_fold_dir.is_dir()
        else []
    )
    # pipelined dispatch/fetch: keep at most PIPELINE_DEPTH patients'
    # device results pending — the fetch of patient i-k overlaps the
    # device compute of patients i-k+1..i, while device-resident memory
    # stays O(depth) instead of O(patients) (full-dataset runs have 53)
    pendientes = []

    def _drenar(pid, pendiente):
        if pendiente is None or pendiente is False:
            resultados.append(pendiente)
            return
        try:
            resultados.append(finalizar_paciente_predicciones(pendiente))
        except Exception as e:
            logger.warning(f"⚠️ Error prediciendo {pid}, se omite: {e}.")

    for pid in pacientes:
        try:
            pendientes.append((pid, despachar_paciente_predicciones(pid, config, cache)))
        except Exception as e:
            logger.warning(f"⚠️ Error prediciendo {pid}, se omite: {e}.")
        if len(pendientes) >= PIPELINE_DEPTH:
            _drenar(*pendientes.pop(0))
    for pid, pendiente in pendientes:
        _drenar(pid, pendiente)
    estado = evaluate_results(resultados)
    log_fold_status(logger, estado, config.fold_test)
    return estado


def parsear_args(argv=None):
    parser = argparse.ArgumentParser(description="Generar predicciones 2D.")
    parser.add_argument("--plano", required=True, choices=["axial", "coronal", "sagital"])
    parser.add_argument(
        "--modalidad", nargs="+", choices=["T1", "T2", "FLAIR"],
        default=["T1", "T2", "FLAIR"],
    )
    parser.add_argument("--num_cortes", type=int_o_percentil, required=True)
    parser.add_argument("--mejora", default=None, choices=["HE", "CLAHE", "GC", "LT"])
    parser.add_argument("--epochs", type=int, default=50)
    parser.add_argument("--k_folds", type=int, default=5)
    group = parser.add_mutually_exclusive_group(required=True)
    group.add_argument("--fold_test", type=int)
    group.add_argument("--paciente_id", type=str)
    parser.add_argument("--limpiar", action="store_true")
    return parser.parse_args(argv if argv is not None else sys.argv[1:])


def main(argv=None):
    # the standalone prediction stage never trains: export the measured
    # serving-only TPU flag before the backend binds (VERDICT r4 #1)
    from tpu_mslesseg.infer.consensus3 import set_serving_tpu_flags

    set_serving_tpu_flags()
    args = parsear_args(argv)
    modelo = Modelo(
        plano=args.plano, num_cortes=args.num_cortes, modalidad=args.modalidad,
        k_folds=args.k_folds, mejora=args.mejora,
    )
    paciente = None
    if args.paciente_id:
        paciente = Paciente(
            id=args.paciente_id, plano=modelo.plano, modalidad=modelo.modalidad,
            mejora=modelo.mejora, dataset_dir="MSLesSeg-Dataset/train",
        )
    config = ConfigPred(
        modelo=modelo, epochs=args.epochs, k_folds=args.k_folds,
        fold_test=args.fold_test, paciente=paciente,
    )
    ejecutar_flujo_pred(config, limpiar=args.limpiar, verbose=True)


def ejecutar_predicciones_pipeline(
    modelo, epochs=50, k_folds=5, fold_test=None, paciente=None, limpiar=False
):
    config = ConfigPred(
        modelo=modelo, epochs=epochs, k_folds=k_folds,
        fold_test=fold_test, paciente=paciente,
    )
    return ejecutar_flujo_pred(config, limpiar=limpiar)


if __name__ == "__main__":
    main()
