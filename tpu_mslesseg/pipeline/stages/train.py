"""Stage 2 — training: per-fold YOLO11-seg fine-tune.

Reference: ``scripts/train.py``. Same CLI and artifacts (weights/best+last,
results.csv, skip-if-trained); internally the file-copy subset
materialization and YAML plumbing are replaced by the in-memory fold split
and the jitted train loop (train/engine.py).
"""

from __future__ import annotations

import argparse
import sys

from tpu_mslesseg.model.yolo11 import create_model
from tpu_mslesseg.pipeline.logging_setup import get_logger
from tpu_mslesseg.pipeline.modelo import Modelo
from tpu_mslesseg.pipeline.paciente import listar_pacientes
from tpu_mslesseg.pipeline.paths import ConfigTrain, existe_modelo_entrenado
from tpu_mslesseg.preproc.slices import int_o_percentil, resolver_num_cortes
from tpu_mslesseg.train import engine
from tpu_mslesseg.train.trainer import TrainConfig

logger = get_logger(__file__)


def _compute_dtype(cfg: TrainConfig):
    """bf16 compute under AMP (reference args.yaml:8), f32 otherwise.
    Master params / optimizer / BN stats stay f32 either way."""
    import jax.numpy as jnp

    return jnp.bfloat16 if cfg.amp else jnp.float32


def _escribir_dataset_yaml(fold_dir, modelo, dataset_dir, patients, fold, k_folds):
    """Per-fold dataset YAML (reference ``train.py:317-344`` generates a
    YOLO data YAML and archives a copy as ``<model_string>.yaml`` in the
    fold dir). Same keys (path/train/val/names/nc); the train/val values
    record the fold split instead of the reference's transient
    file-copied subset dirs (deleted right after training there)."""
    from pathlib import Path

    import yaml

    from tpu_mslesseg.core import distributed
    from tpu_mslesseg.train import data as tdata

    if not distributed.is_main_process():
        return
    train_ids, test_ids = tdata.fold_patient_split(patients, fold, k_folds)
    payload = {
        "path": str(Path(dataset_dir).resolve()),
        "train": sorted(train_ids),
        "val": sorted(test_ids),
        "names": ["lesion"],
        "nc": 1,
    }
    out = Path(fold_dir) / f"{modelo.model_string}.yaml"
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        yaml.dump(payload, f, default_flow_style=False, sort_keys=False)


def ejecutar_flujo_train(
    config: ConfigTrain, limpiar=False, verbose=False, train_cfg: TrainConfig = None,
    scale: str = "n",
):
    if verbose:
        logger.header(
            f"\n🏋️ Entrenando fold {config.fold_test} "
            f"({config.modelo.model_string}, {config.epochs} epochs)."
        )

    if limpiar:
        if verbose:
            logger.info("♻️ Limpiando entrenamiento previo.")
        config.limpiar_entrenamiento()

    if existe_modelo_entrenado(
        config.modelo, config.epochs, config.fold_test, root=config.root
    ) and engine.entrenamiento_exitoso(config.fold_dir):
        logger.skip(f"⏩ Modelo del fold {config.fold_test} ya entrenado.")
        return None

    config.verificar_paths()

    num_cortes, _ = resolver_num_cortes(
        num_cortes=config.modelo.num_cortes,
        input_dir=config.dataset_entrada,
        plano=config.modelo.plano,
        modalidad=config.modelo.modalidad,
    )

    # stage default is batch=-1 (reference parity, train.py:358-366):
    # the demo's 640^2 epoch program OOMs 16G chips at the bare
    # TrainConfig default of 32 once the pool passes the shrink guard
    cfg = train_cfg or TrainConfig(
        epochs=config.epochs, batch_size=-1,
        pretrained=resolver_pretrained(),
    )
    model, _ = create_model(
        nc=1, scale=scale, dtype=_compute_dtype(cfg), remat=cfg.remat
    )
    patients = listar_pacientes(config.dataset_entrada)

    # data-parallel mesh over every available device (the reference's
    # Ultralytics loop auto-selects one device, args.yaml:13; ours shards
    # the batch over all chips)
    import jax

    from tpu_mslesseg.core import mesh as meshlib

    n_dev = len(jax.devices())
    mesh = meshlib.make_mesh(fold_parallel=1) if n_dev > 1 else None
    if mesh is not None:
        logger.info(f"🕸️ Mesh data-parallel: {n_dev} dispositivos.")

    _escribir_dataset_yaml(
        config.fold_dir, config.modelo, config.dataset_entrada, patients,
        config.fold_test, config.modelo.k_folds,
    )
    summary = engine.train_fold(
        model=model,
        fold_test=config.fold_test,
        patients=patients,
        plano=config.modelo.plano,
        modalidades=config.modelo.modalidad,
        mejora=config.modelo.mejora,
        num_cortes=num_cortes,
        dataset_dir=config.dataset_entrada,
        output_dir=config.fold_dir,
        cfg=cfg,
        k_folds=config.modelo.k_folds,
        mesh=mesh,
    )
    logger.info(f"✅ Entrenamiento del fold {config.fold_test} completado: {summary}")
    return True


def parsear_args(argv=None):
    parser = argparse.ArgumentParser(description="Entrenar YOLO11-seg por fold.")
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
    group.add_argument(
        "--paralelo", action="store_true",
        help="Entrenar TODOS los folds en un solo programa SPMD "
             "(eje 'fold' del mesh).",
    )
    parser.add_argument(
        "--batch", type=int, default=-1,
        help="Tamaño de batch; -1 (por defecto, como la referencia) = "
             "automático según la memoria del dispositivo (sondeo AOT del "
             "paso de entrenamiento real; en v5e resuelve 16 — el antiguo "
             "default 32 NO cabe a 640 con mosaic).",
    )
    parser.add_argument(
        "--imgsz", type=int, default=640,
        help="Lado de la entrada de red (divisible por 32).",
    )
    parser.add_argument("--scale", default="n", choices=["n", "s", "m", "l", "x"])
    parser.add_argument(
        "--no_amp", action="store_true",
        help="Entrenar en f32 puro (por defecto: bf16 mixto, como el AMP "
             "del flujo de referencia).",
    )
    parser.add_argument(
        "--pretrained", default="auto",
        help="Pesos base para warm-start (referencia ConfigTrain.py:139: "
             "yolo11n-seg.pt en el cwd, args.yaml pretrained: true). "
             "'auto' usa ./yolo11n-seg.pt si existe; 'no' entrena desde "
             "cero; cualquier otra cosa es una ruta a un .pt de "
             "ultralytics (importado sin torch, model/import_pt.py).",
    )
    parser.add_argument("--limpiar", action="store_true")
    return parser.parse_args(argv if argv is not None else sys.argv[1:])


def resolver_pretrained(pretrained: str = "auto") -> str:
    """Resolve the warm-start weights path (reference semantics: the base
    weights live at ``Path('yolo11n-seg.pt')`` relative to cwd)."""
    from pathlib import Path

    if pretrained == "no":
        return ""
    if pretrained == "auto":
        p = Path("yolo11n-seg.pt")
        if p.is_file():
            logger.info(f"🧬 Pesos base detectados: {p}.")
            return str(p)
        return ""
    if not Path(pretrained).is_file():
        raise FileNotFoundError(f"Pesos base no encontrados: {pretrained}")
    return pretrained


def ejecutar_train_paralelo(modelo, epochs, train_cfg=None, scale="n",
                            limpiar=False):
    """All folds in one SPMD program (mesh 'fold' axis when available)."""
    import jax

    from tpu_mslesseg.core import mesh as meshlib
    from tpu_mslesseg.train import engine, engine_parallel, fold_parallel

    config = ConfigTrain(modelo=modelo, epochs=epochs, fold_test=1)
    config.verificar_paths()

    fold_dirs = [config.output_dir / f"fold{k}" for k in
                 range(1, modelo.k_folds + 1)]
    if limpiar:
        from tpu_mslesseg.pipeline.paths import eliminar_directorio

        for d in fold_dirs:
            eliminar_directorio(d)
    elif all(engine.entrenamiento_exitoso(d) for d in fold_dirs):
        logger.skip("⏩ Todos los folds ya entrenados.")
        return None

    # 2D (fold, data) factorization: smallest fold axis covering all folds
    # (padded with dummies when k doesn't divide), leftover devices shard
    # each fold's batch over 'data' — 8 devices x 5 folds => fold=8, all
    # devices busy (the old gcd rule degenerated to 1 there)
    n_dev = len(jax.devices())
    fold_par, k_pad = fold_parallel.plan_fold_mesh(n_dev, modelo.k_folds)
    mesh = meshlib.make_mesh(fold_parallel=fold_par) if n_dev > 1 else None
    logger.info(
        f"🕸️ Mesh fold-parallel: fold={fold_par} x data={n_dev // fold_par} "
        f"({modelo.k_folds} folds -> {k_pad} con relleno)."
        if mesh is not None
        else "🕸️ Un dispositivo: folds multiplexados en un solo programa."
    )

    num_cortes, _ = resolver_num_cortes(
        num_cortes=modelo.num_cortes, input_dir=config.dataset_entrada,
        plano=modelo.plano, modalidad=modelo.modalidad,
    )
    cfg = train_cfg or TrainConfig(
        epochs=epochs, batch_size=-1, pretrained=resolver_pretrained()
    )
    model, _ = create_model(
        nc=1, scale=scale, dtype=_compute_dtype(cfg), remat=cfg.remat
    )
    pacientes = listar_pacientes(config.dataset_entrada)
    for k in range(1, modelo.k_folds + 1):
        _escribir_dataset_yaml(
            config.output_dir / f"fold{k}", modelo, config.dataset_entrada,
            pacientes, k, modelo.k_folds,
        )
    return engine_parallel.train_folds_parallel(
        model=model,
        patients=pacientes,
        plano=modelo.plano,
        modalidades=modelo.modalidad,
        mejora=modelo.mejora,
        num_cortes=num_cortes,
        dataset_dir=config.dataset_entrada,
        output_root=config.output_dir,
        cfg=cfg,
        k_folds=modelo.k_folds,
        mesh=mesh,
    )


def main(argv=None):
    args = parsear_args(argv)
    modelo = Modelo(
        plano=args.plano, num_cortes=args.num_cortes, modalidad=args.modalidad,
        k_folds=args.k_folds, mejora=args.mejora,
    )
    cfg = TrainConfig(
        epochs=args.epochs, batch_size=args.batch, amp=not args.no_amp,
        imgsz=args.imgsz, pretrained=resolver_pretrained(args.pretrained),
    )
    if args.paralelo:
        ejecutar_train_paralelo(
            modelo, args.epochs, train_cfg=cfg, scale=args.scale,
            limpiar=args.limpiar,
        )
        return
    config = ConfigTrain(modelo=modelo, epochs=args.epochs, fold_test=args.fold_test)
    ejecutar_flujo_train(
        config, limpiar=args.limpiar, verbose=True, train_cfg=cfg, scale=args.scale
    )


def ejecutar_train_pipeline(
    modelo, epochs=50, fold_test=1, limpiar=False, train_cfg=None, scale="n"
):
    config = ConfigTrain(modelo=modelo, epochs=epochs, fold_test=fold_test)
    return ejecutar_flujo_train(
        config, limpiar=limpiar, train_cfg=train_cfg, scale=scale
    )


if __name__ == "__main__":
    main()
