"""All-folds-parallel training entry: one SPMD loop trains every fold.

Stage-level wrapper over train/fold_parallel.py: builds ONE shared
device-resident slice pool (all patients), derives per-fold training
pools, advances all k folds per step, then per fold runs the standard
validation pass and writes the usual artifacts (results.csv summary row,
weights/best+last). On a (fold, data) mesh the folds run concurrently;
single-chip they are time-multiplexed inside the same compiled program
(still removing per-fold compile/setup overhead vs sequential training).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu_mslesseg.pipeline.logging_setup import get_logger
from tpu_mslesseg.pipeline.paciente import calcular_fold
from tpu_mslesseg.train import (
    augment,
    checkpoint,
    data as tdata,
    fold_parallel,
    trainer,
    validate,
)
from tpu_mslesseg.train.losses import LossConfig
from tpu_mslesseg.train.trainer import TrainConfig, fitness

logger = get_logger(__file__)


def train_folds_parallel(
    model,
    patients: list,
    plano: str,
    modalidades: list,
    mejora: str | None,
    num_cortes: int | None,
    dataset_dir,
    output_root,
    cfg: TrainConfig = TrainConfig(),
    k_folds: int = 5,
    mesh=None,
) -> dict:
    """Train every fold concurrently. output_root/fold<k>/ receives the
    standard per-fold artifacts."""
    pool = tdata.build_dataset(
        patients, plano, modalidades, mejora, num_cortes, dataset_dir,
        train_size=cfg.imgsz,
    )
    pools, counts = fold_parallel.build_fold_index_pools(
        pool.meta, k_folds, calcular_fold
    )
    n_min = int(np.asarray(counts).min())
    steps_per_epoch = max(n_min // cfg.batch_size, 1)
    logger.info(
        f"🧠 Entrenamiento fold-parallel: {k_folds} folds, pool de "
        f"{len(pool)} cortes, {steps_per_epoch} pasos/época."
    )

    acfg_m = augment.AugConfig(imgsz=cfg.imgsz, max_inst=pool.max_inst, mosaic=True)
    acfg_p = augment.AugConfig(imgsz=cfg.imgsz, max_inst=pool.max_inst, mosaic=False)
    state = fold_parallel.init_multi_fold_state(model, cfg, steps_per_epoch, k_folds)
    step_m = fold_parallel.make_multi_fold_step(
        model, cfg, steps_per_epoch, acfg_m, mesh=mesh
    )
    step_p = fold_parallel.make_multi_fold_step(
        model, cfg, steps_per_epoch, acfg_p, mesh=mesh
    )

    from contextlib import nullcontext

    dd = pool.as_dict()
    key = jax.random.PRNGKey(cfg.seed)

    fold_sh = None
    if mesh is not None:
        # committed single-device arrays can't be auto-resharded by jit:
        # place the stacked state/pools on the fold axis, the pool replicated
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tpu_mslesseg.core import mesh as meshlib

        fold_sh = NamedSharding(mesh, P(meshlib.FOLD_AXIS))
        repl = NamedSharding(mesh, P())
        state = jax.device_put(state, fold_sh)
        pools = jax.device_put(pools, fold_sh)
        counts = jax.device_put(counts, fold_sh)
        dd = jax.device_put(dd, repl)

    with mesh if mesh is not None else nullcontext():
        for epoch in range(1, cfg.epochs + 1):
            step = step_m if epoch <= cfg.epochs - cfg.close_mosaic else step_p
            step_losses = []
            for _ in range(steps_per_epoch):
                key, k = jax.random.split(key)
                keys = jax.random.split(k, k_folds)
                if fold_sh is not None:
                    keys = jax.device_put(keys, fold_sh)
                state, metrics = step(state, keys, pools, counts, dd)
                step_losses.append(metrics["loss"])
            if epoch % 10 == 0 or epoch == cfg.epochs:
                losses = np.mean(jax.device_get(step_losses), axis=0)
                logger.info(
                    f"🏋️ Época {epoch}/{cfg.epochs}: pérdidas por fold "
                    f"{np.round(losses, 2).tolist()}"
                )

    # per-fold validation + artifacts
    loss_cfg = LossConfig(imgsz=cfg.imgsz, max_fg=cfg.max_fg)
    val_step = validate.make_val_step(model, loss_cfg)
    summary = {}
    for f in range(k_folds):
        fold_state = fold_parallel.extract_fold_state(state, f)
        out = Path(output_root) / f"fold{f + 1}"
        weights = out / "weights"
        weights.mkdir(parents=True, exist_ok=True)

        _, test_ids = tdata.fold_patient_split(patients, f + 1, k_folds)
        val_metrics = {}
        try:
            val_set = tdata.build_dataset(
                test_ids, plano, modalidades, mejora, num_cortes, dataset_dir,
                train_size=cfg.imgsz, max_inst=pool.max_inst,
            )
            variables = {
                "params": fold_state.ema_params,
                "batch_stats": fold_state.batch_stats,
            }
            val_metrics, val_losses = validate.run_validation(
                model, variables, val_set, loss_cfg,
                batch_size=min(cfg.batch_size, 16), imgsz=cfg.imgsz,
                step=val_step,
            )
        except (ValueError, FileNotFoundError) as e:
            logger.warning(f"⚠️ Fold {f + 1} sin validación: {e}")
            val_losses = {}

        results = trainer.ResultsWriter(out / "results.csv")
        results.write_epoch(cfg.epochs, {}, val_metrics, val_losses, 0.0)
        checkpoint.save_checkpoint(weights / "best.ckpt", fold_state)
        checkpoint.save_checkpoint(weights / "last.ckpt", fold_state)
        fit = fitness(val_metrics)
        summary[f"fold{f + 1}"] = {
            "fitness": fit,
            "map50_m": val_metrics.get("map50_m", 0.0),
        }
        logger.info(f"✅ Fold {f + 1}: mAP50(M)={val_metrics.get('map50_m', 0):.3f}")
    return summary
