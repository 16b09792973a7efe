"""Fold-training engine: the ``entrenar_fold`` equivalent, end to end.

Reference flow (``train.py:346-389``): materialize train/test subsets by
copying files, write a dataset YAML, call ``YOLO(...).train(...)``, archive,
delete subsets. Ours: build device-resident datasets for the fold split
(no file copies), run the jitted train loop with per-epoch validation,
write ``results.csv`` (reference schema) and best/last checkpoints.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu_mslesseg.pipeline.logging_setup import get_logger
from tpu_mslesseg.train import augment, checkpoint, data as tdata, trainer, validate
from tpu_mslesseg.train.losses import LossConfig
from tpu_mslesseg.train.trainer import TrainConfig, fitness

logger = get_logger(__file__)


def _write_args_yaml(path, cfg: TrainConfig, **extra):
    import dataclasses

    import yaml

    from tpu_mslesseg.core import distributed

    if not distributed.is_main_process():
        return
    payload = {**dataclasses.asdict(cfg), **extra}
    payload = {
        k: (list(v) if isinstance(v, (tuple, set)) else v)
        for k, v in payload.items()
    }
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(payload, f, sort_keys=True)


def train_fold(
    model,
    fold_test: int,
    patients: list,
    plano: str,
    modalidades: list,
    mejora: str | None,
    num_cortes: int | None,
    dataset_dir,
    output_dir,
    cfg: TrainConfig = TrainConfig(),
    k_folds: int = 5,
    mesh=None,
    val_every: int = 1,
    resume: bool = True,
) -> dict:
    """Train one cross-validation fold. Returns summary dict."""
    out = Path(output_dir)
    weights = out / "weights"
    weights.mkdir(parents=True, exist_ok=True)

    train_ids, test_ids = tdata.fold_patient_split(patients, fold_test, k_folds)
    logger.info(f"🧠 Fold {fold_test}: train={len(train_ids)} test={len(test_ids)} pacientes")

    # args.yaml snapshot (reference training runs freeze hyperparameters
    # in the fold dir; same artifact, our schema)
    _write_args_yaml(
        out / "args.yaml", cfg, plano=plano, modalidades=modalidades,
        mejora=mejora, num_cortes=num_cortes, fold_test=fold_test,
        k_folds=k_folds,
    )

    train_set = tdata.build_dataset(
        train_ids, plano, modalidades, mejora, num_cortes, dataset_dir,
        train_size=cfg.imgsz,
    )
    try:
        val_set = tdata.build_dataset(
            test_ids, plano, modalidades, mejora, num_cortes, dataset_dir,
            train_size=cfg.imgsz, max_inst=train_set.max_inst,
        )
    except (ValueError, FileNotFoundError) as e:
        logger.warning(f"⚠️ Fold {fold_test} sin cortes de validación: {e}")
        val_set = None
    logger.info(
        f"📦 Dataset en dispositivo: {len(train_set)} cortes train, "
        f"{len(val_set) if val_set else 0} val, max_inst={train_set.max_inst}"
    )

    # batch=-1 (reference default, ``train.py:358-366``): resolve the
    # largest batch that fits device memory from an AOT probe of the real
    # train step (see train/autobatch.py); per-device result scales by
    # the data-parallel axis, applied below
    if cfg.batch_size == -1:
        from dataclasses import replace

        from tpu_mslesseg.core import mesh as meshlib
        from tpu_mslesseg.train import autobatch

        n_data_ab = int(mesh.shape[meshlib.DATA_AXIS]) if mesh is not None else 1
        acfg_probe = augment.AugConfig(
            imgsz=cfg.imgsz, max_inst=train_set.max_inst, mosaic=True
        )
        cfg = replace(
            cfg,
            batch_size=autobatch.auto_batch_size(
                model, cfg, train_set, acfg_probe, n_data=n_data_ab,
            ),
        )

    # auto-batch: never larger than the dataset (reference batch=-1 spirit)
    if cfg.batch_size > len(train_set):
        from dataclasses import replace

        # pow2 around n/2 so tiny datasets still get several steps/epoch
        eff = max(1 << max((len(train_set) // 2).bit_length() - 1, 2), 4)
        logger.info(f"📉 Batch ajustado a {eff} (dataset de {len(train_set)} cortes).")
        cfg = replace(cfg, batch_size=eff)

    # data-parallel mesh: the batch dim shards over the 'data' axis, so it
    # must be a multiple of that axis size (params/opt state replicated,
    # XLA inserts the gradient all-reduce)
    n_data = 1
    if mesh is not None:
        from dataclasses import replace

        from tpu_mslesseg.core import mesh as meshlib

        n_data = int(mesh.shape[meshlib.DATA_AXIS])
        bs = max(meshlib.pad_to_multiple(cfg.batch_size, n_data), n_data)
        if bs != cfg.batch_size:
            logger.info(f"📐 Batch {cfg.batch_size} -> {bs} (eje data={n_data}).")
            cfg = replace(cfg, batch_size=bs)

    steps_per_epoch = max(len(train_set) // cfg.batch_size, 1)
    state = trainer.init_train_state(model, cfg, steps_per_epoch)
    start_epoch = 1
    last_ckpt = weights / "last.ckpt"
    if resume and checkpoint.checkpoint_exists(last_ckpt):
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "ema_params": state.ema_params,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
            "grad_accum": state.grad_accum,
        }
        try:
            restored = checkpoint.load_checkpoint_compat(last_ckpt, template)
            state = trainer.TrainState(
                params=restored["params"],
                batch_stats=restored["batch_stats"],
                ema_params=restored["ema_params"],
                opt_state=restored["opt_state"],
                step=jnp.asarray(restored["step"]),
                grad_accum=restored["grad_accum"],
            )
            start_epoch = int(restored["step"]) // steps_per_epoch + 1
            logger.info(f"🔁 Reanudando desde la época {start_epoch} (last.ckpt).")
        except Exception as e:
            logger.warning(f"⚠️ No se pudo reanudar desde last.ckpt: {e}")
    loss_cfg = LossConfig(imgsz=cfg.imgsz, max_fg=cfg.max_fg)
    val_step = validate.make_val_step(model, loss_cfg) if val_set is not None else None
    results = trainer.ResultsWriter(
        out / "results.csv", append=start_epoch > 1, from_epoch=start_epoch
    )

    acfg_mosaic = augment.AugConfig(
        imgsz=cfg.imgsz, max_inst=train_set.max_inst, mosaic=True
    )
    acfg_plain = augment.AugConfig(
        imgsz=cfg.imgsz, max_inst=train_set.max_inst, mosaic=False
    )
    # whole-epoch scan programs (one dispatch per epoch; see
    # trainer.make_epoch_fn) — one per augmentation regime
    epoch_fns = {
        True: trainer.make_epoch_fn(model, cfg, steps_per_epoch, acfg_mosaic),
        False: trainer.make_epoch_fn(model, cfg, steps_per_epoch, acfg_plain),
    }
    sched = trainer.lr_schedule(cfg, steps_per_epoch)
    sched_bias = trainer.lr_schedule(
        cfg, steps_per_epoch, start=cfg.warmup_bias_lr
    )

    dd = train_set.as_dict()
    key = jax.random.PRNGKey(cfg.seed)
    # replay the key chain up to the resume point (1 epoch split + 1 split
    # per step) so a resumed run draws the batches the uninterrupted run
    # would have drawn. split_chain is bitwise-equal to the host split
    # loop but costs ONE dispatch instead of ~50k sequential round trips
    # through the tunnel at deep resumes (200 epochs x 262 steps).
    n_replay = (start_epoch - 1) * (1 + steps_per_epoch)
    if n_replay:
        key, _ = trainer.split_chain(key, n_replay)

    repl_sh = None
    if mesh is not None:
        from tpu_mslesseg.core import mesh as meshlib

        repl_sh = meshlib.replicated(mesh)
        state = jax.device_put(state, repl_sh)
        dd = jax.device_put(dd, repl_sh)

    # best fitness persists next to the weights so a resumed run never
    # demotes an earlier, better best.ckpt
    import json

    val_acc = None  # last validation's accumulator (for curve plots)
    fitness_file = weights / "fitness.json"
    # stopper state (upstream EarlyStopping): best fitness + the epoch of
    # the last improvement; a resume without a note must not false-stop
    best_fit, best_epoch = checkpoint.load_stopper_state(weights, start_epoch)
    from tpu_mslesseg.core import distributed

    # fitness.json is process-0-only: without a shared filesystem the
    # workers would resume divergent stopper/best state, and a divergent
    # best-save or patience break deadlocks the collective orbax saves /
    # train steps — broadcast process 0's view
    best_fit, be = distributed.broadcast_from_main([best_fit, float(best_epoch)])
    best_epoch = int(be)

    # validations since the last improvement (resume: reconstruct from the
    # persisted best_epoch and the validation cadence)
    vals_since_best = max(0, (start_epoch - 1 - best_epoch) // max(val_every, 1))
    epochs_run = start_epoch - 1
    for epoch in range(start_epoch, cfg.epochs + 1):
        use_mosaic = epoch <= cfg.epochs - cfg.close_mosaic
        key, k_epoch = jax.random.split(key)
        idx = tdata.epoch_indices(k_epoch, len(train_set), cfg.batch_size, use_mosaic)

        # the per-step k_aug chain, reproduced bitwise in one program
        key, k_augs = trainer.split_chain(key, int(idx.shape[0]))
        if mesh is not None:
            # shard the source indices over 'data' (dim 1 = batch): the
            # augmentation and train step inside the scan then run SPMD
            # over the batch dim end to end
            from jax.sharding import NamedSharding, PartitionSpec

            from tpu_mslesseg.core import mesh as meshlib

            k_augs = jax.device_put(k_augs, repl_sh)
            idx = jax.device_put(
                idx,
                NamedSharding(mesh, PartitionSpec(None, meshlib.DATA_AXIS)),
            )
        state, ms = epoch_fns[use_mosaic](state, k_augs, dd, idx)
        fetched = jax.device_get(ms)
        train_losses = {
            k: float(np.mean(fetched[k])) for k in ("box", "seg", "cls", "dfl")
        }

        if val_set is not None and (epoch % val_every == 0 or epoch == cfg.epochs):
            variables = {
                "params": state.ema_params,
                "batch_stats": state.batch_stats,
            }
            val_bs = min(cfg.batch_size, 16)
            val_bs = -(-val_bs // n_data) * n_data  # multiple of the data axis
            val_metrics, val_losses, val_acc = validate.run_validation(
                model, variables, val_set, loss_cfg,
                batch_size=val_bs, imgsz=cfg.imgsz,
                step=val_step, mesh=mesh, return_acc=True,
            )
        else:
            val_metrics, val_losses = {}, {}

        last = int(state.step) - 1
        lr = (float(sched_bias(last)), float(sched(last)))
        results.write_epoch(epoch, train_losses, val_metrics, val_losses, lr)
        fit = fitness(val_metrics)
        logger.info(
            f"🏋️ Epoch {epoch}/{cfg.epochs} "
            f"loss(box/seg/cls/dfl)={train_losses.get('box', 0):.3f}/"
            f"{train_losses.get('seg', 0):.3f}/{train_losses.get('cls', 0):.3f}/"
            f"{train_losses.get('dfl', 0):.3f} "
            f"mAP50(M)={val_metrics.get('map50_m', 0):.3f} fitness={fit:.3f}"
        )

        # checkpoint IO (~1s) would dominate sub-second epochs: last every
        # 10 epochs + final; best only on fitness improvement
        saved_last = epoch % 10 == 0 or epoch == cfg.epochs
        if saved_last:
            checkpoint.save_checkpoint(weights / "last.ckpt", state, include_opt=True)
        if cfg.save_period > 0 and epoch % cfg.save_period == 0:
            # periodic snapshots (upstream save_period: weights/epoch<N>.pt)
            checkpoint.save_checkpoint(weights / f"epoch{epoch}.ckpt", state)
        if val_metrics and fit >= best_fit:
            best_fit = fit
            best_epoch = epoch
            vals_since_best = 0
            # orbax saves are collective: EVERY process calls them;
            # the plain-file fitness note is process-0 only
            checkpoint.save_checkpoint(weights / "best.ckpt", state)
            if distributed.is_main_process():
                fitness_file.write_text(json.dumps(
                    {"best_fitness": best_fit, "best_epoch": best_epoch}
                ))
        elif val_metrics:
            vals_since_best += 1
        epochs_run = epoch
        if val_metrics and cfg.patience > 0 and vals_since_best >= cfg.patience:
            # upstream EarlyStopping: `patience` validated epochs without
            # a fitness improvement (counting validations, not raw epochs
            # — improvements can only register when validation runs);
            # keep a resumable last.ckpt at the break
            logger.info(
                f"🛑 Detención temprana en la época {epoch}: sin mejora de "
                f"fitness desde la época {best_epoch} (patience={cfg.patience})."
            )
            if not saved_last:
                checkpoint.save_checkpoint(
                    weights / "last.ckpt", state, include_opt=True
                )
            break

    if best_fit < 0 and not checkpoint.checkpoint_exists(weights / "best.ckpt"):
        # no validation ever ran AND no previous best exists: final
        # weights are "best" (a completed-run resume must not demote the
        # real best checkpoint)
        checkpoint.save_checkpoint(weights / "best.ckpt", state)

    # visual artifacts next to results.csv (the reference run dir ships
    # results.png, PR/P/R/F1 curves, confusion matrices and batch
    # previews via Ultralytics; plots: true in args.yaml)
    from tpu_mslesseg.core import distributed

    if cfg.plots and distributed.is_main_process():
        from tpu_mslesseg.train import plots

        plots.plot_results(out / "results.csv")
        if val_acc is not None:
            plots.plot_curves(val_acc, out)
            plots.plot_confusion(val_acc, out)
        # previews from keys outside the training chain
        kb = jax.random.PRNGKey(cfg.seed + 7919)
        previews = []
        for k in range(3):
            idx_b = jax.random.randint(
                jax.random.fold_in(kb, 2 * k),
                (min(cfg.batch_size, 9), 4), 0, len(train_set),
            )
            previews.append(jax.device_get(augment.make_batch(
                jax.random.fold_in(kb, 2 * k + 1), dd, idx_b, acfg_mosaic
            )))
        plots.plot_train_batches(previews, out)
        plots.plot_labels(train_set, out)
        if val_set is not None and len(val_set) > 0:
            from tpu_mslesseg.train import validate as _val

            acfg_v = _val.val_aug_config(val_set.max_inst, cfg.imgsz)
            nv = min(9, len(val_set))
            idx_v = jnp.arange(nv, dtype=jnp.int32)[:, None].repeat(4, axis=1)
            vb = jax.device_get(augment.make_batch(
                jax.random.PRNGKey(0), val_set.as_dict(), idx_v, acfg_v
            ))
            plots.plot_val_batch(
                model,
                {"params": state.ema_params, "batch_stats": state.batch_stats},
                vb, out, imgsz=cfg.imgsz,
            )

    return {
        "best_fitness": best_fit,
        # epochs actually trained (< cfg.epochs when patience fired)
        "epochs": epochs_run,
        "train_slices": len(train_set),
        "val_slices": len(val_set) if val_set else 0,
        "weights_dir": str(weights),
    }


def entrenamiento_exitoso(output_dir) -> bool:
    """Training-success check (reference ``train.py:105-116``): best + last
    checkpoints and results.csv present."""
    out = Path(output_dir)
    return (
        checkpoint.checkpoint_exists(out / "weights" / "best.ckpt")
        and checkpoint.checkpoint_exists(out / "weights" / "last.ckpt")
        and (out / "results.csv").exists()
    )
