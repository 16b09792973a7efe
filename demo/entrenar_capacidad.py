"""Modo capacidad: entrena sobre TODOS los pacientes de la demo y evalúa
sobre la distribución de entrenamiento (no es validación cruzada).

Existe porque la demo solo trae 2 pacientes: la validación cruzada real
con n=1 por fold no puede generalizar, mientras que este modo demuestra el
stack completo (entrenamiento → predicción fusionada → reconstrucción →
métricas) alcanzando DSC del orden del ancla de la referencia.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="Demo modo capacidad.")
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--paciente_eval", default="P39")
    parser.add_argument("--mejora", default="GC")
    parser.add_argument("--dataset", default="MSLesSeg-Dataset/train")
    parser.add_argument(
        "--no_amp", action="store_true",
        help="f32 puro (por defecto bf16 mixto, como el entrenamiento real).",
    )
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])

    import jax
    import jax.numpy as jnp

    from tpu_mslesseg.core.runtime import enable_compilation_cache
    from tpu_mslesseg.evalx import metrics as mx
    from tpu_mslesseg.infer.predictor import SlicePredictor
    from tpu_mslesseg.infer.reconstruct import reconstruct_volume
    from tpu_mslesseg.model.yolo11 import create_model
    from tpu_mslesseg.pipeline.logging_setup import get_logger
    from tpu_mslesseg.pipeline.paciente import Paciente, listar_pacientes
    from tpu_mslesseg.preproc import enhance
    from tpu_mslesseg.train import augment, checkpoint, data as tdata, trainer

    enable_compilation_cache()
    logger = get_logger(__file__)

    pacientes = listar_pacientes(args.dataset)
    logger.header(f"\n💪 Modo capacidad: entrenando con {pacientes}.")

    train_set = tdata.build_dataset(
        pacientes, "axial", ["FLAIR"], args.mejora, 50, args.dataset
    )
    cfg = trainer.TrainConfig(
        epochs=args.epochs, batch_size=args.batch, close_mosaic=10, max_fg=48,
        amp=not args.no_amp,
    )
    dtype = jnp.bfloat16 if cfg.amp else jnp.float32
    logger.info(f"🎛️ Precisión de cómputo: {'bf16 (AMP)' if cfg.amp else 'f32'}.")
    model, _ = create_model(nc=1, scale="n", dtype=dtype)
    steps = max(len(train_set) // cfg.batch_size, 1)
    state = trainer.init_train_state(model, cfg, steps)
    acfg_m = augment.AugConfig(max_inst=train_set.max_inst, mosaic=True)
    acfg_p = augment.AugConfig(max_inst=train_set.max_inst, mosaic=False)
    # whole-epoch scan programs: one dispatch per epoch (the per-step
    # loop paid two tunnel round trips per sub-100ms step)
    epoch_fns = {
        True: trainer.make_epoch_fn(model, cfg, steps, acfg_m),
        False: trainer.make_epoch_fn(model, cfg, steps, acfg_p),
    }
    dd = train_set.as_dict()
    key = jax.random.PRNGKey(cfg.seed)

    import time

    n_steps, t_steps = 0, 0.0
    for epoch in range(1, cfg.epochs + 1):
        mosaic = epoch <= cfg.epochs - cfg.close_mosaic
        key, ke = jax.random.split(key)
        idx = tdata.epoch_indices(ke, len(train_set), cfg.batch_size, mosaic)
        key, kas = trainer.split_chain(key, int(idx.shape[0]))
        # skip compile epochs: each augmentation regime's epoch program
        # first compiles on its first use (mosaic at epoch 1, plain at
        # the close_mosaic switch) — exclude both from the timing
        first_plain = cfg.epochs - cfg.close_mosaic + 1
        cold = epoch <= 2 or epoch in (first_plain, first_plain + 1)
        t0 = None if cold else time.time()
        state, ms = epoch_fns[mosaic](state, kas, dd, idx)
        if t0 is not None:
            # axon tunnel: block_until_ready returns at dispatch; only a
            # host fetch gives an honest wall time
            float(ms["loss"][-1])
            t_steps += time.time() - t0
            n_steps += idx.shape[0]
        if epoch % 20 == 0 or epoch == cfg.epochs:
            fetched = jax.device_get(ms)
            line = {k: float(np.mean(fetched[k]))
                    for k in ("box", "seg", "cls", "dfl")}
            logger.info(f"🏋️ Epoch {epoch}/{cfg.epochs}: {line}")
    if n_steps:
        logger.info(
            f"⏱️ Paso de entrenamiento: {1000 * t_steps / n_steps:.1f} ms "
            f"(batch {cfg.batch_size}, {'bf16' if cfg.amp else 'f32'})."
        )

    out = Path("trains_capacidad") / args.mejora / "weights"
    checkpoint.save_checkpoint(out / "best.ckpt", state)
    logger.info(f"💾 Pesos guardados en {out}.")

    p = Paciente(
        id=args.paciente_eval, plano="axial", modalidad=["FLAIR"],
        dataset_dir=args.dataset,
    )
    idx = p.indices_a_usar(50)
    imgs = np.asarray(
        enhance.enhance_for_model(p.cortes_imagen_batch(idx, "FLAIR"), args.mejora)
    )
    pred = SlicePredictor(
        model,
        {"params": state.ema_params, "batch_stats": state.batch_stats},
        slice_hw=imgs.shape[1:],
    )
    masks = np.asarray(pred(imgs))
    vol = np.asarray(reconstruct_volume(p.gt_mask.shape, masks, "axial", idx))
    met = mx.compute_metrics(p.gt_mask, vol)
    logger.info(f"📏 {args.paciente_eval} (distribución de entrenamiento): {met}")
    return met


if __name__ == "__main__":
    main()
