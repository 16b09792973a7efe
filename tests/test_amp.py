"""bf16 mixed-precision training (AMP parity, reference args.yaml:8):
bf16 compute dtype, f32 master params / optimizer / losses."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_mslesseg.model.yolo11 import create_model
from tpu_mslesseg.train import augment, trainer
from tpu_mslesseg.train.trainer import TrainConfig


def _one_batch(cfg):
    rng = np.random.default_rng(0)
    M, H, W = 8, 48, 40
    dd = {
        "images": jnp.asarray(rng.integers(0, 255, (M, H, W)), jnp.uint8),
        "instmaps": jnp.asarray(
            np.pad(np.ones((M, 10, 10), np.uint8), ((0, 0), (10, H - 20), (10, W - 20)))
        ),
        "boxes": jnp.asarray(
            np.broadcast_to(np.array([10, 10, 20, 20], np.float32), (M, 4, 4)).copy()
        ),
        "valid": jnp.asarray(np.eye(4, dtype=bool)[0][None].repeat(M, 0)),
    }
    acfg = augment.AugConfig(imgsz=cfg.imgsz, max_inst=4, mosaic=True)
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (cfg.batch_size, 4), 0, M)
    return augment.make_batch(key, dd, idx, acfg)


def test_bf16_step_matches_f32_and_keeps_f32_master_params():
    cfg = TrainConfig(epochs=2, batch_size=4, imgsz=64, max_fg=8)
    batch = jax.device_get(_one_batch(cfg))
    losses, states = {}, {}
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        model, _ = create_model(nc=1, scale="n", dtype=dtype)
        state = trainer.init_train_state(model, cfg, steps_per_epoch=2)
        step = trainer.make_train_step(model, cfg, steps_per_epoch=2)
        new_state, m = step(state, {k: jnp.asarray(v) for k, v in batch.items()})
        losses[name] = float(m["loss"])
        states[name] = new_state

    assert np.isfinite(losses["bf16"])
    # bf16 compute, same init -> loss within bf16 rounding of the f32 run
    np.testing.assert_allclose(losses["bf16"], losses["f32"], rtol=0.05)
    # master params and optimizer state remain f32 under AMP
    for leaf in jax.tree_util.tree_leaves(states["bf16"].params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(states["bf16"].ema_params):
        assert leaf.dtype == jnp.float32


def test_amp_flag_selects_dtype():
    from tpu_mslesseg.pipeline.stages.train import _compute_dtype

    assert _compute_dtype(TrainConfig()) == jnp.bfloat16
    assert _compute_dtype(TrainConfig(amp=False)) == jnp.float32
