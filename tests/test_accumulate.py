"""Gradient accumulation to the nominal batch (nbs=64) + per-group
warmup — the reference's effective-batch semantics (args.yaml: nbs 64,
warmup_bias_lr 0.1; upstream accumulates round(nbs/batch) micro-batches
per optimizer step and scales weight decay by batch*accumulate/nbs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tpu_mslesseg.train import trainer
from tpu_mslesseg.train.trainer import TrainConfig


def test_accumulate_steps_formula():
    assert trainer.accumulate_steps(TrainConfig(batch_size=64)) == 1
    assert trainer.accumulate_steps(TrainConfig(batch_size=12)) == 5
    assert trainer.accumulate_steps(TrainConfig(batch_size=8)) == 8
    assert trainer.accumulate_steps(TrainConfig(batch_size=128)) == 1


def test_warmup_floor_and_bias_start():
    cfg = TrainConfig(epochs=50, batch_size=64)
    spe = 10  # 3*10 < 100 -> floor kicks in (upstream max(round(3nb),100))
    sched = trainer.lr_schedule(cfg, spe)
    sched_b = trainer.lr_schedule(cfg, spe, start=cfg.warmup_bias_lr)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched_b(0)), 0.1, rtol=1e-6)
    # halfway through the 100-step warmup window (upstream interpolates
    # toward lr0*lf(CURRENT epoch) — step 50 at spe=10 is epoch 5)
    lf5 = (1.0 - 5 / 50) * (1 - cfg.lrf) + cfg.lrf
    np.testing.assert_allclose(
        float(sched(50)), cfg.lr0 * lf5 * 0.5, rtol=1e-5
    )
    np.testing.assert_allclose(
        float(sched_b(50)), 0.1 * 0.5 + cfg.lr0 * lf5 * 0.5, rtol=1e-5
    )
    # past warmup both collapse onto the epoch schedule
    step = 120 * spe // spe * spe  # epoch 120? keep inside: use step 990
    np.testing.assert_allclose(float(sched(990)), float(sched_b(990)), rtol=1e-6)


def test_reference_lr_trace_anchors():
    """The logged lr values of the reference run (results.csv lr/pg0):
    6.6e-4 at epoch 1 end, 5.96e-5 at epoch 50 — nb=172 batches/epoch."""
    cfg = TrainConfig(epochs=50, batch_size=12)
    spe = 172
    sched = trainer.lr_schedule(cfg, spe)
    np.testing.assert_allclose(float(sched(spe - 1)), 0.000662835, atol=2e-6)
    np.testing.assert_allclose(float(sched(50 * spe - 1)), 5.96e-5, atol=2e-7)


def _tiny_params():
    return {"dense": {"kernel": jnp.ones((3, 3)), "bias": jnp.zeros((3,))}}


def test_first_apply_lr_per_group():
    """Upstream's FIRST optimizer apply fires at micro-step 0 (the
    warmup accumulate ramp starts at 1): the bias group moves at exactly
    warmup_bias_lr, the weight group at lr 0.0 — a null parameter update
    whose Adam moments still advance, like torch. adamw's update
    magnitude ~= lr under a constant gradient."""
    cfg = TrainConfig(epochs=50, batch_size=8)
    spe = 100
    tx, sched = trainer.make_optimizer(cfg, spe)
    _, _, apply_ni = trainer.apply_cadence(cfg, spe)
    assert apply_ni[0] == 0 and apply_ni[1] == 1  # ramp starts at acc=1
    params = _tiny_params()
    opt = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, opt = tx.update(g, opt, params)
    np.testing.assert_allclose(
        float(jnp.abs(updates["dense"]["bias"]).mean()),
        cfg.warmup_bias_lr, rtol=1e-3,
    )
    assert float(jnp.abs(updates["dense"]["kernel"]).max()) == 0.0
    # second apply sees the lr at micro-step 1 (warmup barely advanced)
    updates, opt = tx.update(g, opt, params)
    lr_bias_1 = float(trainer.lr_schedule(cfg, spe, cfg.warmup_bias_lr)(1))
    lr_rest_1 = float(sched(1))
    np.testing.assert_allclose(
        float(jnp.abs(updates["dense"]["bias"]).mean()), lr_bias_1, rtol=1e-3
    )
    np.testing.assert_allclose(
        float(jnp.abs(updates["dense"]["kernel"]).mean()), lr_rest_1, rtol=2e-3
    )
    assert lr_bias_1 > 50 * lr_rest_1  # the 0.1 bias warmup dominates early


def test_apply_cadence_upstream_ramp():
    """The precomputed cadence reproduces upstream's warmup behavior on
    the reference-run shape (batch 12, nb=172 -> nw=516, tgt=64/12):
    applies EVERY micro-batch while round(interp) == 1, gaps widen
    monotonically through the ramp, and settle at round(nbs/batch)=5
    after warmup; each apply gap equals the accumulate value upstream
    would hold at that micro-step."""
    cfg = TrainConfig(epochs=50, batch_size=12)
    spe = 172
    mask, napp, apply_ni = trainer.apply_cadence(cfg, spe)
    assert mask.size == spe * cfg.epochs
    nw = max(round(cfg.warmup_epochs * spe), 100)
    tgt = cfg.nbs / cfg.batch_size
    # round(interp) stays 1 while 1 + (tgt-1)*ni/nw < 1.5 -> ni <= 59
    assert mask[:60].all() and not mask[60]
    gaps = np.diff(apply_ni)
    assert (np.diff(gaps) >= 0).all()  # acc is monotone through the ramp
    # fire rule: the gap to an apply equals accumulate AT that micro-step
    for a, b in zip(apply_ni[:-1], apply_ni[1:]):
        acc_b = max(1, round(float(np.interp(b, [0, nw], [1.0, tgt]))))
        assert b - a == acc_b
    # post-warmup: fixed 5-step cadence (= accumulate_steps)
    post = apply_ni[apply_ni > nw]
    assert (np.diff(post) == trainer.accumulate_steps(cfg)).all()
    # n_applies is the inclusive apply counter (drives the EMA ramp)
    assert napp[0] == 1 and napp[-1] == mask.sum()
    assert (napp[apply_ni] == np.arange(1, apply_ni.size + 1)).all()


def test_apply_cadence_no_warmup_is_fixed():
    """warmup_epochs <= 0: upstream sets nw = -1 — no ramp, the fixed
    build-time accumulate from step 0 (first apply at acc-1), and the lr
    is the plain epoch schedule with no 100-iteration floor."""
    cfg = TrainConfig(epochs=4, batch_size=16, nbs=64, warmup_epochs=0.0)
    spe = 25
    mask, _, apply_ni = trainer.apply_cadence(cfg, spe)
    acc = trainer.accumulate_steps(cfg)  # 4
    assert apply_ni[0] == acc - 1
    assert (np.diff(apply_ni) == acc).all()
    sched = trainer.lr_schedule(cfg, spe)
    lf0 = 1.0  # epoch 0: lf = 1
    np.testing.assert_allclose(float(sched(0)), cfg.lr0 * lf0, rtol=1e-6)


def test_step_applies_only_every_accumulate():
    """Params/EMA/opt move ONLY on the acc-th micro step; the
    accumulation carry holds the summed gradients in between. (Warmup
    disabled: with warmup_epochs > 0 upstream's accumulate ramp starts
    at 1, so the fixed cadence under test is the post-warmup one.)"""
    from tpu_mslesseg.model.yolo11 import create_model
    from tpu_mslesseg.train import augment, data as tdata

    cfg = TrainConfig(
        epochs=2, batch_size=16, imgsz=64, max_fg=8, close_mosaic=0,
        nbs=32, warmup_epochs=0.0,
    )  # acc = 2
    model, _ = create_model(nc=1, scale="n")
    state = trainer.init_train_state(model, cfg, steps_per_epoch=4)
    step = trainer.make_train_step(model, cfg, steps_per_epoch=4)

    rng = np.random.default_rng(0)
    acfg = augment.AugConfig(imgsz=64, max_inst=4, mosaic=False)
    dd = {
        "images": jnp.asarray(rng.integers(0, 255, (8, 48, 40)), jnp.uint8),
        "instmaps": jnp.asarray(
            np.where(rng.random((8, 48, 40)) > 0.9, 1, 0).astype(np.uint8)
        ),
        "boxes": jnp.asarray(
            np.tile(np.array([5, 5, 30, 30], np.float32), (8, 4, 1))
        ),
        "valid": jnp.asarray(np.tile([True, False, False, False], (8, 1))),
    }
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (cfg.batch_size, 4), 0, 8)
    batch = augment.make_batch(key, dd, idx, acfg)

    p0 = jax.device_get(state.params)
    s1, _ = step(state, batch)
    # micro step 1 of 2: nothing applied, gradient carried
    chex = jax.tree_util.tree_map(np.array_equal, p0, jax.device_get(s1.params))
    assert all(jax.tree_util.tree_leaves(chex))
    ga = jax.device_get(s1.grad_accum)
    assert any(float(np.abs(x).sum()) > 0 for x in jax.tree_util.tree_leaves(ga))

    s2, _ = step(s1, batch)
    # micro step 2: apply fires, carry zeroed
    changed = jax.tree_util.tree_map(
        lambda a, b: not np.array_equal(a, b), p0, jax.device_get(s2.params)
    )
    assert any(jax.tree_util.tree_leaves(changed))
    ga2 = jax.device_get(s2.grad_accum)
    assert all(float(np.abs(x).sum()) == 0 for x in jax.tree_util.tree_leaves(ga2))


def test_results_csv_pg_columns_split_bias_warmup(tmp_path):
    """lr/pg0 is the BIAS group's schedule (warms DOWN from
    warmup_bias_lr=0.1 toward the weight lr); pg1 == pg2 carry the plain
    schedule — upstream param-group order in results.csv."""
    import csv

    from tpu_mslesseg.train.trainer import (
        ResultsWriter, TrainConfig, lr_schedule,
    )

    cfg = TrainConfig(epochs=50, batch_size=8)
    sched = lr_schedule(cfg, steps_per_epoch=100)
    sched_b = lr_schedule(cfg, steps_per_epoch=100,
                          start=cfg.warmup_bias_lr)
    w = ResultsWriter(tmp_path / "results.csv")
    step_in_warmup = 50  # nw >= 100 iters, so step 50 is mid-warmup
    w.write_epoch(1, {}, {}, {},
                  (float(sched_b(step_in_warmup)), float(sched(step_in_warmup))))
    rows = list(csv.reader(open(tmp_path / "results.csv")))
    pg0, pg1, pg2 = (float(x) for x in rows[1][-3:])
    assert pg1 == pg2
    assert pg0 > pg1  # bias lr interpolates down from 0.1 during warmup
    # the CSV stores %.6g
    assert abs(pg0 - float(sched_b(step_in_warmup))) < 1e-6


def test_cos_lr_one_cycle():
    """cos_lr=True follows upstream one_cycle(1, lrf, epochs): cosine
    from lr0 at epoch 0 to lr0*lrf at the last epoch (post-warmup)."""
    import numpy as np

    from tpu_mslesseg.train import trainer

    cfg = trainer.TrainConfig(epochs=40, batch_size=64, cos_lr=True,
                              warmup_epochs=0.0)
    spe = 10
    sched = trainer.lr_schedule(cfg, spe)
    # warmup_epochs=0 disables the warmup (upstream nw = -1)
    for epoch in (10, 20, 39):
        step = epoch * spe
        lf = ((1 - np.cos(epoch * np.pi / cfg.epochs)) / 2) * (cfg.lrf - 1) + 1
        np.testing.assert_allclose(float(sched(step)), cfg.lr0 * lf, rtol=1e-4)
    # midpoint of the cycle = mean of the endpoints
    np.testing.assert_allclose(
        float(sched(20 * spe)), cfg.lr0 * (1 + cfg.lrf) / 2, rtol=1e-6
    )
    # default stays the linear schedule
    lin = trainer.lr_schedule(trainer.TrainConfig(epochs=40, batch_size=64), spe)
    lf_lin = (1 - 20 / 40) * (1 - cfg.lrf) + cfg.lrf
    np.testing.assert_allclose(float(lin(20 * spe)), cfg.lr0 * lf_lin, rtol=1e-6)
