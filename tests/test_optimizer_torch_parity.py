"""Differential parity of the optimizer stack against REAL torch.

The reference's engine steps ``torch.optim.AdamW`` (Ultralytics
``build_optimizer``: three param groups — biases added FIRST and warmed
from warmup_bias_lr, then decay weights, then BN scales with no decay),
clips the accumulated gradients to global-norm 10 inside
``optimizer_step``, ramps ``accumulate`` itself during warmup, and
EMA-folds the params after every apply (``ModelEMA``). Reference
consumption: ``scripts/train.py:358-366``; hyperparameters
``args.yaml:73-103``.

This test drives BOTH stacks with identical injected micro-gradients —
the torch side is a transcription of the upstream loop running the
actual ``torch.optim.AdamW`` from the torch CPU build baked into this
image, the JAX side is the production ``trainer.make_update_fn`` (the
exact optimizer half of the train step) — and compares parameter and
EMA trajectories to float32 tolerance. Any silent deviation in the
optax chain (AdamW formula, group partition, decoupled weight-decay
placement and scaling, warmup lr interp, accumulate ramp, clip
semantics, EMA decay ramp) shows up here without running the full
training loop.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_mslesseg.train import trainer
from tpu_mslesseg.train.trainer import TrainConfig

torch = pytest.importorskip("torch")

# leaf names follow the Flax conventions the production partition keys
# on: "kernel" -> decay group, "bias" -> bias group (incl. BN biases),
# "scale" (BN) -> no-decay weight group
SHAPES = {
    "conv": {"kernel": (3, 4), "bias": (4,)},
    "bn": {"scale": (4,), "bias": (4,)},
    "head": {"kernel": (4, 2)},
}


def _tree_of(fn):
    return {m: {n: fn(s) for n, s in sub.items()} for m, sub in SHAPES.items()}


def _make_params(seed=0):
    rng = np.random.default_rng(seed)
    return _tree_of(lambda s: rng.normal(0.0, 0.5, s).astype(np.float32))


def _grads_seq(T, scale, seed):
    rng = np.random.default_rng(seed)
    return [
        _tree_of(lambda s: rng.normal(0.0, scale, s).astype(np.float32))
        for _ in range(T)
    ]


def _lf(cfg, epoch):
    if cfg.cos_lr:
        return ((1 - np.cos(epoch * np.pi / cfg.epochs)) / 2) * (cfg.lrf - 1) + 1
    return (1 - epoch / cfg.epochs) * (1 - cfg.lrf) + cfg.lrf


def torch_upstream(params_np, grads, cfg, spe):
    """Upstream torch consumption: BaseTrainer._do_train's warmup block
    (per-micro-batch lr/accumulate interp), grad accumulation into
    ``p.grad``, ``optimizer_step`` (clip 10 -> AdamW -> zero_grad), and
    ModelEMA's post-step fold with its updates-counted decay ramp."""
    leaves = {
        (m, n): torch.nn.Parameter(torch.from_numpy(a.copy()))
        for m, sub in params_np.items()
        for n, a in sub.items()
    }
    biases = [v for (m, n), v in leaves.items() if n == "bias"]
    kernels = [v for (m, n), v in leaves.items() if n == "kernel"]
    scales = [v for (m, n), v in leaves.items() if n == "scale"]
    acc_build = max(round(cfg.nbs / cfg.batch_size), 1)
    wd_eff = cfg.weight_decay * cfg.batch_size * acc_build / cfg.nbs
    opt = torch.optim.AdamW(
        [
            {"params": biases, "weight_decay": 0.0},
            {"params": kernels, "weight_decay": wd_eff},
            {"params": scales, "weight_decay": 0.0},
        ],
        lr=cfg.lr0,
        betas=(0.9, 0.999),
        eps=1e-8,
    )
    for g in opt.param_groups:
        g["initial_lr"] = cfg.lr0
    allp = list(leaves.values())
    ema = {k: v.detach().clone() for k, v in leaves.items()}
    nw = (
        max(round(cfg.warmup_epochs * spe), 100)
        if cfg.warmup_epochs > 0
        else -1
    )
    last, acc, updates = -1, acc_build, 0
    for ni in range(len(grads)):
        lf = _lf(cfg, ni // spe)
        if ni <= nw:
            acc = max(
                1,
                round(float(np.interp(ni, [0, nw],
                                      [1.0, cfg.nbs / cfg.batch_size]))),
            )
            for j, x in enumerate(opt.param_groups):
                x["lr"] = float(
                    np.interp(
                        ni,
                        [0, nw],
                        [
                            cfg.warmup_bias_lr if j == 0 else 0.0,
                            x["initial_lr"] * lf,
                        ],
                    )
                )
        else:  # the per-epoch LambdaLR schedule
            for x in opt.param_groups:
                x["lr"] = x["initial_lr"] * lf
        for (m, n), v in leaves.items():
            g = torch.from_numpy(grads[ni][m][n])
            v.grad = g.clone() if v.grad is None else v.grad + g
        if ni - last >= acc:
            torch.nn.utils.clip_grad_norm_(allp, max_norm=10.0)
            opt.step()
            opt.zero_grad()
            last = ni
            updates += 1
            d = cfg.ema_decay * (1 - np.exp(-updates / cfg.ema_tau))
            for k, v in leaves.items():
                ema[k].mul_(d).add_(v.detach(), alpha=1 - d)
    return (
        {k: v.detach().numpy() for k, v in leaves.items()},
        {k: v.numpy() for k, v in ema.items()},
        updates,
    )


def ours(params_np, grads, cfg, spe):
    """The production update fn (trainer.make_update_fn) driven by the
    same injected gradients."""
    tx, update = trainer.make_update_fn(cfg, spe)
    params = jax.tree_util.tree_map(jnp.asarray, params_np)
    opt_state = tx.init(params)
    ema = jax.tree_util.tree_map(jnp.copy, params)
    accum = jax.tree_util.tree_map(jnp.zeros_like, params)
    upd = jax.jit(update)
    for ni, g in enumerate(grads):
        accum, opt_state, params, ema = upd(
            jnp.int32(ni),
            jax.tree_util.tree_map(jnp.asarray, g),
            accum,
            opt_state,
            params,
            ema,
        )
    return jax.device_get(params), jax.device_get(ema)


def _compare(cfg, spe, T, grad_scale, seed):
    params0 = _make_params(seed)
    grads = _grads_seq(T, grad_scale, seed + 1)
    t_params, t_ema, t_updates = torch_upstream(params0, grads, cfg, spe)
    j_params, j_ema = ours(params0, grads, cfg, spe)
    mask, _, _ = trainer.apply_cadence(cfg, spe, total_steps=T)
    assert int(mask.sum()) == t_updates  # same number of optimizer fires
    for m, sub in SHAPES.items():
        for n in sub:
            np.testing.assert_allclose(
                j_params[m][n], t_params[(m, n)], rtol=1e-4, atol=1e-6,
                err_msg=f"params {m}/{n}",
            )
            np.testing.assert_allclose(
                j_ema[m][n], t_ema[(m, n)], rtol=1e-4, atol=1e-6,
                err_msg=f"ema {m}/{n}",
            )


def test_warmup_ramp_vs_torch():
    """Inside warmup: the accumulate ramp, the per-group lr interp (bias
    group warming DOWN from 0.1), and the EMA all match torch step for
    step. T=90 < nw so the entire run is in the ramp."""
    cfg = TrainConfig(epochs=3, batch_size=12)  # tgt acc 64/12 = 5.33
    _compare(cfg, spe=30, T=90, grad_scale=0.5, seed=0)


def test_post_warmup_fixed_cadence_vs_torch():
    """No warmup (upstream nw=-1): fixed accumulate, pure epoch schedule,
    and gradients big enough that the global-norm-10 clip fires on most
    applies — pinning the clip placement (on the accumulated sum, before
    AdamW) and its semantics."""
    cfg = TrainConfig(epochs=2, batch_size=16, warmup_epochs=0.0)
    _compare(cfg, spe=40, T=80, grad_scale=2.0, seed=7)


def test_cos_lr_vs_torch():
    """cos_lr=True: upstream's one_cycle lambda composed with the warmup
    interp target lr0*lf(epoch)."""
    cfg = TrainConfig(epochs=4, batch_size=32, cos_lr=True,
                      warmup_epochs=1.0)
    _compare(cfg, spe=30, T=120, grad_scale=0.7, seed=3)


def test_crossing_warmup_boundary_vs_torch():
    """A run that crosses nw: warmup interp up to nw, then the per-epoch
    schedule; the cadence settles at round(nbs/batch)."""
    # spe=60, warmup 2.0 -> nw = max(120, 100) = 120; T=240 crosses it
    cfg = TrainConfig(epochs=4, batch_size=24, warmup_epochs=2.0)
    _compare(cfg, spe=60, T=240, grad_scale=0.5, seed=11)
