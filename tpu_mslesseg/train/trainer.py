"""Training loop: pjit-able train step, EMA, schedule, checkpoints, results.csv.

Replaces the training engine the reference gets from ``model.train(...)``
(``train.py:346-366``; hyperparameters frozen in ``args.yaml``):

* AdamW lr0=0.002 (the auto-optimizer rule for this dataset size — verified
  against the reference's logged lr trace: 6.6e-4 @ep1, 5.96e-5 @ep50),
  linear decay to lrf=0.01, 3-epoch linear warmup, weight decay 5e-4 on
  conv kernels only;
* bf16-able forward, f32 params/optimizer; BatchNorm stats updated in-step
  (global under data parallelism: jit-SPMD reduces over the sharded batch
  axis with XLA-inserted collectives);
* EMA of params (decay 0.9999 * (1 - exp(-step/2000))) used for val/export;
* per-epoch results.csv row (reference schema) + Orbax checkpoints with
  best/last selection.

The step is one fused XLA program: augmentation batch -> forward -> loss ->
grads -> optimizer -> EMA. With a mesh it runs data-parallel via shardings;
single chip it degrades to the trivial layout.
"""

from __future__ import annotations

import csv
import functools
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from tpu_mslesseg.train import augment
from tpu_mslesseg.train.losses import LossConfig, segmentation_loss


@dataclass(frozen=True)
class TrainConfig:
    epochs: int = 50
    batch_size: int = 32
    lr0: float = 0.002
    lrf: float = 0.01
    warmup_epochs: float = 3.0
    # bias params warm from this lr instead of 0 (reference
    # args.yaml:19 warmup_bias_lr: 0.1; upstream param_groups[0])
    warmup_bias_lr: float = 0.1
    weight_decay: float = 5e-4
    # nominal batch (args.yaml nbs: 64): gradients accumulate over
    # round(nbs/batch) micro-batches per optimizer step and the weight
    # decay scales by batch*accumulate/nbs — the reference's effective
    # batch is ~nbs regardless of what auto-batch resolved per device
    nbs: int = 64
    ema_decay: float = 0.9999
    ema_tau: float = 2000.0
    close_mosaic: int = 10
    # early stopping on fitness plateau (args.yaml:7 patience: 100 — it
    # never fires in a 50-epoch run, but the stopper is part of the
    # upstream loop): stop after `patience` VALIDATED epochs without a
    # fitness improvement — identical to upstream's epoch count when
    # validation runs every epoch, still well-defined at val_every > 1
    patience: int = 100
    # periodic epoch checkpoints (args.yaml:10 save_period: -1 = off);
    # >0 writes weights/epoch<N>.ckpt every N epochs like upstream
    save_period: int = -1
    # cosine LR decay (args.yaml:24 cos_lr: false — upstream one_cycle
    # lambda when enabled; the reference runs use the linear default)
    cos_lr: bool = False
    imgsz: int = 640
    seed: int = 0
    max_fg: int = 64
    # training visual artifacts (results.png, curves, batch previews) as
    # the reference's run dir ships (args.yaml plots: true)
    plots: bool = True
    # AMP parity with the reference (args.yaml:8 amp: true): bf16 compute
    # dtype in the model, f32 master params / optimizer / BN stats / losses.
    # Consumed at model-creation time (stages/train.py); the train step
    # itself is dtype-agnostic.
    amp: bool = True
    # warm-start weights (args.yaml:15 pretrained: true — the reference
    # fine-tunes from COCO yolo11n-seg.pt, ConfigTrain.py:139). Path to an
    # ultralytics .pt on disk, imported torch-free via model/import_pt.py
    # with ultralytics' intersect-on-shape semantics; "" = clean init.
    pretrained: str = ""
    # rematerialize the big model blocks in backward (bit-identical
    # results, trades recompute FLOPs for activation HBM -> larger
    # auto-batch). Consumed at model-creation time like `amp`.
    remat: bool = True


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray
    # gradient-accumulation buffer (zeros between optimizer steps); the
    # optimizer applies every `accumulate_steps(cfg)` micro-batches
    grad_accum: Any = None


def accumulate_steps(cfg: TrainConfig) -> int:
    """Micro-batches per optimizer step at build time (upstream:
    ``max(round(nbs / batch_size), 1)`` — sizes the weight-decay scale
    and the post-warmup cadence; see `apply_cadence` for the warmup
    ramp)."""
    return max(round(cfg.nbs / max(cfg.batch_size, 1)), 1)


def apply_cadence(cfg: TrainConfig, steps_per_epoch: int,
                  total_steps: int | None = None):
    """Upstream's optimizer-apply cadence over the whole run, precomputed.

    Ultralytics ramps ``accumulate`` itself during warmup (its trainer
    re-evaluates ``accumulate = max(1, round(interp(ni, [0, nw],
    [1, nbs / batch])))`` every micro-batch while ``ni <= nw``, consumed
    by ``scripts/train.py:358-366``'s train call) and fires the optimizer
    when ``ni - last_opt_step >= accumulate`` — so at the start of warmup
    the optimizer steps EVERY micro-batch and the gap widens to
    ``round(nbs/batch)`` by iteration nw. With ``warmup_epochs <= 0``
    upstream sets nw = -1 (no ramp: fixed gap from the build-time value).

    The whole sequence is a deterministic function of the micro-step, so
    it is precomputed on host and embedded as program constants — the
    train state needs no ``last_opt_step`` carry and checkpoints keep
    their layout. Returns per-micro-step ``apply_mask`` (does the
    optimizer fire at step ni), inclusive ``n_applies`` (the EMA update
    counter at an apply), and ``apply_ni`` (micro-step of the c-th apply
    — the LR the optimizer sees at its c-th update).
    """
    T = int(total_steps if total_steps is not None
            else steps_per_epoch * cfg.epochs)
    # memoized: make_optimizer and make_update_fn both need the cadence,
    # and a step-fn build would otherwise run the O(T) host loop twice
    return _apply_cadence_cached(
        cfg.warmup_epochs, cfg.nbs, cfg.batch_size, steps_per_epoch, T,
        accumulate_steps(cfg),
    )


@functools.lru_cache(maxsize=64)
def _apply_cadence_cached(warmup_epochs, nbs, batch_size, steps_per_epoch,
                          T, fixed):
    mask = np.zeros(max(T, 1), np.bool_)
    if warmup_epochs > 0:
        nw = max(round(warmup_epochs * steps_per_epoch), 100)
        tgt = nbs / max(batch_size, 1)
        last = -1
        acc = fixed
        for ni in range(mask.size):
            if ni <= nw:
                # round() on the interp float is Python round-half-even,
                # like upstream's
                acc = max(1, round(float(np.interp(ni, [0, nw], [1.0, tgt]))))
            if ni - last >= acc:
                mask[ni] = True
                last = ni
    else:
        mask[fixed - 1 :: fixed] = True
    mask.setflags(write=False)  # cached arrays are shared across callers
    n_applies = np.cumsum(mask).astype(np.int32)
    apply_ni = np.nonzero(mask)[0].astype(np.int32)
    if apply_ni.size == 0:  # degenerate short runs: keep the LUT non-empty
        apply_ni = np.zeros(1, np.int32)
    n_applies.setflags(write=False)
    apply_ni.setflags(write=False)
    return mask, n_applies, apply_ni


def lr_schedule(cfg: TrainConfig, steps_per_epoch: int, start: float = 0.0):
    """Warmup into per-epoch linear decay to lrf, faithful to the
    upstream loop: the warmup is a per-micro-batch interp over
    ``nw = max(round(warmup_epochs * steps_per_epoch), 100)`` iterations
    from `start` (0 for weights, warmup_bias_lr for biases) to the
    current epoch's scheduled lr. With ``warmup_epochs <= 0`` upstream
    disables the warmup entirely (nw = -1): the lr is the epoch schedule
    from step 0, with no 100-iteration floor."""
    warm = max(round(cfg.warmup_epochs * steps_per_epoch), 100)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        epoch = jnp.floor(step / steps_per_epoch)
        if cfg.cos_lr:
            # upstream one_cycle(1, lrf, epochs)
            lf = ((1.0 - jnp.cos(epoch * jnp.pi / cfg.epochs)) / 2.0) * (
                cfg.lrf - 1.0
            ) + 1.0
        else:
            lf = (1.0 - epoch / cfg.epochs) * (1.0 - cfg.lrf) + cfg.lrf
        if cfg.warmup_epochs <= 0:
            return cfg.lr0 * lf
        frac = jnp.clip(step / warm, 0.0, 1.0)
        return start * (1.0 - frac) + cfg.lr0 * lf * frac

    return fn


def _wd_mask(params):
    def mask(path, leaf):
        return path[-1].key == "kernel"

    return jax.tree_util.tree_map_with_path(mask, params)


def _bias_labels(params):
    """'bias' / 'rest' partition, matching upstream build_optimizer's
    param_groups[0] (everything literally named bias, incl. BN biases)."""

    def label(path, leaf):
        return "bias" if path[-1].key == "bias" else "rest"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int):
    """AdamW (upstream optimizer=auto resolves AdamW for this workload;
    betas (0.9, 0.999)) with the reference's three-group semantics:
    biases get no decay and warm from warmup_bias_lr; BN scales get no
    decay (wd mask covers kernels only); the decay itself scales by
    ``batch*accumulate/nbs``.

    The optimizer is stepped on the summed gradients at upstream's
    apply cadence (see `apply_cadence` — during warmup the gap between
    applies ramps from 1 to accumulate), so its internal count c
    advances per APPLY; the schedules compose through the precomputed
    ``c -> apply_ni[c]`` micro-step LUT — the lr upstream's param groups
    hold at the exact micro-batch where ``ni - last_opt_step >=
    accumulate`` fires."""
    acc = accumulate_steps(cfg)
    sched = lr_schedule(cfg, steps_per_epoch)
    sched_bias = lr_schedule(cfg, steps_per_epoch, start=cfg.warmup_bias_lr)
    _, _, apply_ni = apply_cadence(cfg, steps_per_epoch)
    lut = jnp.asarray(apply_ni)
    at_apply = lambda s: (lambda c: s(jnp.take(lut, jnp.clip(c, 0, lut.size - 1))))
    wd_eff = cfg.weight_decay * cfg.batch_size * acc / cfg.nbs
    tx = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.multi_transform(
            {
                "bias": optax.adamw(
                    learning_rate=at_apply(sched_bias), b1=0.9, b2=0.999,
                    weight_decay=0.0,
                ),
                "rest": optax.adamw(
                    learning_rate=at_apply(sched), b1=0.9, b2=0.999,
                    weight_decay=wd_eff, mask=_wd_mask,
                ),
            },
            _bias_labels,
        ),
    )
    return tx, sched


def init_train_state(model, cfg: TrainConfig, steps_per_epoch: int, rng=None):
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
    x = jnp.zeros((1, cfg.imgsz, cfg.imgsz, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(rng, x, train=False)
    if cfg.pretrained:
        from tpu_mslesseg.model.import_pt import load_pretrained
        from tpu_mslesseg.pipeline.logging_setup import get_logger

        variables, report = load_pretrained(cfg.pretrained, variables)
        get_logger(__file__).info(
            f"🧬 Pretrained {cfg.pretrained}: "
            f"{len(report['transferred'])}/{report['total_ours']} transferidos "
            f"({len(report['mismatched'])} sin forma compatible)."
        )
    tx, _ = make_optimizer(cfg, steps_per_epoch)
    return TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        # independent buffers: the train step donates the state, and
        # aliased params/ema leaves would be donated twice
        ema_params=jax.tree_util.tree_map(jnp.copy, variables["params"]),
        step=jnp.zeros((), jnp.int32),
        grad_accum=jax.tree_util.tree_map(
            jnp.zeros_like, variables["params"]
        ),
    )


def make_update_fn(cfg: TrainConfig, steps_per_epoch: int):
    """The optimizer half of the train step, isolated for reuse and for
    the differential test against real torch.optim.AdamW
    (tests/test_optimizer_torch_parity.py): sum the micro-gradient into
    the carry; at the upstream apply cadence (`apply_cadence`) clip the
    sum (global norm 10 — upstream optimizer_step), AdamW-step, and
    update the EMA once with its decay ramp driven by the apply count.

    ``update(step_i, grads, grad_accum, opt_state, params, ema) ->
    (new_accum, new_opt, new_params, new_ema)``; `step_i` is the 0-based
    micro-step (upstream's ni). Both lax.cond branches derive their
    outputs from the operands so the cond stays valid inside shard_map.
    """
    tx, _ = make_optimizer(cfg, steps_per_epoch)
    mask, napp, apply_ni = apply_cadence(cfg, steps_per_epoch)
    mask_c = jnp.asarray(mask)
    napp_c = jnp.asarray(napp)
    fixed = accumulate_steps(cfg)
    last_ni = int(apply_ni[-1])  # micro-step of the final precomputed apply

    def update(step_i, grads, grad_accum, opt_state, params, ema):
        grads_sum = jax.tree_util.tree_map(
            lambda a, g: a + g.astype(a.dtype), grad_accum, grads
        )
        i = jnp.clip(step_i, 0, mask_c.size - 1)
        # past the precomputed horizon (a caller driving more steps than
        # the build-time epochs*steps_per_epoch, e.g. a resume with a
        # smaller nominal) the optimizer must NOT silently freeze: fall
        # back to the fixed post-warmup cadence anchored at the last
        # precomputed apply; the lr LUT clamps to the final schedule value
        since = step_i - last_ni
        beyond = step_i >= mask_c.size
        do_apply = jnp.where(
            beyond,
            jnp.logical_and(since > 0, since % fixed == 0),
            mask_c[i],
        )
        # ema update count at an apply (inclusive)
        n_applies = jnp.where(
            beyond, napp_c[-1] + since // fixed, napp_c[i]
        )

        def apply_branch(args):
            grads_sum, opt_state, params, ema = args
            updates, new_opt = tx.update(grads_sum, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            d = cfg.ema_decay * (1.0 - jnp.exp(-n_applies / cfg.ema_tau))
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p.astype(e.dtype) * (1 - d),
                ema,
                new_params,
            )
            zeros = jax.tree_util.tree_map(jnp.zeros_like, grads_sum)
            return zeros, new_opt, new_params, new_ema

        def skip_branch(args):
            grads_sum, opt_state, params, ema = args
            return grads_sum, opt_state, params, ema

        return jax.lax.cond(
            do_apply, apply_branch, skip_branch,
            (grads_sum, opt_state, params, ema),
        )

    return tx, update


def make_train_step_fn(model, cfg: TrainConfig, steps_per_epoch: int,
                       axis_name: str | None = None):
    """Un-jitted train step. Under jit-SPMD (sharded batch, replicated
    params) XLA inserts the gradient all-reduce itself; inside `shard_map`
    pass `axis_name` and the step pmean-s grads/batch_stats/metrics over
    that mesh axis explicitly."""
    _, update = make_update_fn(cfg, steps_per_epoch)
    loss_cfg = LossConfig(imgsz=cfg.imgsz, max_fg=cfg.max_fg)

    def step(state: TrainState, batch):
        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["images"],
                train=True,
                mutable=["batch_stats"],
            )
            labels = jnp.zeros(batch["valid"].shape, jnp.int32)
            total, parts = segmentation_loss(
                out, batch["boxes"], labels, batch["valid"],
                batch["instmap_proto"], loss_cfg,
            )
            return total, (parts, mutated["batch_stats"])

        (loss, (parts, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            new_bs = jax.lax.pmean(new_bs, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            parts = jax.lax.pmean(parts, axis_name)

        # gradient accumulation to the nominal batch (upstream nbs=64):
        # micro-batch gradients SUM into the carry; the optimizer applies
        # on the sum at upstream's cadence (warmup-ramped accumulate —
        # see make_update_fn / apply_cadence).
        new_accum, new_opt, new_params, new_ema = update(
            state.step, grads, state.grad_accum, state.opt_state,
            state.params, state.ema_params,
        )
        new_state = TrainState(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            ema_params=new_ema,
            step=state.step + 1,
            grad_accum=new_accum,
        )
        metrics = {"loss": loss, **{k: parts[k] for k in ("box", "seg", "cls", "dfl")}}
        return new_state, metrics

    return step


def make_train_step(model, cfg: TrainConfig, steps_per_epoch: int):
    return jax.jit(
        make_train_step_fn(model, cfg, steps_per_epoch), donate_argnums=(0,)
    )


@functools.partial(jax.jit, static_argnames=("n",))
def split_chain(key, n: int):
    """Replicates ``for _ in range(n): key, k = jax.random.split(key)`` in
    ONE program. Returns (final_key, ks [n, 2]) bitwise-equal to the host
    loop — the per-step key chain survives the move to epoch programs, so
    seeded runs (and resume replay) draw identical batches either way."""

    def body(k, _):
        k2, ka = jax.random.split(k)
        return k2, ka

    return jax.lax.scan(body, key, None, length=n)


def make_epoch_fn(model, cfg: TrainConfig, steps_per_epoch: int, acfg):
    """Whole-epoch train program: ``lax.scan`` over (augment -> step) with
    the device-resident dataset.

    The per-step loop pays TWO dispatches per step (augmentation batch +
    train step); through a tunneled TPU each dispatch costs a host round
    trip comparable to the sub-100ms step compute itself. Scanning the
    epoch on device makes it ONE dispatch per epoch; the augmentation
    pipeline stays on device (TPU-first replacement for the reference's
    ``workers: 8`` host dataloader processes, ``args.yaml:14``).

    Returns jit(epoch)(state, k_augs [S,2], dataset_dict, idx [S,B,4]) ->
    (state, metrics dict of [S] arrays). Batches are bitwise identical to
    the per-step path when k_augs comes from `split_chain`.
    """
    from tpu_mslesseg.train import augment as _aug

    step = make_train_step_fn(model, cfg, steps_per_epoch)

    def epoch(state, k_augs, dataset, idx):
        def body(st, xs):
            k_aug, idx_s = xs
            batch = _aug.make_batch(k_aug, dataset, idx_s, acfg)
            return step(st, batch)

        return jax.lax.scan(body, state, (k_augs, idx))

    return jax.jit(epoch, donate_argnums=(0,))


RESULTS_HEADER = [
    "epoch", "time",
    "train/box_loss", "train/seg_loss", "train/cls_loss", "train/dfl_loss",
    "metrics/precision(B)", "metrics/recall(B)", "metrics/mAP50(B)",
    "metrics/mAP50-95(B)", "metrics/precision(M)", "metrics/recall(M)",
    "metrics/mAP50(M)", "metrics/mAP50-95(M)",
    "val/box_loss", "val/seg_loss", "val/cls_loss", "val/dfl_loss",
    "lr/pg0", "lr/pg1", "lr/pg2",
]


class ResultsWriter:
    """Per-epoch results.csv in the reference schema (``results.csv`` header
    of the shipped training runs)."""

    def __init__(self, path, append: bool = False, from_epoch: int | None = None):
        from tpu_mslesseg.core import distributed

        self.path = Path(path)
        self.t0 = time.time()
        # multi-host SPMD: every process runs the train loop; only process
        # 0 owns the results.csv artifact
        self.enabled = distributed.is_main_process()
        if not self.enabled:
            return
        self.path.parent.mkdir(parents=True, exist_ok=True)
        if append and self.path.exists():
            # resume: keep rows before the resume point (the checkpoint is
            # saved every 10 epochs, so later rows would otherwise appear
            # twice) and continue the wall-clock column
            try:
                with open(self.path) as f:
                    rows = list(csv.reader(f))
                kept = [rows[0]] + [
                    r for r in rows[1:]
                    if from_epoch is None or int(r[0]) < from_epoch
                ]
                with open(self.path, "w", newline="") as f:
                    csv.writer(f).writerows(kept)
                if len(kept) > 1:
                    self.t0 = time.time() - float(kept[-1][1])
            except (IndexError, ValueError):
                pass
            return
        with open(self.path, "w", newline="") as f:
            csv.writer(f).writerow(RESULTS_HEADER)

    def write_epoch(self, epoch, train_losses, val_metrics, val_losses, lr):
        """`lr` is (bias_lr, weight_lr) or a single float. Columns follow
        upstream param-group order: pg0 = biases (warms from
        warmup_bias_lr), pg1 = decayed weights, pg2 = BN weights — pg1
        and pg2 always share the plain schedule."""
        if not self.enabled:
            return
        lr_b, lr_w = lr if isinstance(lr, (tuple, list)) else (lr, lr)
        row = [
            epoch,
            round(time.time() - self.t0, 4),
            *[round(float(train_losses.get(k, 0)), 5) for k in ("box", "seg", "cls", "dfl")],
            *[round(float(val_metrics.get(k, 0)), 5) for k in (
                "precision_b", "recall_b", "map50_b", "map_b",
                "precision_m", "recall_m", "map50_m", "map_m")],
            *[round(float(val_losses.get(k, 0)), 5) for k in ("box", "seg", "cls", "dfl")],
            *[f"{v:.6g}" for v in (lr_b, lr_w, lr_w)],
        ]
        with open(self.path, "a", newline="") as f:
            csv.writer(f).writerow(row)


def fitness(val_metrics: dict) -> float:
    """Ultralytics seg fitness: 0.1*mAP50 + 0.9*mAP50-95 for boxes and
    masks, summed — drives best-checkpoint selection."""
    return (
        0.1 * val_metrics.get("map50_b", 0.0)
        + 0.9 * val_metrics.get("map_b", 0.0)
        + 0.1 * val_metrics.get("map50_m", 0.0)
        + 0.9 * val_metrics.get("map_m", 0.0)
    )
