"""Fold-parallel training: all k cross-validation folds as one SPMD program.

The reference trains its k folds strictly sequentially
(``ejecutar_pipeline.py:174-184``). The folds are embarrassingly parallel,
so on a multi-chip mesh we map them onto the ``fold`` axis: parameters and
optimizer state gain a leading fold dimension, every fold draws batches
from its own patient subset of a shared device-resident slice pool, and
one jit-compiled vmapped train step advances all folds at once. With a
(fold, data) mesh the per-fold batch further shards over ``data``.

Single-chip this still works (the fold dimension is just vectorized), and
`__graft_entry__.dryrun_multichip` exercises the sharded path on a virtual
mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_mslesseg.core import mesh as meshlib
from tpu_mslesseg.train import augment, trainer
from tpu_mslesseg.train.losses import LossConfig, segmentation_loss
from tpu_mslesseg.train.trainer import TrainConfig, TrainState


def plan_fold_mesh(n_devices: int, k_folds: int):
    """Factorize devices into a (fold, data) mesh that never degenerates.

    Returns (fold_par, k_pad): fold-axis size and the padded fold count
    (a multiple of fold_par; folds beyond k_folds are dummies whose
    results are discarded). The fold axis is the smallest divisor of
    n_devices that covers every real fold; leftover devices become the
    data axis and shard each fold's batch. Examples:
      8 dev x 5 folds -> fold=8 (pad to 8), data=1  (was gcd=1: 7 idle)
      8 dev x 4 folds -> fold=4, data=2
      4 dev x 5 folds -> fold=4 (pad to 8, 2 per device), data=1
      2 dev x 5 folds -> fold=2 (pad to 6, 3 per device), data=1
    """
    divisors = [d for d in range(1, n_devices + 1) if n_devices % d == 0]
    covering = [d for d in divisors if d >= k_folds]
    fold_par = min(covering) if covering else n_devices
    k_pad = -(-k_folds // fold_par) * fold_par
    return fold_par, k_pad


def build_fold_index_pools(meta, k_folds: int, calcular_fold_fn,
                           k_pad: int | None = None):
    """Per-fold pools of slice indices into the shared dataset.

    meta: list of (patient_id, modality, slice_idx) per dataset row.
    k_pad: total fold rows to emit (>= k_folds); rows beyond k_folds are
    dummy copies of fold 0's pool (mesh padding — trained but discarded).
    Returns (pools [F, M] int32 padded by repetition, counts [F])."""
    k_pad = k_pad or k_folds
    per_fold = [[] for _ in range(k_folds)]
    for i, (pid, _, _) in enumerate(meta):
        f = calcular_fold_fn(pid, k_folds) - 1
        for g in range(k_folds):
            if g != f:  # fold g trains on patients NOT in fold g
                per_fold[g].append(i)
    m = max(len(p) for p in per_fold)
    pools = np.zeros((k_pad, m), np.int32)
    counts = np.zeros((k_pad,), np.int32)
    for f, p in enumerate(per_fold):
        if not p:
            raise ValueError(f"Fold {f + 1} sin cortes de entrenamiento.")
        reps = -(-m // len(p))
        pools[f] = np.tile(np.asarray(p, np.int32), reps)[:m]
        counts[f] = len(p)
    for f in range(k_folds, k_pad):
        pools[f] = pools[0]
        counts[f] = counts[0]
    return jnp.asarray(pools), jnp.asarray(counts)


def init_multi_fold_state(model, cfg: TrainConfig, steps_per_epoch: int,
                          k_folds: int) -> TrainState:
    """Stacked TrainState with a leading fold axis (independent inits)."""
    states = [
        trainer.init_train_state(
            model, cfg, steps_per_epoch, rng=jax.random.PRNGKey(cfg.seed + f)
        )
        for f in range(k_folds)
    ]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def _build_local_folds(model, cfg: TrainConfig, steps_per_epoch: int,
                       acfg: augment.AugConfig, mesh=None):
    """Shared body of the step/epoch programs: fn(state_F, keys_F, pools,
    counts, dataset) advancing every locally-held fold one step.

    Folds are mapped with `shard_map` over the mesh 'fold' axis: folds
    co-located on a device run sequentially (`lax.map`), folds on
    different devices run concurrently. (A plain vmap over parameters
    can't batch grouped-conv kernels, so SPMD-over-folds is also the only
    XLA-clean formulation.) When the mesh also has a 'data' axis (>1),
    each fold's batch further shards over it: every data-shard augments
    and differentiates its slice of the batch and the grads/batch-stats
    pmean over 'data'."""
    n_data = int(mesh.shape[meshlib.DATA_AXIS]) if mesh is not None else 1
    axis = meshlib.DATA_AXIS if n_data > 1 else None
    single_step = trainer.make_train_step_fn(
        model, cfg, steps_per_epoch, axis_name=axis
    )
    if n_data > 1 and cfg.batch_size % n_data:
        raise ValueError(
            f"batch_size {cfg.batch_size} no divisible por el eje data={n_data}"
        )

    def one_fold(state, key, pool, count, dataset):
        k_idx, k_aug = jax.random.split(key)
        # sample batch_size mosaics x 4 sources from this fold's pool
        draws = jax.random.randint(k_idx, (cfg.batch_size, 4), 0, count)
        idx = pool[draws]
        if axis is not None:
            # this data-shard augments/differentiates its batch slice only
            d = jax.lax.axis_index(axis)
            local = cfg.batch_size // n_data
            idx = jax.lax.dynamic_slice_in_dim(idx, d * local, local, 0)
            k_aug = jax.random.fold_in(k_aug, d)
        batch = augment.make_batch(k_aug, dataset, idx, acfg)
        return single_step(state, batch)

    def local_folds(state_F, keys_F, pools_F, counts_F, dataset):
        # leading axis = folds local to this shard; run them sequentially
        return jax.lax.map(
            lambda args: one_fold(*args, dataset),
            (state_F, keys_F, pools_F, counts_F),
        )

    return local_folds


def make_multi_fold_step(model, cfg: TrainConfig, steps_per_epoch: int,
                         acfg: augment.AugConfig, mesh=None):
    """Returns jitted fn(state_F, keys [F], pools, counts, dataset) ->
    (state_F, metrics_F): one optimizer step for every fold (see
    `_build_local_folds` for the mapping strategy)."""
    local_folds = _build_local_folds(model, cfg, steps_per_epoch, acfg, mesh)
    if mesh is None:
        return jax.jit(local_folds)

    from jax import shard_map

    fold = P(meshlib.FOLD_AXIS)
    mapped = shard_map(
        local_folds,
        mesh=mesh,
        in_specs=(fold, fold, fold, fold, P()),
        out_specs=(fold, fold),
    )
    return jax.jit(mapped)


@functools.partial(jax.jit, static_argnames=("n", "k_pad"))
def fold_key_chain(key, n: int, k_pad: int):
    """Replicates the per-step host chain ``key, k = split(key);
    keys_F = split(k, k_pad)`` for n steps in ONE program. Returns
    (final_key, keys [n, k_pad, 2]) bitwise-equal to the host loop, so
    seeded runs and resume replay draw identical batches."""

    def body(k, _):
        k2, kk = jax.random.split(k)
        return k2, jax.random.split(kk, k_pad)

    return jax.lax.scan(body, key, None, length=n)


def make_multi_fold_epoch_fn(model, cfg: TrainConfig, steps_per_epoch: int,
                             acfg: augment.AugConfig, mesh=None):
    """Whole-epoch fold-parallel program: ``lax.scan`` over the per-step
    body INSIDE the shard_map, so an epoch of all folds is ONE dispatch
    (the per-step loop paid a tunnel round trip per step; see
    `trainer.make_epoch_fn` for the single-fold analogue).

    Returns jit(fn)(state_F, keys [S, F, 2], pools, counts, dataset) ->
    (state_F, metrics dict of [S, F])."""
    local_folds = _build_local_folds(model, cfg, steps_per_epoch, acfg, mesh)

    def local_epoch(state_F, keys_SF, pools_F, counts_F, dataset):
        def body(st, ks):
            return local_folds(st, ks, pools_F, counts_F, dataset)

        return jax.lax.scan(body, state_F, keys_SF)

    if mesh is None:
        return jax.jit(local_epoch, donate_argnums=(0,))

    from jax import shard_map

    fold = P(meshlib.FOLD_AXIS)
    step_fold = P(None, meshlib.FOLD_AXIS)
    mapped = shard_map(
        local_epoch,
        mesh=mesh,
        in_specs=(fold, step_fold, fold, fold, P()),
        out_specs=(fold, step_fold),
    )
    return jax.jit(mapped, donate_argnums=(0,))


def extract_fold_state(state_F: TrainState, fold: int) -> TrainState:
    """Slice one fold's TrainState out of the stacked state."""
    return jax.tree_util.tree_map(lambda x: x[fold], state_F)
