"""Fold-parallel training over a (fold, data) mesh on the virtual 8-device
CPU backend: 4 folds x 2-way data parallel in one SPMD step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mslesseg.core import mesh as meshlib
from tpu_mslesseg.train import augment, fold_parallel
from tpu_mslesseg.train.trainer import TrainConfig
from tpu_mslesseg.model.yolo11 import create_model


@pytest.fixture(scope="module")
def tiny_pool(rng):
    M, H, W = 12, 48, 40
    images = rng.integers(0, 255, (M, H, W)).astype(np.uint8)
    instmaps = np.zeros((M, H, W), np.uint8)
    instmaps[:, 10:22, 8:20] = 1
    boxes = np.zeros((M, 4, 4), np.float32)
    boxes[:, 0] = (8, 10, 20, 22)
    valid = np.zeros((M, 4), bool)
    valid[:, 0] = True
    meta = [(f"P{1 + (i % 4) * 13}", "FLAIR", i) for i in range(M)]
    dataset = {
        "images": jnp.asarray(images),
        "instmaps": jnp.asarray(instmaps),
        "boxes": jnp.asarray(boxes),
        "valid": jnp.asarray(valid),
    }
    return dataset, meta


def test_build_fold_index_pools(tiny_pool):
    from tpu_mslesseg.pipeline.paciente import calcular_fold

    _, meta = tiny_pool
    pools, counts = fold_parallel.build_fold_index_pools(meta, 4, calcular_fold)
    assert pools.shape[0] == 4
    # every fold excludes its own patients: patient P1+13f belongs to fold
    # f+1 (ids 1,14,27,40 span the 4 folds of 53)
    for f in range(4):
        own = {i for i, (pid, _, _) in enumerate(meta)
               if calcular_fold(pid, 4) == f + 1}
        pool_set = set(np.asarray(pools[f][: int(counts[f])]).tolist())
        assert pool_set.isdisjoint(own)
        assert len(pool_set) > 0


def test_multi_fold_step_on_mesh(tiny_pool):
    from tpu_mslesseg.pipeline.paciente import calcular_fold

    dataset, meta = tiny_pool
    n_dev = len(jax.devices())
    if n_dev < 8:
        pytest.skip("needs the virtual 8-device mesh")
    mesh = meshlib.make_mesh(n_devices=8, fold_parallel=4)

    cfg = TrainConfig(epochs=1, batch_size=2, imgsz=64, max_fg=8)
    model, _ = create_model(nc=1, scale="n")
    acfg = augment.AugConfig(imgsz=64, max_inst=4, mosaic=True)

    pools, counts = fold_parallel.build_fold_index_pools(meta, 4, calcular_fold)
    state = fold_parallel.init_multi_fold_state(model, cfg, 2, k_folds=4)
    step = fold_parallel.make_multi_fold_step(model, cfg, 2, acfg, mesh=mesh)

    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    with mesh:
        state, metrics = step(state, keys, pools, counts, dataset)
        losses = np.asarray(metrics["loss"])
    assert losses.shape == (4,)
    assert np.isfinite(losses).all()
    # independent inits -> distinct losses per fold
    assert len(np.unique(np.round(losses, 4))) > 1
    # steps advanced for every fold
    assert np.asarray(state.step).tolist() == [1, 1, 1, 1]
