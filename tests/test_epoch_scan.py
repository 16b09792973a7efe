"""Whole-epoch scan program vs the per-step loop: bitwise key chain,
equivalent training trajectory."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_mslesseg.model.yolo11 import create_model
from tpu_mslesseg.train import augment, data as tdata, trainer


def _tiny_dataset(n=6, hw=64, rng=None):
    rng = rng or np.random.default_rng(0)
    images = rng.integers(0, 255, (n, hw, hw), np.uint8)
    instmaps = np.zeros((n, hw, hw), np.uint8)
    boxes = np.zeros((n, 3, 4), np.float32)
    valid = np.zeros((n, 3), bool)
    for i in range(n):
        instmaps[i, 10:30, 12:40] = 1
        boxes[i, 0] = (12, 10, 40, 30)
        valid[i, 0] = True
    return {
        "images": jnp.asarray(images),
        "instmaps": jnp.asarray(instmaps),
        "boxes": jnp.asarray(boxes),
        "valid": jnp.asarray(valid),
    }


def test_split_chain_matches_host_loop():
    key = jax.random.PRNGKey(7)
    host_key = key
    host_ks = []
    for _ in range(5):
        host_key, ka = jax.random.split(host_key)
        host_ks.append(ka)
    final, ks = trainer.split_chain(key, 5)
    np.testing.assert_array_equal(np.asarray(final), np.asarray(host_key))
    np.testing.assert_array_equal(np.asarray(ks), np.stack(host_ks))


def test_epoch_fn_matches_per_step_loop():
    model, _ = create_model(nc=1, scale="n")
    # warmup_bias_lr=0 for THIS equality pin: with the upstream 0.1 bias
    # warmup, leaves whose gradient is catastrophically cancelled at init
    # (the C2PSA attention biases see max|g|~1e-7 on this 2-image 64px
    # batch) take Adam steps of full-lr magnitude in a direction set by
    # float-reassociation noise — so the scan-compiled and loop-compiled
    # programs diverge by O(lr) on those leaves BY CONSTRUCTION, not by
    # semantics (measured: non-bias params match to 1.3e-6 either way).
    # Zeroing the bias warmup closes that amplification channel; the
    # bias-warmup/cadence semantics themselves are pinned against real
    # torch.optim.AdamW in test_accumulate.py.
    cfg = trainer.TrainConfig(epochs=1, batch_size=2, imgsz=64, max_fg=8,
                              warmup_bias_lr=0.0)
    dd = _tiny_dataset()
    steps = 2
    acfg = augment.AugConfig(imgsz=64, max_inst=3, mosaic=True)

    state_a = trainer.init_train_state(model, cfg, steps)
    state_b = jax.tree_util.tree_map(jnp.copy, state_a)

    key = jax.random.PRNGKey(cfg.seed)
    key, ke = jax.random.split(key)
    idx = tdata.epoch_indices(ke, 6, cfg.batch_size, mosaic=True)
    idx = idx[:steps]

    # path A: legacy per-step loop
    step_fn = trainer.make_train_step(model, cfg, steps)
    key_a = key
    ms_a = []
    for s in range(steps):
        key_a, ka = jax.random.split(key_a)
        batch = augment.make_batch(ka, dd, idx[s], acfg)
        state_a, m = step_fn(state_a, batch)
        ms_a.append(m)

    # path B: one epoch program
    epoch_fn = trainer.make_epoch_fn(model, cfg, steps, acfg)
    key_b, kas = trainer.split_chain(key, steps)
    state_b, ms_b = epoch_fn(state_b, kas, dd, idx)

    np.testing.assert_array_equal(np.asarray(key_a), np.asarray(key_b))
    # per-step losses come out bitwise-equal in practice: identical keys
    # -> identical batches -> identical forward. (The loss at step s uses
    # the params from step s-1, so equality here also pins the updates.)
    la = np.array([float(m["loss"]) for m in ms_a])
    lb = np.asarray(ms_b["loss"])
    np.testing.assert_allclose(lb, la, rtol=1e-6)
    # batch_stats at step 2 are computed through the step-1 params, so
    # they carry the update program's scan-vs-loop reassociation noise
    # (measured <=4e-8 abs with the bias-warmup channel closed). A
    # semantic difference (wrong momentum, a missed apply) is >=1e-2.
    for ta, tb in ((state_a.batch_stats, state_b.batch_stats),):
        for a, b in zip(jax.tree_util.tree_leaves(ta),
                        jax.tree_util.tree_leaves(tb)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-7)
    # params: the scan-compiled backward fuses differently, so the LAST
    # update reassociates (measured <=1.4e-5 abs on O(0.1) weights);
    # anything larger would indicate a real semantic difference
    flat_a = jax.tree_util.tree_leaves(state_a.params)
    flat_b = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=5e-5)
    assert int(state_b.step) == steps


def test_epoch_fn_production_bias_warmup_nonbias_pin():
    """Scan-vs-loop equality on the NON-bias subset under the production
    warmup_bias_lr=0.1 — so the default-config scan program keeps an
    equality pin (ADVICE r3). Bias leaves are excluded: Adam amplifies
    reassociation noise on ~1e-7 gradients into full-lr updates there
    (see test_epoch_fn_matches_per_step_loop's rationale); everything
    else must still match tightly."""
    model, _ = create_model(nc=1, scale="n")
    cfg = trainer.TrainConfig(epochs=1, batch_size=2, imgsz=64, max_fg=8)
    assert cfg.warmup_bias_lr == 0.1  # the production default
    dd = _tiny_dataset()
    steps = 2
    acfg = augment.AugConfig(imgsz=64, max_inst=3, mosaic=True)

    state_a = trainer.init_train_state(model, cfg, steps)
    state_b = jax.tree_util.tree_map(jnp.copy, state_a)

    key = jax.random.PRNGKey(cfg.seed)
    key, ke = jax.random.split(key)
    idx = tdata.epoch_indices(ke, 6, cfg.batch_size, mosaic=True)[:steps]

    step_fn = trainer.make_train_step(model, cfg, steps)
    key_a = key
    la = []
    for s in range(steps):
        key_a, ka = jax.random.split(key_a)
        state_a, m = step_fn(state_a, augment.make_batch(ka, dd, idx[s], acfg))
        la.append(float(m["loss"]))

    epoch_fn = trainer.make_epoch_fn(model, cfg, steps, acfg)
    _, kas = trainer.split_chain(key, steps)
    state_b, ms_b = epoch_fn(state_b, kas, dd, idx)

    np.testing.assert_allclose(np.asarray(ms_b["loss"]), np.array(la),
                               rtol=1e-6)
    flat_a = jax.tree_util.tree_flatten_with_path(state_a.params)[0]
    flat_b = jax.tree_util.tree_leaves(state_b.params)
    checked = 0
    for (path, a), b in zip(flat_a, flat_b):
        if path[-1].key == "bias":
            continue
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=5e-5,
            err_msg="/".join(p.key for p in path),
        )
        checked += 1
    assert checked > 100  # the non-bias subset is the bulk of the model


def test_update_fn_past_horizon_keeps_applying():
    """Driving more micro-steps than the precomputed epochs*steps horizon
    must fall back to the fixed post-warmup cadence instead of silently
    freezing the optimizer/EMA (ADVICE r3, trainer.py:283)."""
    cfg = trainer.TrainConfig(epochs=1, batch_size=32, nbs=64,
                              warmup_epochs=0.0, imgsz=64)
    steps = 4  # horizon T=4, fixed accumulate=2 -> applies at ni 1,3
    _, update = trainer.make_update_fn(cfg, steps)
    p = {"w": {"kernel": jnp.ones((2, 2), jnp.float32)}}
    tx, _ = trainer.make_optimizer(cfg, steps)
    opt = tx.init(p)
    acc = jax.tree_util.tree_map(jnp.zeros_like, p)
    ema = jax.tree_util.tree_map(jnp.copy, p)
    g = {"w": {"kernel": jnp.full((2, 2), 0.1, jnp.float32)}}

    applied = []
    params = p
    for ni in range(10):  # 6 steps past the horizon
        before = np.asarray(params["w"]["kernel"]).copy()
        acc, opt, params, ema = update(ni, g, acc, opt, params, ema)
        applied.append(not np.array_equal(before,
                                          np.asarray(params["w"]["kernel"])))
    # within horizon: cadence mask (accumulate=2 -> ni 1, 3)
    assert applied[:4] == [False, True, False, True]
    # beyond horizon: keeps firing every `fixed` steps (ni 5, 7, 9)
    assert applied[4:] == [False, True, False, True, False, True]


def test_fold_key_chain_matches_host_loop():
    from tpu_mslesseg.train import fold_parallel

    key = jax.random.PRNGKey(3)
    host_key = key
    host_keys = []
    for _ in range(4):
        host_key, kk = jax.random.split(host_key)
        host_keys.append(jax.random.split(kk, 6))
    final, keys = fold_parallel.fold_key_chain(key, 4, 6)
    np.testing.assert_array_equal(np.asarray(final), np.asarray(host_key))
    np.testing.assert_array_equal(np.asarray(keys), np.stack(host_keys))
