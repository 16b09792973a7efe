import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mslesseg.model.yolo11 import YoloConfig, create_model, param_count

# Small stride-32-divisible input keeps CPU compiles tractable
IMG = 96


@pytest.fixture(scope="module")
def model_n():
    model, cfg = create_model(nc=1, scale="n")
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(rng, x, train=False)
    return model, cfg, variables


def test_output_shapes(model_n):
    """Shape-only check via eval_shape (no compile)."""
    model, cfg, variables = model_n
    x = jax.ShapeDtypeStruct((2, IMG, IMG, 3), jnp.float32)
    out = jax.eval_shape(lambda v, x: model.apply(v, x, train=False), variables, x)
    for i, s in enumerate((8, 16, 32)):
        h = IMG // s
        assert out["box"][i].shape == (2, h, h, 4 * cfg.reg_max)
        assert out["cls"][i].shape == (2, h, h, cfg.nc)
        assert out["mcoef"][i].shape == (2, h, h, cfg.nm)
    assert out["proto"].shape == (2, IMG // 4, IMG // 4, cfg.nm)


def test_param_count_n_scale(model_n):
    """yolo11n-seg has ~2.84M params; our topology should land within a few %."""
    _, _, variables = model_n
    n = param_count(variables["params"])
    assert 2.7e6 < n < 3.0e6, n


@pytest.mark.parametrize(
    "scale,p3,p4,p5",
    [("n", 64, 128, 256), ("s", 128, 256, 512), ("m", 256, 512, 512),
     ("l", 256, 512, 512), ("x", 384, 768, 768)],
)
def test_channel_scaling_rules(scale, p3, p4, p5):
    cfg = YoloConfig(nc=1, scale=scale)
    assert cfg.head_ch == (p3, p4, p5)
    assert cfg.c3k_deep == (scale in "mlx")


def test_forward_finite_and_bn_updates(model_n):
    model, cfg, variables = model_n
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, IMG, IMG, 3)), jnp.float32)

    fwd = jax.jit(
        lambda v, x: model.apply(v, x, train=True, mutable=["batch_stats"])
    )
    out, mutated = fwd(variables, x)
    for leaf in jax.tree_util.tree_leaves(out):
        assert np.isfinite(np.asarray(leaf)).all()
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    changed = any(not np.allclose(b, a) for b, a in zip(before, after))
    assert changed
