"""Fused space-to-depth stem kernel == the model's b0+b1 conv chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mslesseg.model import stem_pallas
from tpu_mslesseg.model.yolo11 import create_model, fold_gray_stem


def _setup(imgsz=64, dtype=jnp.float32):
    model, _ = create_model(nc=1, scale="n", dtype=dtype)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, imgsz, imgsz, 3)), train=False
    )
    # perturb the stem BN running stats away from init (mean=0, var=1,
    # bias=0): with init stats silu(bn(0)) == 0, so the kernel's only
    # nontrivial boundary case (the virtual b0 row -1 that must be b1's
    # exact zero padding) contributes nothing and a top-border bug is
    # invisible to the parity check
    rng = np.random.default_rng(5)
    variables = jax.tree_util.tree_map(lambda x: x, variables)
    for blk in ("b0", "b1"):
        st = variables["batch_stats"][blk]["bn"]
        pp = variables["params"][blk]["bn"]
        st["mean"] = jnp.asarray(rng.normal(0.3, 0.2, st["mean"].shape), jnp.float32)
        st["var"] = jnp.asarray(rng.uniform(0.5, 2.0, st["var"].shape), jnp.float32)
        pp["bias"] = jnp.asarray(rng.normal(0.1, 0.3, pp["bias"].shape), jnp.float32)
    variables = fold_gray_stem(variables)
    x = jnp.asarray(
        np.random.default_rng(7).uniform(0, 1, (3, imgsz, imgsz)), jnp.float32
    )
    return model, variables, x


@pytest.mark.parametrize("imgsz", [64, 256])  # 256: multi-band DMA path
def test_stem_kernel_matches_conv_chain_f32(imgsz):
    model, variables, x = _setup(imgsz=imgsz)
    ref = stem_pallas.stem_reference(model, variables, x)
    w = stem_pallas.build_stem_weights(variables, dtype=jnp.float32)
    got = stem_pallas.stem_apply(w, stem_pallas.stem_s2d(x), interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_stem_kernel_matches_conv_chain_bf16():
    model, variables, x = _setup(dtype=jnp.bfloat16)
    ref = stem_pallas.stem_reference(model, variables, x).astype(jnp.float32)
    w = stem_pallas.build_stem_weights(variables, dtype=jnp.bfloat16)
    got = stem_pallas.stem_apply(
        w, stem_pallas.stem_s2d(x).astype(jnp.bfloat16), interpret=True
    ).astype(jnp.float32)
    # bf16 activations: tolerance at bf16 ulp scale
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_model_from_p2_entry_consumes_stem_output():
    model, variables, x = _setup()
    w = stem_pallas.build_stem_weights(variables, dtype=jnp.float32)
    y = stem_pallas.stem_apply(w, stem_pallas.stem_s2d(x), interpret=True)
    out_p2 = model.apply(variables, y, train=False, from_p2=True)
    out_full = model.apply(variables, x[..., None], train=False)
    # downstream of an (at-tolerance) identical stem, outputs agree
    np.testing.assert_allclose(
        np.asarray(out_p2["proto"]), np.asarray(out_full["proto"]),
        rtol=1e-4, atol=1e-4,
    )


def test_fold_gray_stem_equals_three_channel_repeat_f32():
    """conv(repeat(x,3), W) == conv(x, W.sum(in_ch)) exactly in f32 —
    the identity the grayscale serving path rests on."""
    model, _ = create_model(nc=1, scale="n", dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)), train=False
    )
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64)), jnp.float32)

    folded = fold_gray_stem(variables)
    assert folded["params"]["b0"]["conv"]["kernel"].shape[2] == 1
    # original variables untouched, fold idempotent
    assert variables["params"]["b0"]["conv"]["kernel"].shape[2] == 3
    refold = fold_gray_stem(folded)
    assert refold["params"]["b0"]["conv"]["kernel"].shape[2] == 1

    out3 = model.apply(variables, jnp.repeat(x[..., None], 3, -1), train=False)
    out1 = model.apply(folded, x[..., None], train=False)
    for k in ("proto", "p3"):
        if k in out3:
            np.testing.assert_allclose(
                np.asarray(out3[k]), np.asarray(out1[k]), rtol=1e-6, atol=1e-6
            )
