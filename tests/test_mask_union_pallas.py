"""Pallas proto-mask union kernel vs the XLA reference formulation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpu_mslesseg.infer import mask_union_pallas as mup


def _rand_case(rng, n=3, mh=16, mw=16, nm=8, k=20):
    proto = rng.normal(size=(n, mh, mw, nm)).astype(np.float32)
    coef = rng.normal(size=(n, k, nm)).astype(np.float32)
    # boxes in letterbox px over a proto of stride 4 -> coords in [0, 4*m)
    x1 = rng.uniform(0, 4 * mw * 0.8, (n, k))
    y1 = rng.uniform(0, 4 * mh * 0.8, (n, k))
    boxes = np.stack(
        [x1, y1, x1 + rng.uniform(2, 4 * mw / 2, (n, k)),
         y1 + rng.uniform(2, 4 * mh / 2, (n, k))], axis=-1
    ).astype(np.float32)
    keep = rng.uniform(size=(n, k)) > 0.3
    return proto, coef, boxes, keep


def _run_both(proto, coef, boxes, keep):
    ref = jax.vmap(mup.mask_union_logits_ref)(proto, coef, boxes, keep)
    ker = mup.mask_union_logits_batch(
        proto, coef, boxes, keep, platform="tpu", interpret=True
    )
    return np.asarray(ref), np.asarray(ker)


def test_kernel_matches_reference():
    rng = np.random.default_rng(0)
    ref, ker = _run_both(*_rand_case(rng))
    np.testing.assert_allclose(ker, ref, rtol=1e-5, atol=1e-5)


def test_kernel_k_over_lane_boundary():
    # K > 128 exercises the lane padding of the detection axis
    rng = np.random.default_rng(1)
    ref, ker = _run_both(*_rand_case(rng, n=2, k=130))
    np.testing.assert_allclose(ker, ref, rtol=1e-5, atol=1e-5)


def test_kernel_all_dead_slots_give_neg():
    rng = np.random.default_rng(2)
    proto, coef, boxes, keep = _rand_case(rng, n=1)
    keep = np.zeros_like(keep)
    ref, ker = _run_both(proto, coef, boxes, keep)
    assert np.all(ker == mup._NEG)
    np.testing.assert_array_equal(ker, ref)


def test_bf16_proto_cast_is_exact():
    # the fused path feeds bf16 proto; bf16->f32 cast inside the kernel
    # must equal casting before the reference einsum
    rng = np.random.default_rng(3)
    proto, coef, boxes, keep = _rand_case(rng)
    proto_bf = jnp.asarray(proto, jnp.bfloat16)
    ref = jax.vmap(mup.mask_union_logits_ref)(proto_bf, coef, boxes, keep)
    ker = mup.mask_union_logits_batch(
        proto_bf, coef, boxes, keep, platform="tpu", interpret=True
    )
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_unaligned_pixels_fall_back_to_xla():
    # mh*mw not lane-aligned -> tile=None -> XLA path (identical results)
    rng = np.random.default_rng(4)
    proto, coef, boxes, keep = _rand_case(rng, mh=9, mw=9)
    ref = jax.vmap(mup.mask_union_logits_ref)(proto, coef, boxes, keep)
    out = mup.mask_union_logits_batch(proto, coef, boxes, keep, platform="tpu")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pick_tile():
    assert mup._pick_tile(160 * 160) == 12800
    assert mup._pick_tile(256) == 256
    assert mup._pick_tile(100) is None
    assert mup._pick_tile(128 * 257) is None  # odd groups over the cap


def test_kernel_scattered_keep_pattern():
    # kept slots interleaved with suppressed ones (NMS reality): the
    # live-slot loop bound must cover the highest kept index
    rng = np.random.default_rng(5)
    proto, coef, boxes, keep = _rand_case(rng, n=2, k=150)
    keep = np.zeros_like(keep)
    keep[:, [3, 70, 149]] = True  # forces 3 chunks, holes in between
    ref, ker = _run_both(proto, coef, boxes, keep)
    np.testing.assert_allclose(ker, ref, rtol=1e-5, atol=1e-5)
