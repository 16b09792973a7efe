"""Golden tests: enhancement kernels vs the reference's OpenCV chains.

The reference enhances a grayscale slice by converting to BGR, running the
cv2 op, and converting back to gray when saving (`mejora_imagen.py` +
`utils.verificar_grises`). The expected outputs were generated with that
exact cv2 chain in a separate process (tests/goldens/enhance_goldens.npz —
cv2 and JAX deadlock each other's threadpools when mixed in one process,
see .claude/skills/verify/SKILL.md) and compared here against our batched
JAX kernels.
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mslesseg.preproc import enhance

GOLDENS = Path(__file__).parent / "goldens" / "enhance_goldens.npz"


@pytest.fixture(scope="module")
def goldens():
    if not GOLDENS.exists():
        pytest.skip("golden fixtures not generated")
    return np.load(GOLDENS)


def test_he_exact(goldens):
    ours = np.asarray(enhance.he_batch(goldens["imgs"]))
    np.testing.assert_array_equal(ours, goldens["HE"])


def test_he_constant_image():
    const = np.full((1, 32, 32), 7, dtype=np.uint8)
    out = np.asarray(enhance.he_batch(const))
    np.testing.assert_array_equal(out, const)


def test_clahe_close(goldens):
    ours = np.asarray(enhance.clahe_batch(goldens["imgs"]))
    diff = np.abs(ours.astype(int) - goldens["CLAHE"].astype(int))
    # LAB LUTs are bit-exact; remaining diffs are float-rounding ties in
    # the bilinear tile blend (summation order differs per backend), which
    # the backward LUT's slope can amplify to 2 gray levels on rare pixels
    assert diff.max() <= 2, diff.max()
    assert (diff > 0).mean() < 0.005, (diff > 0).mean()
    assert (diff > 1).mean() < 1e-3, (diff > 1).mean()


def test_gc_exact(goldens):
    ours = np.asarray(enhance.gc_batch(goldens["imgs"]))
    np.testing.assert_array_equal(ours, goldens["GC"])


def test_lt_exact(goldens):
    ours = np.asarray(enhance.lt_batch(goldens["imgs"]))
    np.testing.assert_array_equal(ours, goldens["LT"])


def test_normalize_matches_reference(rng):
    x = rng.normal(size=(2, 20, 30)).astype(np.float32) * 100
    ours = np.asarray(enhance.normalize_to_uint8(x))
    for i in range(2):
        f = x[i].astype(np.float32)
        f = f - f.min()
        if np.ptp(f) > 0:
            f = 255 * (f / np.ptp(f))
        ref = f.astype(np.uint8)
        # XLA may fuse the rescale into an FMA; values landing exactly on
        # an integer boundary can truncate one step apart (1-2 px/image)
        diff = np.abs(ours[i].astype(int) - ref.astype(int))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 0.01


def test_enhance_batch_dispatch(goldens):
    imgs = goldens["imgs"]
    for mejora in (None, "HE", "CLAHE", "GC", "LT"):
        out = np.asarray(enhance.enhance_batch(imgs.astype(np.float32), mejora))
        assert out.shape == imgs.shape and out.dtype == np.uint8
    with pytest.raises(ValueError):
        enhance.enhance_batch(imgs.astype(np.float32), "XX")


def test_gc_elementwise_equals_lut_all_values():
    """The TPU-fast elementwise GC must reproduce the reference LUT on all
    256 inputs for every gamma (elementwise where the trace-time IEEE
    check passes, gather fallback otherwise — e.g. gamma=1.0's float64
    truncation quirk, or non-integer gammas)."""
    all_vals = jnp.asarray(np.arange(256, dtype=np.uint8).reshape(1, 16, 16))
    for gamma in (1.0, 2.0, 3.0, 2.2, 0.5):
        ours = np.asarray(enhance.gc_batch(all_vals, gamma)).ravel()
        lut = enhance._gc_lut(gamma)
        np.testing.assert_array_equal(ours, lut[np.arange(256)], err_msg=f"gamma={gamma}")
