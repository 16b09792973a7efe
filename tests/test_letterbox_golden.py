"""Letterbox vs the reference's cv2 chain (Ultralytics LetterBox numerics)."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mslesseg.infer.decode import Letterbox

GOLDEN = Path(__file__).parent / "goldens" / "letterbox_golden.npz"


@pytest.fixture(scope="module")
def golden():
    if not GOLDEN.exists():
        pytest.skip("letterbox golden not generated")
    return np.load(GOLDEN)


def test_letterbox_matches_cv2(golden):
    img = golden["img"]
    expect = golden["out"].astype(np.float32) / 255.0
    top, left, new_h, new_w = golden["meta"]

    lb = Letterbox(src_h=img.shape[0], src_w=img.shape[1], size=640)
    assert (lb.pad_top, lb.pad_left, lb.new_h, lb.new_w) == (
        top, left, new_h, new_w,
    )
    got = np.asarray(lb.apply(jnp.asarray(img[None]).astype(jnp.float32) / 255.0))[0]
    assert got.shape == expect.shape
    diff = np.abs(got - expect)
    # jax.image.resize and cv2 INTER_LINEAR share half-pixel geometry; cv2
    # rounds to uint8 after interpolating, we stay float: <=1/255 apart
    assert diff.max() <= 1.5 / 255.0, diff.max()
    # padding matches exactly
    assert np.allclose(got[:, :left], 114 / 255, atol=1e-6)
    assert np.allclose(got[:, -left:], 114 / 255, atol=1e-6)
