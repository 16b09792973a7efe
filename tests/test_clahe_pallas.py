"""The Pallas CLAHE path must match the golden-tested XLA implementation."""

import numpy as np
import pytest

from tpu_mslesseg.preproc import enhance
from tpu_mslesseg.preproc.clahe_pallas import clahe_batch_pallas


def test_pallas_clahe_matches_reference_impl(rng):
    imgs = rng.integers(0, 256, (2, 91, 109), dtype=np.uint8)
    ours = np.asarray(clahe_batch_pallas(imgs))
    ref = np.asarray(enhance.clahe_batch(imgs))
    diff = np.abs(ours.astype(int) - ref.astype(int))
    # identical algorithm; only float summation order differs in the blend
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 1e-3


def test_pallas_clahe_mri_sized(rng):
    imgs = rng.integers(0, 256, (1, 182, 218), dtype=np.uint8)
    ours = np.asarray(clahe_batch_pallas(imgs))
    ref = np.asarray(enhance.clahe_batch(imgs))
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1
