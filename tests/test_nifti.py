import gzip
import struct

import numpy as np
import pytest

from tpu_mslesseg.io import nifti


def test_roundtrip_float32(tmp_path, rng):
    data = rng.normal(size=(5, 6, 7)).astype(np.float32)
    affine = np.diag([1.0, 2.0, 3.0, 1.0])
    affine[:3, 3] = [-10.0, 5.0, 2.5]
    path = tmp_path / "vol.nii.gz"
    nifti.save(data, affine, path)
    img = nifti.load(path)
    np.testing.assert_allclose(img.get_fdata(), data.astype(np.float64), rtol=1e-6)
    np.testing.assert_allclose(img.affine, affine, atol=1e-5)


def test_roundtrip_uint8_uncompressed(tmp_path, rng):
    data = (rng.random((4, 4, 4)) > 0.5).astype(np.uint8)
    path = tmp_path / "mask.nii"
    nifti.save(data, np.eye(4), path)
    img = nifti.load(path)
    assert img.data.dtype == np.uint8
    np.testing.assert_array_equal(img.data, data)


def test_fortran_order_layout(tmp_path):
    """NIfTI stores x-fastest; verify our writer does too."""
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    path = tmp_path / "f.nii"
    nifti.save(data, np.eye(4), path)
    raw = path.read_bytes()
    (vox_offset,) = struct.unpack_from("<f", raw, 108)
    flat = np.frombuffer(raw, dtype=np.float32, offset=int(vox_offset))
    np.testing.assert_array_equal(flat.reshape(2, 3, 4, order="F"), data)


def test_scl_slope_applied(tmp_path):
    data = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    path = tmp_path / "s.nii"
    nifti.save(data, np.eye(4), path)
    raw = bytearray(path.read_bytes())
    struct.pack_into("<2f", raw, 112, 2.0, 1.0)  # slope=2, inter=1
    path.write_bytes(bytes(raw))
    img = nifti.load(path)
    np.testing.assert_allclose(img.get_fdata(), data * 2.0 + 1.0)


def test_load_reference_demo_volume(reference_demo_dataset):
    """Read a real NIfTI from the reference demo and check the documented
    geometry: 182x218x182 voxels, 1mm isotropic (BASELINE.md)."""
    p39 = reference_demo_dataset / "P39" / "T1" / "P39_T1_FLAIR.nii.gz"
    if not p39.exists():
        pytest.skip("P39 FLAIR not present")
    img = nifti.load(p39)
    assert img.shape == (182, 218, 182)
    zooms = np.sqrt((img.affine[:3, :3] ** 2).sum(axis=0))
    np.testing.assert_allclose(zooms, 1.0, atol=1e-3)
    data = img.get_fdata()
    assert np.isfinite(data).all()
    assert data.max() > data.min()


def test_load_reference_demo_mask(reference_demo_dataset):
    mask_path = reference_demo_dataset / "P39" / "T1" / "P39_T1_MASK.nii.gz"
    if not mask_path.exists():
        pytest.skip("P39 mask not present")
    img = nifti.load(mask_path)
    data = img.get_fdata()
    vals = np.unique(data)
    assert set(vals).issubset({0.0, 1.0})
    assert data.sum() > 0
