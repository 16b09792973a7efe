import numpy as np
import jax.numpy as jnp
import pytest

from tpu_mslesseg.core import geometry


@pytest.fixture
def vol(rng):
    return rng.normal(size=(7, 9, 11)).astype(np.float32)


@pytest.mark.parametrize("plane", ["axial", "coronal", "sagital"])
def test_extract_matches_reference_indexing(vol, plane):
    """extract_slices must equal the reference's slice-tuple indexing
    (Paciente.indice_plano): axial vol[:,:,i], coronal vol[:,i,:],
    sagital vol[i,:,:]."""
    n = geometry.num_slices(vol.shape, plane)
    got = np.asarray(geometry.extract_slices(vol, plane, list(range(n))))
    for i in range(n):
        if plane == "axial":
            expect = vol[:, :, i]
        elif plane == "coronal":
            expect = vol[:, i, :]
        else:
            expect = vol[i, :, :]
        np.testing.assert_array_equal(got[i], expect)


@pytest.mark.parametrize("plane", ["axial", "coronal", "sagital"])
def test_extract_insert_roundtrip(vol, plane):
    n = geometry.num_slices(vol.shape, plane)
    indices = list(range(0, n, 2))
    slices = geometry.extract_slices(vol, plane, indices)
    rebuilt = np.asarray(geometry.insert_slices(vol.shape, slices, plane, indices))
    # inserted slices match, all others zero
    axis = geometry.plane_axis(plane)
    for i in range(n):
        sl = np.take(rebuilt, i, axis=axis)
        if i in indices:
            np.testing.assert_allclose(sl, np.take(vol, i, axis=axis), rtol=1e-6)
        else:
            assert np.all(sl == 0)


def test_png_space_roundtrip(rng):
    s = rng.normal(size=(182, 218)).astype(np.float32)
    png = geometry.to_png_space(s)
    # matches plt.imsave(corte.T, origin='lower'): stored row 0 = last row of corte.T
    np.testing.assert_array_equal(png, s.T[::-1, :])
    back = geometry.from_png_space(png)
    np.testing.assert_array_equal(back, s)


def test_reference_pred_transform_is_identity(rng):
    """The reference geometry chain composes to identity: a mask slice m,
    written as PNG flipud(m.T), predicted in PNG space, then corrected with
    cv2.flip(pred.T, 1), must give back m (SURVEY §3.4)."""
    m = (rng.random((10, 12)) > 0.5).astype(np.float32)
    png_space = np.asarray(geometry.to_png_space(m))
    # reference normalizar_prediccion: cv2.flip(pred.T, 1) == pred.T[:, ::-1]
    corrected = png_space.T[:, ::-1]
    np.testing.assert_array_equal(corrected, m)
    np.testing.assert_array_equal(np.asarray(geometry.from_png_space(png_space)), m)


def test_batch_png_space(rng):
    s = rng.normal(size=(4, 10, 12)).astype(np.float32)
    b = np.asarray(geometry.to_png_space_batch(jnp.asarray(s)))
    for i in range(4):
        np.testing.assert_array_equal(b[i], np.asarray(geometry.to_png_space(s[i])))
    back = np.asarray(geometry.from_png_space_batch(jnp.asarray(b)))
    np.testing.assert_array_equal(back, s)


def test_minmax_to_uint8():
    x = np.array([[0.0, 0.5], [1.0, 0.25]], dtype=np.float32)
    u = np.asarray(geometry.minmax_to_uint8(x))
    assert u.dtype == np.uint8
    assert u.min() == 0 and u.max() == 255
    # constant image doesn't divide by zero
    c = np.full((4, 4), 3.0, dtype=np.float32)
    u = np.asarray(geometry.minmax_to_uint8(c))
    assert np.all(u == 0)
