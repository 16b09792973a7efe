"""Canonical geometry: plane slicing, stacking, and PNG-boundary transforms.

The framework keeps one canonical orientation in memory: a volume is an
array ``vol[X, Y, Z]`` in native NIfTI index order. Slices per anatomical
plane are (matching the reference's axis convention,
``utils/Paciente.py:186`` and ``:240-244`` of the reference repo):

    axial   : vol[:, :, i]  -> (X, Y)   axis 2
    coronal : vol[:, i, :]  -> (X, Z)   axis 1
    sagital : vol[i, :, :]  -> (Y, Z)   axis 0

The reference writes PNG slices as ``flipud(slice.T)`` (``plt.imsave(corte.T,
origin="lower")``, ``extraer_dataset.py:192``) and converts predictions back
with ``cv2.flip(pred.T, 1)`` (``generar_predicciones.py:136-140``), which
composes to the identity on the volume slice. We therefore keep all compute
in volume-slice space and only apply ``to_png_space`` / ``from_png_space``
at the PNG file boundary for artifact parity.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

PLANES = ("axial", "coronal", "sagital")
PLANE_AXIS = {"axial": 2, "coronal": 1, "sagital": 0}


def plane_axis(plane: str) -> int:
    try:
        return PLANE_AXIS[plane]
    except KeyError:
        raise ValueError(f"Unknown plane {plane!r}; expected one of {PLANES}")


def num_slices(shape, plane: str) -> int:
    """Total slice count of a volume along the given plane."""
    return shape[plane_axis(plane)]


def slice_shape(shape, plane: str):
    """(H, W) of a 2D slice extracted along `plane` from a volume `shape`."""
    axis = plane_axis(plane)
    rest = tuple(s for i, s in enumerate(shape) if i != axis)
    return rest  # order preserved: axial (X,Y), coronal (X,Z), sagital (Y,Z)


def extract_slices(vol, plane: str, indices):
    """Gather slices -> [N, H, W] (batched; device-friendly).

    `indices` may be a python sequence or an integer array.
    """
    axis = plane_axis(plane)
    indices = jnp.asarray(indices, dtype=jnp.int32)
    taken = jnp.take(vol, indices, axis=axis)
    return jnp.moveaxis(taken, axis, 0)


def insert_slices(vol_shape, slices, plane: str, indices, dtype=jnp.float32):
    """Scatter a batch of slices [N, H, W] into a zero volume of `vol_shape`.

    This is the 3D-reconstruction primitive (reference:
    ``reconstruir_volumen.py:179-219`` builds the volume slice-by-slice on
    host; here it is a single on-device scatter).
    """
    axis = plane_axis(plane)
    indices = jnp.asarray(indices, dtype=jnp.int32)
    vol = jnp.zeros(vol_shape, dtype=dtype)
    moved = jnp.moveaxis(slices.astype(dtype), 0, axis)
    idx = tuple(indices if i == axis else slice(None) for i in range(3))
    return vol.at[idx].set(moved)


def to_png_space(slice2d):
    """Volume-slice -> PNG pixel array as the reference writes it.

    Equivalent to ``plt.imsave(corte.T, origin="lower")``: row 0 of the
    stored image is the *last* column of the volume slice.
    """
    return slice2d.T[::-1, :]


def from_png_space(png2d):
    """PNG pixel array -> volume-slice. Inverse of `to_png_space`.

    Numerically identical to the reference's corrective transform
    ``cv2.flip(pred.T, 1)`` (``generar_predicciones.py:136-140``), which maps
    a prediction computed in PNG space back to volume-slice orientation.
    """
    return png2d[::-1, :].T


def to_png_space_batch(slices):
    """[N, H, W] -> [N, W, H] batch version of `to_png_space`."""
    return jnp.transpose(slices, (0, 2, 1))[:, ::-1, :]


def from_png_space_batch(pngs):
    """[N, H, W] PNG-space -> [N, W, H] volume-slice space, batched."""
    return jnp.transpose(pngs[:, ::-1, :], (0, 2, 1))


def minmax_to_uint8(x):
    """Min-max normalize to [0, 255] uint8 (reference `normalizar_a_uint8`,
    ``utils/utils.py:396-406``): per-array for 2D, per-slice for [N,H,W].
    Single implementation lives in preproc.enhance.normalize_to_uint8."""
    from tpu_mslesseg.preproc.enhance import normalize_to_uint8

    return normalize_to_uint8(x)
