"""PNG interop at the filesystem boundary.

The pipeline's on-disk artifact schema stores slices/masks/predictions as
PNGs (reference `extraer_dataset.py:192-197`, `generar_predicciones.py:153`).
All compute stays in volume-slice space; these helpers apply the PNG-space
transform and 8-bit conversion only when crossing the file boundary.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image

from tpu_mslesseg.core import geometry


def save_gray(path, array2d):
    """Save a 2D uint8 array as a grayscale PNG (native encoder when the
    hostio library is available, PIL otherwise)."""
    from tpu_mslesseg.io import native

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arr = np.asarray(array2d, dtype=np.uint8)
    if native.write_gray_png(path, arr):
        return
    Image.fromarray(arr, mode="L").save(path)


def save_gray_batch(paths, arrays):
    """Write a batch of grayscale PNGs (OpenMP-parallel native writer with
    serial PIL fallback). arrays: [N, H, W] uint8."""
    from tpu_mslesseg.io import native

    paths = [Path(p) for p in paths]
    for p in paths:
        p.parent.mkdir(parents=True, exist_ok=True)
    arrays = np.asarray(arrays, dtype=np.uint8)
    if native.write_gray_png_batch(paths, arrays):
        return
    for p, a in zip(paths, arrays):
        Image.fromarray(a, mode="L").save(p)


def load_gray(path) -> np.ndarray:
    """Load a PNG as grayscale uint8 (reference `cargar_png`,
    ``utils/utils.py:364-369``)."""
    return np.array(Image.open(path).convert("L"))


def save_slice_png(path, slice2d):
    """Volume-space slice -> reference-format PNG (min-max 8-bit,
    transposed/flipped as `plt.imsave(corte.T, origin="lower")` does)."""
    png = geometry.to_png_space(np.asarray(slice2d))
    save_gray(path, geometry.minmax_to_uint8(png))


def save_mask_png(path, mask2d, binary_01=True):
    """Volume-space binary mask -> PNG with values {0,1} (reference
    normalizes masks to {0,1} before label conversion,
    ``utils/utils.py:387-393``)."""
    png = geometry.to_png_space(np.asarray(mask2d))
    vals = (png > 0).astype(np.uint8)
    save_gray(path, vals if binary_01 else vals * 255)


def save_pred_png(path, pred2d_volspace):
    """Volume-space binary prediction -> PNG {0,255} in *stored-pred*
    orientation. The reference stores `cv2.flip(pred.T, 1) * 255`
    (``generar_predicciones.py:136-153``) which equals the volume-space
    slice itself (the transforms cancel), so this writes the slice raw."""
    vals = (np.asarray(pred2d_volspace) > 0).astype(np.uint8) * 255
    save_gray(path, vals)


def load_pred_png(path) -> np.ndarray:
    """Stored prediction PNG -> volume-space binary slice (reference
    `reconstruir_volumen.py:136-151` loads channel 0 and binarizes; stored
    orientation already is volume-space)."""
    return (load_gray(path) > 0).astype(np.float32)


def load_slice_png_volspace(path) -> np.ndarray:
    """Image/GT PNG (stored in PNG space) -> volume-space float array."""
    return np.asarray(geometry.from_png_space(load_gray(path)), dtype=np.float32)
