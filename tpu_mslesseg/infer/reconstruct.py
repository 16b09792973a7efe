"""3D volume reconstruction and multi-plane consensus — pure device ops.

The reference rebuilds volumes by reading prediction PNGs one at a time and
writing slices into a numpy volume (``reconstruir_volumen.py:179-219``) and
fuses planes with a host-side majority vote (``generar_consenso.py:106-117``).
Here both are single XLA calls: a scatter of the predicted slice batch and a
thresholded sum of the three plane volumes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_mslesseg.core import geometry


def reconstruct_volume(vol_shape, mask_slices, plane: str, indices, dtype=jnp.float32):
    """Predicted binary slices [N,H,W] -> float volume of `vol_shape`
    (zeros where no slice was predicted), one device scatter."""
    return geometry.insert_slices(
        vol_shape, jnp.asarray(mask_slices, jnp.float32), plane, indices, dtype=dtype
    )


@jax.jit
def consensus_vote(axial, coronal, sagital, umbral: int = 2):
    """Majority vote across plane volumes: >= umbral of {2,3} planes agree
    (reference `combinar_volumenes`). Returns uint8 volume."""
    total = (
        (axial > 0).astype(jnp.int32)
        + (coronal > 0).astype(jnp.int32)
        + (sagital > 0).astype(jnp.int32)
    )
    return (total >= umbral).astype(jnp.uint8)


def reconstruccion_valida(pred_shape, gt_shape) -> bool:
    """Shape-consistency validation (reference ``utils.py:183-194``)."""
    return tuple(pred_shape) == tuple(gt_shape)
