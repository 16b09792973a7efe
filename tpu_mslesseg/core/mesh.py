"""Device mesh and sharding helpers.

The reference is single-device (``args.yaml:13`` device: null; see SURVEY
§2.3) — the TPU framework makes parallelism first-class instead:

* ``data`` axis — batch/data parallelism for training and batched slice
  inference (grad psum via jit-of-sharded-arrays; XLA inserts collectives).
* optional ``fold`` axis — the k cross-validation folds are embarrassingly
  parallel; a 2D (fold, data) mesh trains several folds concurrently.

All entry points take an optional mesh; on a single chip everything
degrades to the trivial 1-device mesh.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FOLD_AXIS = "fold"


def make_mesh(n_devices: int | None = None, fold_parallel: int = 1, devices=None):
    """Build a (fold, data) mesh over the available devices.

    With ``fold_parallel == 1`` this is a pure data-parallel mesh.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % fold_parallel != 0:
        raise ValueError(f"{n} devices not divisible by fold_parallel={fold_parallel}")
    arr = np.array(devices).reshape(fold_parallel, n // fold_parallel)
    return Mesh(arr, (FOLD_AXIS, DATA_AXIS))


def data_sharding(mesh: Mesh, *rest_dims) -> NamedSharding:
    """Shard dim 0 over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *rest_dims))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of arrays with leading batch dim onto the mesh,
    sharded over the data axis."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of m that is >= n (static-shape helper)."""
    return ((n + m - 1) // m) * m


@contextmanager
def maybe_mesh(mesh: Mesh | None):
    """Enter the mesh context if one is provided."""
    if mesh is None:
        yield None
    else:
        with mesh:
            yield mesh
