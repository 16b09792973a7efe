"""Multi-host initialization: jax.distributed + process-0 write gating.

The reference has no distributed backend at all (SURVEY §2.3: no
torch.distributed / NCCL / MPI anywhere); the TPU framework makes
multi-host SPMD a first-class component instead. One JAX process runs per
host; `maybe_initialize()` wires them into a single global runtime
(coordinator handshake, global device view), after which the existing
mesh/pjit code paths span hosts transparently — collectives ride ICI
within a slice and DCN across slices, inserted by XLA from the same
shardings used single-host.

Filesystem discipline under multi-host SPMD: every process executes the
same stage code, so host-side artifacts (results.csv, JSON metrics,
NIfTI/PNG outputs, logs) must be written by process 0 only —
`is_main_process()` / `main_process_only` gate them. Orbax checkpoint
saves are the exception: ALL processes must call `save_checkpoint`
(orbax coordinates the primary-host write internally); gating them would
deadlock the collective save.
"""

from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger(__name__)

_initialized = False

# env vars understood (set by the launcher on each host):
#   TPU_MSLESSEG_COORDINATOR  "host:port" of process 0
#   TPU_MSLESSEG_NUM_PROCS    total number of processes
#   TPU_MSLESSEG_PROC_ID      this process's id (0-based)
# On Cloud TPU pods, jax.distributed.initialize() autodetects everything,
# so only TPU_MSLESSEG_MULTIHOST=1 is needed to opt in.
ENV_COORD = "TPU_MSLESSEG_COORDINATOR"
ENV_NPROC = "TPU_MSLESSEG_NUM_PROCS"
ENV_PID = "TPU_MSLESSEG_PROC_ID"
ENV_OPTIN = "TPU_MSLESSEG_MULTIHOST"


def maybe_initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed from explicit args or the environment.

    Returns True if the distributed runtime was (or already is) active,
    False when running single-process (the common local case — a no-op).
    Must be called BEFORE the first device query of the process (JAX
    backends bind to the local devices otherwise).
    """
    global _initialized
    if _initialized:
        return True
    coord = coordinator_address or os.environ.get(ENV_COORD)
    opt_in = os.environ.get(ENV_OPTIN, "") not in ("", "0", "false")
    if coord is None and not opt_in:
        return False

    kwargs = {}
    if coord is not None:
        kwargs["coordinator_address"] = coord
    nproc = num_processes if num_processes is not None else os.environ.get(ENV_NPROC)
    if nproc is not None:
        kwargs["num_processes"] = int(nproc)
    pid = process_id if process_id is not None else os.environ.get(ENV_PID)
    if pid is not None:
        kwargs["process_id"] = int(pid)

    jax.distributed.initialize(**kwargs)
    _initialized = True
    logger.info(
        "jax.distributed: proceso %d/%d, %d dispositivos globales",
        jax.process_index(), jax.process_count(), jax.device_count(),
    )
    return True


def shutdown():
    """Tear down the distributed runtime (tests / clean exit)."""
    global _initialized
    if _initialized:
        jax.distributed.shutdown()
        _initialized = False


def is_main_process() -> bool:
    """True on process 0 (and always true single-process). Gates every
    host-side artifact write except orbax checkpoint saves."""
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def main_process_only(fn):
    """Decorator: run fn on process 0 only; other processes get None."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if is_main_process():
            return fn(*args, **kwargs)
        return None

    return wrapper


def barrier(name: str = "barrier"):
    """Block until every process reaches this point (uses a tiny global
    psum; cheap, and correct on any initialized backend)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def broadcast_from_main(values):
    """Broadcast a small list of host floats from process 0 at full
    float64 precision (resumed best-fitness values feed a ``>=``
    comparison, so a float32 round-trip could accept a strictly worse
    model). Identity when single-process.

    broadcast_one_to_all itself downcasts f64 arrays to f32 when x64 is
    off (the default), so each float is bit-cast to two uint32 words —
    integer broadcasts are exact — and reassembled."""
    if jax.process_count() == 1:
        return [float(v) for v in values]
    import numpy as np
    from jax.experimental import multihost_utils

    bits = np.ascontiguousarray(np.asarray(values, np.float64)).view(np.uint32)
    out = np.asarray(multihost_utils.broadcast_one_to_all(bits), np.uint32)
    return [float(x) for x in np.ascontiguousarray(out).view(np.float64)]
