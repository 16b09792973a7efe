"""Runtime placement helpers: host-prep on CPU, hot loops on the default
(TPU) backend.

Data preparation (slice extraction, resize, labeling) is throwaway-shape
eager work; dispatching it through the TPU runs a fresh device compile per
op/shape, which on a tunneled chip costs seconds each. These helpers pin
such work to the always-present CPU backend and explicitly place the final
arrays on the accelerator.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax


def cpu_device():
    return jax.local_devices(backend="cpu")[0]


@contextmanager
def host_compute():
    """Run eager jnp prep work on the CPU backend."""
    with jax.default_device(cpu_device()):
        yield


def to_accelerator(tree):
    """Place a pytree of arrays on the default device (TPU when present)."""
    dev = jax.devices()[0]
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, dev), tree)


def enable_compilation_cache(path: str = "/root/.cache/jax_comp_cache"):
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def cpu_cache_dir(base: str = "/root/.cache/jax_comp_cache") -> str:
    """Per-host-CPU compile-cache directory.

    XLA:CPU AOT results embed the compile machine's CPU feature set; a
    cache directory shared across heterogeneous hosts makes every run
    reload mismatched-feature entries (feature warnings + recompiles +
    SIGILL risk). Keying by the host's cpuinfo flags gives each machine
    its own warm CPU cache. TPU executables are host-portable and should
    keep using the flat `base` directory."""
    import hashlib
    import platform
    import re

    try:
        cpuinfo = open("/proc/cpuinfo").read()
        # flags alone under-key the cache: LLVM derives tuning features
        # (e.g. +prefer-no-scatter) from CPUID family/model/stepping, so
        # two hosts with identical flags can still produce incompatible
        # AOT entries (seen as feature-mismatch warnings on load)
        parts = []
        for field in ("vendor_id", "cpu family", "model", "stepping",
                      "model name", "flags"):
            m = re.search(rf"^{field}\s*:\s*(.*)$", cpuinfo, re.M)
            if m:
                parts.append(f"{field}={m.group(1)}")
        sig = ";".join(parts) if parts else platform.machine()
    except OSError:
        sig = platform.machine()
    tag = hashlib.sha1(sig.encode()).hexdigest()[:12]
    return f"{base}/cpu-{tag}"
