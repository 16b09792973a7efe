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
    except OSError:
        cpuinfo = ""
    sig = cpu_signature(cpuinfo) or platform.machine()
    tag = hashlib.sha1(sig.encode()).hexdigest()[:12]
    return f"{base}/cpu-{tag}"


def cpu_signature(cpuinfo: str) -> str:
    """CPUID signature string used to key the XLA:CPU AOT cache.

    flags alone under-key the cache: LLVM derives tuning features
    (e.g. +prefer-no-scatter) from CPUID family/model/stepping, so two
    hosts with identical flags can still produce incompatible AOT
    entries (seen as feature-mismatch warnings on load)."""
    import re

    parts = []
    for field in ("vendor_id", "cpu family", "model", "stepping",
                  "model name", "flags"):
        m = re.search(rf"^{field}\s*:\s*(.*)$", cpuinfo, re.M)
        if m:
            parts.append(f"{field}={m.group(1)}")
    return ";".join(parts)


# XLA's cpu_aot_loader compares the feature list EMBEDDED at compile time
# (LLVM target features, which include tuning pseudo-features like
# +prefer-no-scatter/+prefer-no-gather derived from the CPU *model*)
# against the HOST probe (real CPUID flags only). The tuning flags are
# never in the CPUID probe, so every load of an entry this very host
# wrote still logs an E-line per tuning feature — reproduced from a
# fresh cache written and re-read by the same process (round 4; see
# docs/aot_cache_warning.md). Cross-host loads are structurally
# prevented by the CPUID-keyed `cpu_cache_dir`, so lines naming ONLY
# tuning features are noise; lines naming any real ISA feature (e.g.
# +avx512vnni) would mean genuine poisoning and must stay visible.
_BENIGN_AOT_PATTERN = (
    r"cpu_aot_loader[^\n]*Target machine feature "
    r"\+prefer-no-(?:scatter|gather) is not"
)


def is_benign_aot_warning(line: str) -> bool:
    import re

    return re.search(_BENIGN_AOT_PATTERN, line) is not None


_aot_filter_installed = False


def filter_benign_aot_warnings() -> bool:
    """Install a process-wide fd-2 filter dropping ONLY the benign
    same-host tuning-feature AOT lines; everything else (including a
    real cross-host feature mismatch) passes through untouched.

    Used by the driver entry points (bench.py, __graft_entry__) whose
    stderr tails are recorded artifacts; NOT by the test suite (pytest
    manages fd 2 itself). Idempotent; opt out with
    TPU_MSLESSEG_NO_STDERR_FILTER=1. Returns True when active."""
    global _aot_filter_installed
    import os
    import threading

    if _aot_filter_installed:
        return True
    if os.environ.get("TPU_MSLESSEG_NO_STDERR_FILTER") == "1":
        return False
    real_stderr = os.dup(2)
    r, w = os.pipe()
    os.dup2(w, 2)
    os.close(w)

    def pump():
        buf = b""
        while True:
            chunk = os.read(r, 65536)
            if not chunk:
                break
            buf += chunk
            *lines, buf = buf.split(b"\n")
            for ln in lines:
                try:
                    benign = is_benign_aot_warning(
                        ln.decode("utf-8", "replace")
                    )
                except Exception:
                    benign = False
                if not benign:
                    os.write(real_stderr, ln + b"\n")
        if buf:
            os.write(real_stderr, buf)

    threading.Thread(target=pump, daemon=True, name="aot-warn-filter").start()
    _aot_filter_installed = True
    return True
