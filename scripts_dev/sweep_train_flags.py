"""Train-step XLA flag sweep at the deployed batch (VERDICT r4 #6).

The b=128 fused augment->train-step program (bench.measure_train_
throughput — the epoch-scan body) timed under the same cheap XLA:TPU
knobs the serving sweep used, one subprocess per variant, baseline
first AND last to detect host/tunnel drift. The train step was only
ever measured at 64M scoped VMEM (−5%); this sweeps the intermediate
points plus the latency-hiding scheduler.

Each variant gets its OWN persistent-cache subdirectory. NOTE (verified
against jax._src.cache_key._hash_xla_flags): LIBTPU_INIT_ARGS *IS* part
of jax's compilation-cache key — the env var's flags are hashed exactly
like XLA_FLAGS — so a shared cache cannot hand variant B the executable
compiled under variant A's flags (the serving sweeps share the standard
cache safely; their first/last anchor repeats reproducing their own
config's number, not any other variant's, confirm it empirically).
Per-variant subdirectories here are isolation hygiene only: they keep
the sweep from writing b=128 train-step entries into the product cache.

Run ON TPU (sequentially — one TPU process at a time):
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts_dev/sweep_train_flags.py
"""

import os
import subprocess
import sys

VARIANTS = {
    "baseline": "",
    "latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "scoped_vmem_16M": "--xla_tpu_scoped_vmem_limit_kib=16384",
    "scoped_vmem_24M": "--xla_tpu_scoped_vmem_limit_kib=24576",
    "scoped_vmem_32M": "--xla_tpu_scoped_vmem_limit_kib=32768",
    "scoped_vmem_48M": "--xla_tpu_scoped_vmem_limit_kib=49152",
    "scoped_vmem_64M": "--xla_tpu_scoped_vmem_limit_kib=65536",
}

INNER = r"""
import json, time
import jax
from tpu_mslesseg.core.runtime import enable_compilation_cache
import os
enable_compilation_cache(os.environ["SWEEP_CACHE_DIR"])
import bench
peak = bench._peak_bf16_flops(jax.devices()[0])
t0 = time.time()
sps, mfu = bench.measure_train_throughput(peak)
print(json.dumps({"train_sps": round(sps, 1),
                  "mfu": None if mfu is None else round(mfu, 4),
                  "total_s": round(time.time() - t0, 1)}))
"""


def main():
    # TPU compiler flags go via LIBTPU_INIT_ARGS (the axon client's
    # XLA_FLAGS parser rejects them — r4 sweep note)
    order = list(VARIANTS.items()) + [("baseline_again", "")]
    for name, flags in order:
        env = dict(os.environ)
        if flags:
            env["LIBTPU_INIT_ARGS"] = (
                env.get("LIBTPU_INIT_ARGS", "") + " " + flags
            ).strip()
        cache = f"/root/.cache/jax_comp_cache_trainsweep/{name.replace('_again','')}"
        env["SWEEP_CACHE_DIR"] = cache
        r = subprocess.run(
            [sys.executable, "-u", "-c", INNER],
            env=env, capture_output=True, text=True, timeout=2400,
            cwd="/root/repo",
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        print(f"{name:18s} {flags or '(default)':48s} "
              f"{line[-1] if line else 'FAILED: ' + r.stderr.strip()[-200:]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
