"""Serving-program XLA flag sweep at the product batch (VERDICT r3 #8).

Times the exact bench serving program (4 patients/dispatch = b=600
slices) under a handful of cheap XLA:TPU knobs, one subprocess per
variant (XLA_FLAGS is read at backend init). Records a table; if flat,
the conv schedule is the documented floor and serving perf work stops.

Run ON TPU (sequentially — one TPU process at a time):
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts_dev/sweep_serving_flags.py
"""

import os
import subprocess
import sys

VARIANTS = {
    "baseline": "",
    "latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "scoped_vmem_32M": "--xla_tpu_scoped_vmem_limit_kib=32768",
    "scoped_vmem_64M": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "no_rwb_fusion": "--xla_tpu_rwb_fusion=false",
}

INNER = r"""
import json, time
import numpy as np
import jax, jax.numpy as jnp
from tpu_mslesseg.core.runtime import enable_compilation_cache
enable_compilation_cache()
import bench
from tpu_mslesseg.infer.consensus3 import ConsensusPredictor
from tpu_mslesseg.model.yolo11 import create_model

n_pat, n = 4, 50
base_pair = [bench.load_patient_volume("P39"), bench.load_patient_volume("P18")]
patients = [base_pair[i % 2] for i in range(n_pat)]
model, _ = create_model(nc=1, scale="n", dtype=jnp.bfloat16)
variables = jax.jit(model.init, static_argnames="train")(
    jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3)), train=False)
works = [bench.prepare_plane_work(v, g, n) for v, g in patients]
slices = {p: jnp.asarray(np.stack([np.asarray(w[p][1]) for w in works]))
          for p in works[0]}
idx = {p: jnp.asarray(np.stack([np.asarray(w[p][0], np.int32) for w in works]))
       for p in works[0]}
gts = jnp.asarray(np.stack([np.asarray(g, np.float32) for _, g in patients]))
cp = ConsensusPredictor(model, variables, patients[0][0].shape, mejora="GC")
t0 = time.time()
jax.device_get(cp.lote(slices, idx, gts)[0])
compile_s = time.time() - t0
K = 20
t0 = time.time()
outs = [cp.lote(slices, idx, gts)[0] for _ in range(K)]
for o in outs:
    jax.device_get(o)
dt = time.time() - t0
print(json.dumps({"sps": round(n_pat * n * 3 * K / dt, 1),
                  "ms_per_dispatch": round(dt / K * 1000, 1),
                  "compile_s": round(compile_s, 1)}))
"""


def main():
    # NOTE (measured): the axon client's XLA_FLAGS parser hard-fails on
    # TPU-compiler flags ("Unknown flag in XLA_FLAGS") — those belong to
    # libtpu and are passed via LIBTPU_INIT_ARGS on TPU systems.
    # Baseline runs FIRST and LAST: if the two disagree materially the
    # host/tunnel drifted mid-sweep and the table is not trustworthy.
    order = list(VARIANTS.items()) + [("baseline_again", "")]
    for name, flags in order:
        env = dict(os.environ)
        if flags:
            env["LIBTPU_INIT_ARGS"] = (
                env.get("LIBTPU_INIT_ARGS", "") + " " + flags
            ).strip()
        r = subprocess.run(
            [sys.executable, "-u", "-c", INNER],
            env=env, capture_output=True, text=True, timeout=1800,
            cwd="/root/repo",
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        print(f"{name:18s} {flags or '(default)':48s} "
              f"{line[-1] if line else 'FAILED: ' + r.stderr.strip()[-200:]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
