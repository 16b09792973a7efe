"""Serving flag sweep, round 2: combinations + higher VMEM limits.

The round-4 sweep (sweep_serving_flags.py) found two individually
positive knobs — scoped VMEM 64 MiB (+3.3%, deployed) and
--xla_tpu_rwb_fusion=false (+1.2%) — but never measured them TOGETHER,
nor scoped-VMEM limits above 64 MiB. This sweep closes that: if a combo
or a larger limit beats the deployed 64M config by >1%, it becomes the
product serving configuration (set_serving_tpu_flags).

Same protocol as round 4: exact bench serving program (4 patients,
b=600), one fresh subprocess per variant, flags via LIBTPU_INIT_ARGS,
the deployed config repeated first and last as the drift check.

Run ON TPU (sequentially — one TPU process at a time):
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts_dev/sweep_serving_flags_r5.py
"""

import os
import subprocess
import sys

from sweep_serving_flags import INNER

V64 = "--xla_tpu_scoped_vmem_limit_kib=65536"

VARIANTS = {
    "deployed_64M": V64,
    "64M+no_rwb": V64 + " --xla_tpu_rwb_fusion=false",
    "64M+latency_hiding": V64 + " --xla_tpu_enable_latency_hiding_scheduler=true",
    "scoped_vmem_80M": "--xla_tpu_scoped_vmem_limit_kib=81920",
    "scoped_vmem_96M": "--xla_tpu_scoped_vmem_limit_kib=98304",
    "scoped_vmem_128M": "--xla_tpu_scoped_vmem_limit_kib=131072",
    "no_rwb_only": "--xla_tpu_rwb_fusion=false",
}


def main():
    order = list(VARIANTS.items()) + [("deployed_64M_again", V64)]
    for name, flags in order:
        env = dict(os.environ)
        env["LIBTPU_INIT_ARGS"] = (
            env.get("LIBTPU_INIT_ARGS", "") + " " + flags
        ).strip()
        r = subprocess.run(
            [sys.executable, "-u", "-c", INNER],
            env=env, capture_output=True, text=True, timeout=1800,
            cwd="/root/repo",
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        print(f"{name:20s} {flags:80s} "
              f"{line[-1] if line else 'FAILED: ' + r.stderr.strip()[-200:]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
