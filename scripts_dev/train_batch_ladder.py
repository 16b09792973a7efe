"""Measured train throughput across batch sizes on the real chip.

VERDICT r3 #3: collect the b=64 win (+12% probed in r3) — or establish
where the knee is. Reuses bench.py's measure_train_throughput (the real
fused augment->train-step program, honest host-fetch timing).

Run ON TPU: PYTHONPATH=/root/repo:$PYTHONPATH python scripts_dev/train_batch_ladder.py [batches...]
"""

import sys
import time


def main():
    import jax

    from tpu_mslesseg.core.runtime import enable_compilation_cache

    enable_compilation_cache()

    import bench

    batches = [int(a) for a in sys.argv[1:]] or [32, 64, 96, 128]
    peak = bench._peak_bf16_flops(jax.devices()[0])
    print(f"device={jax.devices()[0].device_kind} peak_bf16={peak}")
    for b in batches:
        t0 = time.time()
        try:
            sps, mfu = bench.measure_train_throughput(peak, batch=b)
        except Exception as e:
            print(f"b={b:4d}  FAILED {type(e).__name__}: {e}")
            continue
        print(
            f"b={b:4d}  {sps:7.1f} slices/s  mfu={mfu if mfu is None else round(mfu, 4)}"
            f"  (wall incl. compile {time.time()-t0:.0f}s)"
        )


if __name__ == "__main__":
    main()
