"""AOT peak-HBM probe across batch sizes for the fused train step.

VERDICT r3 #3: auto-batch resolves 32 on v5e while a manual b=64 probe
measured +12% throughput. This prints the REAL AOT peaks at a ladder of
batch sizes (no execution), what the (8,16) linear model predicts, and
what batch each probe pair would solve — the data that decides whether
the solver needs a refinement pass.

Run ON TPU: PYTHONPATH=/root/repo:$PYTHONPATH python scripts_dev/probe_autobatch.py
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpu_mslesseg.core.runtime import enable_compilation_cache

    enable_compilation_cache()

    from tpu_mslesseg.model.yolo11 import create_model
    from tpu_mslesseg.train import augment, autobatch, trainer
    from tpu_mslesseg.train.trainer import TrainConfig

    imgsz = 640
    cfg = TrainConfig(epochs=50, batch_size=8, imgsz=imgsz)
    model, _ = create_model(nc=1, scale="n", dtype=jnp.bfloat16, remat=cfg.remat)
    acfg = augment.AugConfig(imgsz=imgsz, max_inst=8, mosaic=True)

    # full-dataset-scale resident pool: 53 patients x ~150 slices
    M, H, W = int(sys.argv[1]) if len(sys.argv) > 1 else 7950, 182, 218

    class FakeSet:
        def as_dict(self):
            return {
                "images": jax.ShapeDtypeStruct((M, H, W), np.uint8),
                "instmaps": jax.ShapeDtypeStruct((M, H, W), np.uint8),
                "boxes": jax.ShapeDtypeStruct((M, 8, 4), np.float32),
                "valid": jax.ShapeDtypeStruct((M, 8), bool),
            }

    dev = jax.devices()[0]
    hbm = autobatch.device_hbm_bytes(dev)
    budget = int(hbm * autobatch.DEFAULT_FRACTION) if hbm else None
    print(f"device={dev.device_kind} hbm={hbm/2**30 if hbm else None:.2f}G "
          f"budget(0.6)={budget/2**30 if budget else None:.2f}G pool M={M}")

    peaks = {}
    for b in (8, 16, 32, 64, 96, 128):
        t0 = time.time()
        try:
            peaks[b] = autobatch._peak_bytes(model, cfg, FakeSet(), acfg, b)
        except Exception as e:
            print(f"b={b:4d}  FAILED {type(e).__name__}: {e}")
            continue
        print(f"b={b:4d}  peak={peaks[b]/2**30:7.2f}G  "
              f"compile={time.time()-t0:6.1f}s  "
              f"fits={'?' if budget is None else peaks[b] <= budget}")

    if budget and 8 in peaks and 16 in peaks:
        per = (peaks[16] - peaks[8]) / 8
        fixed = peaks[8] - per * 8
        print(f"\nlinear(8,16): fixed={fixed/2**30:.2f}G "
              f"per_image={per/2**20:.1f}MiB")
        for b in sorted(peaks):
            pred = fixed + per * b
            print(f"  b={b:4d} predicted={pred/2**30:7.2f}G "
                  f"actual={peaks[b]/2**30:7.2f}G "
                  f"err={100*(pred-peaks[b])/peaks[b]:+.1f}%")
        solved = autobatch.solve_max_batch(8, peaks[8], 16, peaks[16], budget)
        print(f"solver(8,16) -> {solved}")
        if 32 in peaks and 64 in peaks:
            solved2 = autobatch.solve_max_batch(
                32, peaks[32], 64, peaks[64], budget
            )
            print(f"solver(32,64) -> {solved2}")


if __name__ == "__main__":
    main()
