"""Dev profiling: per-stage timings of the bench pipeline on the TPU.

Honest timing on the axon tunnel: every timed region ends with a host
fetch (block_until_ready returns at dispatch — CLAUDE.md).
"""

import time
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def timed(fn, n=3):
    fn()  # warmup/compile
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

    from bench import load_patient_volume
    from tpu_mslesseg.core import geometry
    from tpu_mslesseg.evalx import metrics as mx
    from tpu_mslesseg.infer.predictor import SlicePredictor
    from tpu_mslesseg.infer.reconstruct import consensus_vote, reconstruct_volume
    from tpu_mslesseg.model.yolo11 import create_model
    from tpu_mslesseg.preproc import enhance

    vol, gt = load_patient_volume()
    model, cfg = create_model(nc=1, scale="n", dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3)), train=False
    )

    n_per_plane = 50
    planes = ("axial", "coronal", "sagital")
    work = {}
    for plane in planes:
        axis = geometry.plane_axis(plane)
        other = tuple(i for i in range(3) if i != axis)
        has = np.nonzero(np.any(gt > 0, axis=other))[0]
        centro = len(has) // 2
        idx = has[max(0, centro - 25): max(0, centro - 25) + n_per_plane]
        if len(idx) < n_per_plane:
            extra = np.setdiff1d(np.arange(gt.shape[axis]), idx)[: n_per_plane - len(idx)]
            idx = np.concatenate([idx, extra])
        slices = np.asarray(geometry.extract_slices(vol.astype(np.float32), plane, idx))
        work[plane] = (idx, slices, slices.shape[1:])

    predictors = {p: SlicePredictor(model, variables, slice_hw=work[p][2]) for p in planes}
    gt_dev = jnp.asarray(np.asarray(gt, np.float32))
    slices_dev = {p: jnp.asarray(work[p][1]) for p in planes}

    # stage 1: enhancement only
    enh = {}
    for p in planes:
        def f(p=p):
            r = enhance.enhance_for_model(slices_dev[p], "GC")
            jax.device_get(r[0, 0, 0])
            return r
        t = timed(f)
        enh[p] = f()
        print(f"enhance[{p}]: {t*1e3:.1f} ms")

    # stage 2: predictor only
    masks = {}
    for p in planes:
        def f(p=p):
            r = predictors[p](enh[p])
            jax.device_get(r[0, 0, 0])
            return r
        t = timed(f)
        masks[p] = f()
        print(f"predict[{p}]: {t*1e3:.1f} ms")

    # stage 3: reconstruct
    vols = {}
    for p in planes:
        def f(p=p):
            r = reconstruct_volume(gt.shape, masks[p], p, work[p][0])
            jax.device_get(r[0, 0, 0])
            return r
        t = timed(f)
        vols[p] = f()
        print(f"reconstruct[{p}]: {t*1e3:.1f} ms")

    # stage 4: consensus + metrics
    def f4():
        cons = consensus_vote(vols["axial"], vols["coronal"], vols["sagital"], 2)
        m = mx.compute_metrics(gt_dev, cons)
        jax.device_get(m)
        return m
    t = timed(f4)
    print(f"consensus+metrics: {t*1e3:.1f} ms")

    # full fused chain per plane for comparison (enhance->predict)
    for p in planes:
        def f(p=p):
            imgs = enhance.enhance_for_model(slices_dev[p], "GC")
            r = predictors[p](imgs)
            jax.device_get(r[0, 0, 0])
            return r
        t = timed(f)
        print(f"enhance+predict[{p}]: {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
