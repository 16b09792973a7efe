"""Dev profiling: decompose the fused 3-plane program by timing variant
programs (each ends in a tiny fetch; tunnel RTT ~const across variants).

Variants:
  A. enhance+letterbox only
  B. A + model forward (fetch 1 element of proto)
  C. B + decode+NMS
  D. C + mask union
  E. full program (counts fetch)            <- bench path
Also: forward at batch 150 vs 3x50 vs 300 (MXU utilization probe).
"""

import sys, time

sys.path.insert(0, "/root/repo")

import numpy as np


def timed(fn, n=3):
    fn()
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

    from bench import load_patient_volume, prepare_plane_work
    from tpu_mslesseg.core import geometry
    from tpu_mslesseg.infer import decode as dec
    from tpu_mslesseg.infer.consensus3 import PLANES, ConsensusPredictor
    from tpu_mslesseg.infer.nms import nms_batch
    from tpu_mslesseg.infer.predictor import _mask_union_logits
    from tpu_mslesseg.model.yolo11 import create_model
    from tpu_mslesseg.preproc import enhance

    vol, gt = load_patient_volume()
    model, cfg = create_model(nc=1, scale="n", dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3)), train=False
    )
    work = prepare_plane_work(vol, gt, 50)
    slices = {p: jnp.asarray(w[1]) for p, w in work.items()}
    idx = {p: jnp.asarray(np.asarray(w[0], np.int32)) for p, w in work.items()}
    gt_dev = jnp.asarray(np.asarray(gt, np.float32))

    cp = ConsensusPredictor(model, variables, gt.shape, mejora="GC")

    def stage_a(variables, slices):
        xs = []
        for p in PLANES:
            img_u8 = enhance.enhance_for_model(slices[p], "GC")
            png = geometry.to_png_space_batch(img_u8).astype(jnp.float32) / 255.0
            xs.append(cp.lb[p].apply(png))
        x = jnp.concatenate(xs, axis=0)
        return jnp.repeat(x[..., None], 3, axis=-1)

    def stage_b(variables, slices):
        x = stage_a(variables, slices)
        return model.apply(variables, x, train=False)

    def stage_c(variables, slices):
        out = stage_b(variables, slices)
        box_d, cls_l, mcoef = dec.flatten_level_outputs(out, cfg.reg_max)
        anchors, strides = dec.make_anchors(640, 640)
        boxes = dec.decode_boxes(box_d, anchors, strides, cfg.reg_max)
        scores = jax.nn.sigmoid(cls_l.astype(jnp.float32))[..., 0]
        nb, ns, keep, kidx = nms_batch(boxes, scores, 0.25, 0.7, 300)
        kept = jnp.take_along_axis(mcoef, kidx[..., None], axis=1)
        return out, nb, keep, kept

    def stage_d(variables, slices):
        out, nb, keep, kept = stage_c(variables, slices)
        return jax.vmap(_mask_union_logits)(out["proto"], kept, nb, keep)

    ja = jax.jit(stage_a)
    jb = jax.jit(stage_b)
    jc = jax.jit(stage_c)
    jd = jax.jit(stage_d)

    t = timed(lambda: jax.device_get(ja(variables, slices)[0, 0, 0, 0]))
    print(f"A enhance+letterbox:        {t*1e3:7.1f} ms")
    t = timed(lambda: jax.device_get(jb(variables, slices)["proto"][0, 0, 0, 0]))
    print(f"B + forward:                {t*1e3:7.1f} ms")
    t = timed(lambda: jax.device_get(jc(variables, slices)[1][0, 0, 0]))
    print(f"C + decode+NMS:             {t*1e3:7.1f} ms")
    t = timed(lambda: jax.device_get(jd(variables, slices)[0, 0, 0]))
    print(f"D + mask union:             {t*1e3:7.1f} ms")
    t = timed(lambda: jax.device_get(cp(slices, idx, gt_dev)[0]))
    print(f"E full fused (bench):       {t*1e3:7.1f} ms")

    # forward-only batch scaling
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False)["proto"])
    for nb_ in (50, 150, 300):
        x = jnp.zeros((nb_, 640, 640, 3), jnp.float32)
        t = timed(lambda x=x: jax.device_get(fwd(variables, x)[0, 0, 0, 0]))
        print(f"forward only b={nb_:3d}:        {t*1e3:7.1f} ms  "
              f"({nb_/t:7.1f} img/s)")


if __name__ == "__main__":
    main()
