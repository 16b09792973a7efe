"""Dev profiling: break down enhance+letterbox (stage A of the fused
program) into sub-stages, 150 slices (3 planes x 50). Each variant's jit
returns a SCALAR probe (computed on device) so timing includes no
big-tensor copies or transfers."""

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
    from tpu_mslesseg.preproc import enhance

    vol, gt = load_patient_volume()
    work = prepare_plane_work(vol, gt, 50)
    slices = {p: jnp.asarray(w[1]) for p, w in work.items()}
    PLANES = ("axial", "coronal", "sagital")
    lbs = {p: dec.Letterbox(src_h=geometry.slice_shape(gt.shape, p)[1],
                            src_w=geometry.slice_shape(gt.shape, p)[0])
           for p in PLANES}

    def a1(s):  # enhancement only
        return [enhance.enhance_for_model(s[p], "GC") for p in PLANES]

    def a2(s):  # + png orient + /255
        return [geometry.to_png_space_batch(x).astype(jnp.float32) / 255.0
                for x in a1(s)]

    def a3(s):  # + letterbox resize+pad
        return [lbs[p].apply(x) for p, x in zip(PLANES, a2(s))]

    def a4(s):  # + concat + 3ch repeat
        x = jnp.concatenate(a3(s), axis=0)
        return [jnp.repeat(x[..., None], 3, axis=-1)]

    def probe(f):
        def g(s):
            out = f(s)
            return sum(x.astype(jnp.float32).sum() for x in out)
        return jax.jit(g)

    for name, f in (("A1 enhance", a1), ("A2 +png+/255", a2),
                    ("A3 +letterbox", a3), ("A4 +concat+3ch", a4)):
        jf = probe(f)
        t = timed(lambda jf=jf: jax.device_get(jf(slices)))
        print(f"{name:18s} {t*1e3:7.1f} ms", flush=True)

    # enhancement variants (50 axial slices)
    def gc_lut(s):
        return [enhance.enhance_for_model(s["axial"], "GC")]

    def gc_elemwise(s):
        u8 = enhance.normalize_to_uint8(s["axial"])
        x = u8.astype(jnp.float32)
        y = jnp.floor((x / 255.0) ** 2 * 255.0)
        return [enhance.normalize_to_uint8(y)]

    for name, f in (("GC lut (50 ax)", gc_lut), ("GC elemwise", gc_elemwise)):
        jf = probe(f)
        t = timed(lambda jf=jf: jax.device_get(jf(slices)))
        print(f"{name:18s} {t*1e3:7.1f} ms", flush=True)

    # resize variants on pre-enhanced axial (png space [50, 218, 182])
    xf0 = jax.jit(lambda s: geometry.to_png_space_batch(
        enhance.enhance_for_model(s["axial"], "GC")).astype(jnp.float32) / 255.0
    )(slices)

    def _wmat(dst, src):
        out = np.zeros((dst, src), np.float32)
        scale = src / dst
        for i in range(dst):
            c = (i + 0.5) * scale - 0.5
            lo = int(np.floor(c))
            w = c - lo
            out[i, min(max(lo, 0), src - 1)] += 1 - w
            out[i, min(max(lo + 1, 0), src - 1)] += w
        return out

    dst_h, dst_w = 640, int(round(182 * 640 / 218))
    Wy = jnp.asarray(_wmat(dst_h, xf0.shape[1]))
    Wx = jnp.asarray(_wmat(dst_w, xf0.shape[2]))

    variants = {
        "resize jax.image": lambda x: jax.image.resize(
            x, (50, dst_h, dst_w), method="bilinear"),
        "resize matmul": lambda x: jnp.einsum("ah,nhw,bw->nab", Wy, x, Wx),
        "resize matmul bf16": lambda x: jnp.einsum(
            "ah,nhw,bw->nab", Wy.astype(jnp.bfloat16),
            x.astype(jnp.bfloat16), Wx.astype(jnp.bfloat16)),
    }
    for name, f in variants.items():
        jf = jax.jit(lambda x, f=f: f(x).astype(jnp.float32).sum())
        t = timed(lambda jf=jf: jax.device_get(jf(xf0)))
        print(f"{name:18s} {t*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
