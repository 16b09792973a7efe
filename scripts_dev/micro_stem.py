"""TPU micro-bench + correctness for the fused Pallas stem at serving
shape ([300, 640, 640] bf16)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timed(fn, n=5, K=20):
    import jax

    jax.device_get(fn())
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = None
        for _ in range(K):
            out = fn()
        jax.device_get(out)
        ts.append((time.time() - t0) / K)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

    from tpu_mslesseg.model import stem_pallas
    from tpu_mslesseg.model.yolo11 import create_model, fold_gray_stem

    model, _ = create_model(nc=1, scale="n", dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3)), train=False
    )
    variables = fold_gray_stem(variables)
    w = stem_pallas.build_stem_weights(variables, jnp.bfloat16)

    rng = np.random.default_rng(0)
    B = 300
    x = jnp.asarray(rng.uniform(0, 1, (B, 640, 640)), jnp.bfloat16)

    @jax.jit
    def kern(x):
        return stem_pallas.stem_apply(w, stem_pallas.stem_s2d(x))

    @jax.jit
    def ref(x):
        return stem_pallas.stem_reference(model, variables, x)

    # correctness on 4 images (cheap fetch)
    a = np.asarray(jax.device_get(kern(x[:4]))).astype(np.float32)
    b = np.asarray(jax.device_get(ref(x[:4]))).astype(np.float32)
    err = np.abs(a - b).max()
    rel = err / max(np.abs(b).max(), 1e-6)
    print(f"max abs err vs conv chain: {err:.5f}  (rel {rel:.5f})")

    t_k = timed(lambda: kern(x)[0, 0, 0])
    t_r = timed(lambda: ref(x)[0, 0, 0])
    print(f"stem b=300: pallas={t_k*1e3:.2f} ms   xla-conv-chain={t_r*1e3:.2f} ms")


if __name__ == "__main__":
    main()
