"""Micro-benchmarks for the serving program's hot-op alternatives (TPU).

Each timing ends with a host fetch (tunnel discipline). Run variants:
  python scripts_dev/micro_ops.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timed(fn, n=5):
    """Per-call device time with the tunnel RTT amortized out: enqueue
    K calls back-to-back (async dispatch), fetch once at the end."""
    import jax

    K = 20
    fn()  # compile+warm
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
    rng = np.random.default_rng(0)

    fetch = jax.device_get

    # --- 1. pointwise conv vs reshaped dot (b2.cv1 shape) ---
    x = jnp.asarray(rng.normal(size=(300, 160, 160, 32)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(1, 1, 32, 32)), jnp.bfloat16)
    w2 = w[0, 0]
    scale = jnp.asarray(rng.normal(size=(32,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(32,)), jnp.float32)

    @jax.jit
    def conv1x1(x):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        y = y * scale + bias
        return (jax.nn.silu(y)).astype(jnp.bfloat16)

    @jax.jit
    def dot1x1(x):
        n, h, wd, c = x.shape
        y = jax.lax.dot_general(
            x.reshape(-1, c), w2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = y * scale + bias
        return jax.nn.silu(y).astype(jnp.bfloat16).reshape(n, h, wd, -1)

    t_conv = timed(lambda: conv1x1(x)[0, 0, 0])
    t_dot = timed(lambda: dot1x1(x)[0, 0, 0])
    print(f"1x1 conv@160x32: conv={t_conv*1e3:.2f} ms  dot={t_dot*1e3:.2f} ms")

    # --- 2. b1-like 3x3 s2 conv, and an im2col-dot variant ---
    xb = jnp.asarray(rng.normal(size=(300, 320, 320, 16)), jnp.bfloat16)
    wb = jnp.asarray(rng.normal(size=(3, 3, 16, 32)), jnp.bfloat16)

    @jax.jit
    def conv3x3s2(x):
        y = jax.lax.conv_general_dilated(
            x, wb, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return jax.nn.silu(y).astype(jnp.bfloat16)

    t_b1 = timed(lambda: conv3x3s2(xb)[0, 0, 0])
    print(f"3x3s2 conv 320^2x16->32: {t_b1*1e3:.2f} ms")

    # --- 3. row gather: bf16 vs f32 vs onehot-dot ---
    mcoef = jnp.asarray(rng.normal(size=(300, 8400, 32)), jnp.bfloat16)
    kidx = jnp.asarray(rng.integers(0, 8400, (300, 300)), jnp.int32)

    @jax.jit
    def gather_bf16(mcoef, kidx):
        return jnp.take_along_axis(mcoef, kidx[..., None], axis=1)

    @jax.jit
    def gather_f32(mcoef, kidx):
        return jnp.take_along_axis(mcoef.astype(jnp.float32), kidx[..., None], axis=1)

    t_gb = timed(lambda: gather_bf16(mcoef, kidx)[0, 0, 0])
    t_gf = timed(lambda: gather_f32(mcoef, kidx)[0, 0, 0])
    print(f"gather 300x300 rows: bf16={t_gb*1e3:.2f} ms  f32={t_gf*1e3:.2f} ms")

    # --- 4. top_k vs approx_max_k on [300, 8400] ---
    scores = jnp.asarray(rng.normal(size=(300, 8400)), jnp.float32)

    @jax.jit
    def topk(s):
        return jax.lax.top_k(s, 300)

    @jax.jit
    def approxk(s):
        return jax.lax.approx_max_k(s, 300, recall_target=0.99,
                                    aggregate_to_topk=True)

    t_tk = timed(lambda: topk(scores)[0][0, :3])
    t_ak = timed(lambda: approxk(scores)[0][0, :3])
    # exactness check: same VALUES set per row (order may differ on ties)
    v1, i1 = jax.device_get(topk(scores))
    v2, i2 = jax.device_get(approxk(scores))
    exact = np.allclose(np.sort(v1, axis=1), np.sort(v2, axis=1))
    same_order = np.array_equal(i1, i2)
    print(f"top_k={t_tk*1e3:.2f} ms  approx_max_k={t_ak*1e3:.2f} ms  "
          f"same_values={exact}  same_order={same_order}")

    # --- 5. the 3-channel repeat broadcast ---
    g = jnp.asarray(rng.normal(size=(300, 640, 640)), jnp.bfloat16)

    @jax.jit
    def rep3(g):
        return jnp.repeat(g[..., None], 3, axis=-1) * 2.0

    t_rep = timed(lambda: rep3(g)[0, 0, 0])
    print(f"repeat->3ch [300,640,640]: {t_rep*1e3:.2f} ms")


if __name__ == "__main__":
    main()
