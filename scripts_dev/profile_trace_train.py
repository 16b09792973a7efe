"""Dev profiling: jax.profiler trace of the fused augment->train-step
program (the epoch-scan body bench measures) and top device ops.

Usage: python scripts_dev/profile_trace_train.py [batch] [out_dir]
"""

import glob
import gzip
import json
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import numpy as np


def capture(batch: int, trace_dir: str):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

    from tpu_mslesseg.model.yolo11 import create_model
    from tpu_mslesseg.train import augment, trainer
    from tpu_mslesseg.train.trainer import TrainConfig

    cfg = TrainConfig(epochs=50, batch_size=batch, imgsz=640)
    model, _ = create_model(nc=1, scale="n", dtype=jnp.bfloat16, remat=cfg.remat)
    state = trainer.init_train_state(model, cfg, steps_per_epoch=100)
    step = trainer.make_train_step_fn(model, cfg, steps_per_epoch=100)
    acfg = augment.AugConfig(imgsz=640, max_inst=8, mosaic=True)

    rng = np.random.default_rng(3)
    M, H, W = 32, 182, 218
    instmaps = np.zeros((M, H, W), np.uint8)
    instmaps[:, 60:100, 80:140] = 1
    boxes = np.zeros((M, 8, 4), np.float32)
    boxes[:, 0] = (80, 60, 140, 100)
    valid = np.zeros((M, 8), bool)
    valid[:, 0] = True
    dd = {
        "images": jnp.asarray(rng.integers(0, 255, (M, H, W)), jnp.uint8),
        "instmaps": jnp.asarray(instmaps),
        "boxes": jnp.asarray(boxes),
        "valid": jnp.asarray(valid),
    }
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (batch, 4), 0, M)

    def aug_step(state, key, idx):
        return step(state, augment.make_batch(key, dd, idx, acfg))

    jitted = jax.jit(aug_step)
    state, _ = jitted(state, key, idx)
    jax.device_get(state.step)
    state, _ = jitted(state, key, idx)
    jax.device_get(state.step)
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            state, _ = jitted(state, key, idx)
        jax.device_get(state.step)


def parse(trace_dir: str, top: int = 45):
    paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    assert paths, f"no trace under {trace_dir}"
    path = max(paths)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    agg = defaultdict(lambda: [0.0, 0, "", 0.0])
    total = 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        args = ev.get("args") or {}
        cat = args.get("hlo_category")
        if not cat:
            continue
        name = args.get("long_name") or ev.get("name", "?")
        key = ev.get("name", "?")
        dur = ev.get("dur", 0) / 1e3
        a = agg[key]
        a[0] += dur
        a[1] += 1
        a[2] = f"{cat} | {name[:150]}"
        try:
            a[3] += float(args.get("bytes_accessed", 0))
        except (TypeError, ValueError):
            pass
        total += dur
    print(f"trace: {path}")
    print(f"total device op time: {total:.1f} ms (3 steps)")
    by_cat = defaultdict(float)
    for k, (dur, cnt, desc, byts) in agg.items():
        by_cat[desc.split(" | ")[0]] += dur
    print("\n-- by hlo_category --")
    for c, d in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {d:9.2f} ms  {c}")
    print(f"\n-- top {top} ops --")
    for k, (dur, cnt, desc, byts) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]:
        gbs = byts / 1e9 / (dur / 1e3) if dur else 0
        print(f"  {dur:8.2f} ms x{cnt:<3} {gbs:7.1f} GB/s  {k[:60]}")
        print(f"           {desc[:160]}")


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/trace_train_r3"
    capture(batch, out)
    parse(out)
