"""Dev profiling: capture a jax.profiler trace of the fused serving
program (`ConsensusPredictor.lote`, the bench path) and print the top
device ops by total duration, with hlo_category and bytes_accessed.

The tensorboard plugin is broken in this env; we parse the
plugins/profile/*/\*.trace.json.gz files directly (CLAUDE.md recipe).

Usage: python scripts_dev/profile_trace_lote.py [n_patients] [out_dir]
"""

import glob
import gzip
import json
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import numpy as np


def capture(n_pat: int, trace_dir: str):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

    from bench import load_patient_volume, prepare_plane_work
    from tpu_mslesseg.infer.consensus3 import ConsensusPredictor
    from tpu_mslesseg.model.yolo11 import create_model

    base_pair = [load_patient_volume("P39"), load_patient_volume("P18")]
    patients = [base_pair[i % 2] for i in range(n_pat)]
    vol_shape = patients[0][0].shape
    model, cfg = create_model(nc=1, scale="n", dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3)), train=False
    )
    n = 50
    works = [prepare_plane_work(v, g, n) for v, g in patients]
    slices_dev = {
        p: jnp.asarray(np.stack([np.asarray(w[p][1]) for w in works]))
        for p in works[0]
    }
    idx_dev = {
        p: jnp.asarray(np.stack([np.asarray(w[p][0], np.int32) for w in works]))
        for p in works[0]
    }
    gts_dev = jnp.asarray(np.stack([np.asarray(g, np.float32) for _, g in patients]))
    cp = ConsensusPredictor(model, variables, vol_shape, mejora="GC")

    def run():
        counts, _, _ = cp.lote(slices_dev, idx_dev, gts_dev)
        return jax.device_get(counts)

    run()  # compile + warm
    run()
    with jax.profiler.trace(trace_dir):
        for _ in range(2):
            run()


def parse(trace_dir: str, top: int = 40):
    paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    assert paths, f"no trace under {trace_dir}"
    path = max(paths)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device-side complete events carry hlo_category in args
    agg = defaultdict(lambda: [0.0, 0, "", 0.0])
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X":
            continue
        args = ev.get("args") or {}
        cat = args.get("hlo_category")
        if not cat:
            continue
        name = args.get("long_name") or ev.get("name", "?")
        key = ev.get("name", "?")
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        a = agg[key]
        a[0] += dur
        a[1] += 1
        a[2] = f"{cat} | {name[:160]}"
        try:
            a[3] += float(args.get("bytes_accessed", 0))
        except (TypeError, ValueError):
            pass
        total += dur
    print(f"trace: {path}")
    print(f"total device op time: {total:.1f} ms (across captured iterations)")
    by_cat = defaultdict(float)
    for k, (dur, cnt, desc, byts) in agg.items():
        by_cat[desc.split(" | ")[0]] += dur
    print("\n-- by hlo_category --")
    for c, d in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {d:9.2f} ms  {c}")
    print(f"\n-- top {top} ops --")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
    for k, (dur, cnt, desc, byts) in rows:
        gbs = byts / 1e9 / (dur / 1e3) if dur else 0
        print(f"  {dur:8.2f} ms x{cnt:<3} {gbs:7.1f} GB/s  {k[:60]}")
        print(f"           {desc[:170]}")


if __name__ == "__main__":
    n_pat = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/trace_lote_r3"
    capture(n_pat, out)
    parse(out)
