"""End-to-end benchmark: FLAIR slices/sec/chip through the full fused
pipeline (enhance -> predict -> reconstruct -> consensus -> metrics).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline grounding (VERDICT r1 weak #4): the reference itself cannot run
here — its engine is `ultralytics` (requirements.txt:44), which is not
installed and this environment has zero egress; the bench reports that
fact in `reference_runnable`. Instead of an embedded constant, every run
now ALSO measures this repo's own pipeline on the XLA-CPU backend in the
same process (`measured_cpu_sps`) — a batched XLA program, strictly
faster than the reference's per-slice torch loop
(``generar_predicciones.py:175-226``) on the same host — and reports the
chip speedup against that measured, reproducible floor
(`vs_measured_cpu`). `vs_baseline` keeps the original 2.5 slices/s
reference-CPU estimate for cross-round comparability.
"""

from __future__ import annotations

import json
import time
import zlib
from pathlib import Path

import numpy as np

BASELINE_SLICES_PER_S = 2.5
DEMO_DS = Path("/root/reference/demo/MSLesSeg-Dataset/train")


def load_patient_volume(pid: str = "P39"):
    """Demo-patient FLAIR + GT from the reference demo, or synthetic
    fallback."""
    from tpu_mslesseg.io import nifti

    flair_p = DEMO_DS / pid / "T1" / f"{pid}_T1_FLAIR.nii.gz"
    mask_p = DEMO_DS / pid / "T1" / f"{pid}_T1_MASK.nii.gz"
    if flair_p.exists():
        return nifti.load(flair_p).get_fdata(), nifti.load(mask_p).get_fdata()
    # deterministic digest (hash() is salted per process via PYTHONHASHSEED,
    # which would change the synthetic input — and the number — every run)
    rng = np.random.default_rng(zlib.crc32(pid.encode()))
    vol = rng.normal(500, 150, (182, 218, 182)).astype(np.float64)
    mask = np.zeros((182, 218, 182))
    mask[80:100, 100:130, 70:110] = 1
    return vol, mask


def prepare_plane_work(vol, gt, n_per_plane: int):
    """Lesion-centered slice indices + extracted raw slices per plane
    (host, one-time pre-stage)."""
    from tpu_mslesseg.core import geometry

    work = {}
    for plane in ("axial", "coronal", "sagital"):
        axis = geometry.plane_axis(plane)
        other = tuple(i for i in range(3) if i != axis)
        has = np.nonzero(np.any(gt > 0, axis=other))[0]
        centro = len(has) // 2
        lo = max(0, centro - n_per_plane // 2)
        idx = has[lo : lo + n_per_plane]
        if len(idx) < n_per_plane:  # pad with neighbors for a fixed batch
            extra = np.setdiff1d(np.arange(gt.shape[axis]), idx)[: n_per_plane - len(idx)]
            idx = np.concatenate([idx, extra])
        slices = np.asarray(
            geometry.extract_slices(vol.astype(np.float32), plane, idx)
        )
        work[plane] = (idx, slices)
    return work


_PEAK_BF16_BY_KIND = (
    # dense bf16 peak FLOP/s per chip
    ("TPU v5 lite", 197e12),
    ("TPU v5p", 459e12),
    ("TPU v6 lite", 918e12),
    ("TPU v4", 275e12),
    ("TPU v3", 123e12),
)


def _peak_bf16_flops(device) -> float | None:
    for prefix, peak in _PEAK_BF16_BY_KIND:
        if device.device_kind.startswith(prefix):
            return peak
    return None


def measure_train_throughput(peak_flops, batch: int = 128, imgsz: int = 640,
                             k_steps: int = 20):
    # batch=128 is the deployed scale on v5e: auto-batch's verify+climb
    # pass (r4) resolves it against the measured AOT peaks (8.50G at 128
    # vs the 9.60G 60%-HBM budget), and the measured ladder peaks there —
    # 317 sl/s @32, 356 @64, 466 @96, 514 @112, 556 @128, then XLA
    # switches schedule and REGRESSES (407 @160 with a 13.9G peak).
    # History: r2 155 sl/s @8 (pre-checkpointed-mask-loss memory wall),
    # r3 317 @32.
    """Steady-state throughput of the real fused augment->train-step
    program (the epoch-scan body) in slices/s, plus its MFU.

    The K steps chain on-device through the state carry (dispatch is
    async; the single fetch at the end gives honest wall time, the same
    measurement discipline as the serving bench)."""
    import jax
    import jax.numpy as jnp

    from tpu_mslesseg.model.yolo11 import create_model
    from tpu_mslesseg.train import augment, trainer
    from tpu_mslesseg.train.trainer import TrainConfig

    cfg = TrainConfig(epochs=50, batch_size=batch, imgsz=imgsz)
    model, _ = create_model(
        nc=1, scale="n", dtype=jnp.bfloat16, remat=cfg.remat
    )
    state = trainer.init_train_state(model, cfg, steps_per_epoch=100)
    step = trainer.make_train_step_fn(model, cfg, steps_per_epoch=100)
    acfg = augment.AugConfig(imgsz=imgsz, max_inst=8, mosaic=True)

    # tiny device-resident source pool (the demo slice geometry)
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
    jax.device_get(state.step)  # compile + warm

    t0 = time.time()
    for _ in range(k_steps):
        state, _ = jitted(state, key, idx)
    jax.device_get(state.step)  # single honest sync
    dt = time.time() - t0
    sps = batch * k_steps / dt

    tmfu = None
    if peak_flops:
        try:
            fl = float(
                jitted.lower(state, key, idx).compile().cost_analysis()["flops"]
            )
            tmfu = fl * (k_steps / dt) / peak_flops
        except Exception:
            tmfu = None
    return sps, tmfu


def _tpu_tunnel_alive() -> bool:
    """The axon TPU plugin reaches the chip through a local stdio relay
    (`/root/.tpu_init.py`) listening on fixed localhost ports. If the
    relay died, the first device op hangs FOREVER (no timeout in the
    plugin), so probe a relay port before letting jax touch the backend
    and fall back to XLA-CPU when it is gone — a bench that hangs
    records nothing."""
    import os
    import socket

    if not os.path.isdir("/root/.axon_site"):
        return True  # no tunneled plugin on this host; nothing to probe

    for port in (8082, 8092, 8102, 8112):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=0.5):
                return True
        except OSError:
            continue
    return False


def _serving_flag_enabled() -> bool:
    import os

    return os.environ.get("TPU_MSLESSEG_NO_TPU_FLAGS") != "1"


def _serving_child() -> tuple[dict | None, bool, bool]:
    """Run the TPU serving measurement in a subprocess whose env carries
    the measured-win serving flags (scoped VMEM 64 MiB + rwb-fusion off:
    3719 slices/s vs 3548 default on v5e, round-4+5 sweeps) — built
    through the SAME helper the product entry points call
    (infer/consensus3.set_serving_tpu_flags) so the flag string cannot
    drift.

    Scoped VMEM REGRESSES the b=128 train step 5% and libtpu reads the env
    once at plugin init, so one process cannot serve flagged AND train
    unflagged; the tunnel allows exactly one live TPU client, so the
    child runs BEFORE this process touches the backend.

    Returns ``(fields, relay_ok, flagged)``. ``fields`` is None on any
    failure (parent then measures serving in-process, unflagged).
    ``flagged`` is the helper's verdict: True iff the child env carries
    the MEASURED config (a user-managed LIBTPU_INIT_ARGS that overrides
    it runs anyway but must not be labeled serving_vmem_flag). ``relay_ok``
    is False when the relay is gone or unsafe to touch: a killed child
    (timeout) wedges the tunnel for ~1-2 min and a device op on a dead
    relay hangs FOREVER, so the parent must re-probe — with the recovery
    wait — before its own first device op (ADVICE r4). A child that ran
    on the XLA-CPU backend (relay died between the parent's probe and
    the child's) is rejected: its value is a CPU floor, not a chip
    serving number (ADVICE r4)."""
    import os
    import subprocess
    import sys
    import time as _t

    from tpu_mslesseg.infer.consensus3 import set_serving_tpu_flags

    env = dict(os.environ)
    flagged = set_serving_tpu_flags(env=env)
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--serve-child"],
            env=env, capture_output=True, text=True, timeout=1200,
        )
    except subprocess.TimeoutExpired:
        # the killed client wedges the relay; wait out the documented
        # ~1-2 min recovery window (sleep ABOVE its upper edge), then
        # trust only a fresh probe. Measured r5: after back-to-back
        # killed clients the first device op can still take minutes —
        # slow, but it completes; only a closed port means hang-forever.
        _t.sleep(150)
        return None, _tpu_tunnel_alive(), flagged
    except Exception:
        return None, _tpu_tunnel_alive(), flagged
    lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    if r.returncode != 0 or not lines:
        return None, _tpu_tunnel_alive(), flagged
    try:
        out = json.loads(lines[-1])
    except ValueError:
        return None, _tpu_tunnel_alive(), flagged
    if out.get("tpu_dead") or out.get("backend") == "cpu":
        return None, False, flagged
    return (out if "value" in out else None), True, flagged


def main(serve_only: bool = False):
    import jax
    import jax.numpy as jnp

    # drop ONLY the benign same-host +prefer-no-scatter/gather AOT lines
    # from the recorded stderr tail; a real cross-host feature mismatch
    # still prints (see core/runtime.py and docs/aot_cache_warning.md)
    from tpu_mslesseg.core.runtime import filter_benign_aot_warnings

    filter_benign_aot_warnings()

    tpu_dead = not _tpu_tunnel_alive()
    serve_child = None
    if not serve_only and not tpu_dead and _serving_flag_enabled():
        serve_child, relay_ok, child_flagged = _serving_child()
        tpu_dead = tpu_dead or not relay_ok
    if tpu_dead:
        jax.config.update("jax_platforms", "cpu")
    # XLA-CPU AOT cache entries are host-CPU-specific (runtime.py) — key
    # on the RESOLVED backend, not tunnel liveness: a host with no axon
    # plugin at all still runs XLA-CPU and must not write the shared dir
    from tpu_mslesseg.core.runtime import cpu_cache_dir, enable_compilation_cache

    if jax.default_backend() == "cpu":
        enable_compilation_cache(cpu_cache_dir())
    else:
        enable_compilation_cache()

    if not tpu_dead and jax.default_backend() == "cpu":
        # No TPU backend resolved at all — e.g. a host WITHOUT the axon
        # plugin dir, where the port probe is vacuously true. Degrade
        # exactly like a dead relay (reduced scale, flagged output)
        # instead of grinding the full chip workload through XLA-CPU;
        # in the serve-child this also makes the child finish fast and
        # report backend=cpu so the parent rejects it (ADVICE r4 class).
        tpu_dead = True

    from tpu_mslesseg.infer.consensus3 import ConsensusPredictor
    from tpu_mslesseg.model.yolo11 import create_model

    # serving workload: 4 patients per dispatch (the two demo volumes,
    # cycled — identical compute to 4 distinct same-shape patients). The
    # patient axis folds into the conv batch; the measured knee on v5e is
    # 4 patients = b=600 slices/dispatch (r3: 3108 sl/s @2pat ->
    # 3465 @4pat -> 3413 @8pat, MFU 15.5% -> 17.3% -> 17.0%), past which
    # HBM working-set growth eats the MXU gain. Override with
    # TPU_MSLESSEG_BENCH_PATIENTS; `patients_per_dispatch` in the JSON
    # records what ran. ConsensusPredictor.lote is the production
    # multi-patient API, so this dispatch size is product-reachable for
    # any same-shape patient group (the full dataset is 1mm-iso batches).
    import os as _os

    n_pat = int(_os.environ.get("TPU_MSLESSEG_BENCH_PATIENTS", "4"))
    n_slices_pp = 50  # canonical P50 config
    base_pair = [load_patient_volume("P39"), load_patient_volume("P18")]
    patients = [base_pair[i % 2] for i in range(n_pat)]
    vol_shape = patients[0][0].shape
    # bf16 activations: the parity target itself runs fp16 AMP inference
    model, cfg = create_model(nc=1, scale="n", dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames="train")(
        jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3)), train=False
    )

    if tpu_dead:
        # degraded mode: the XLA-CPU floor measurement only, scaled down
        # so the run completes (the full P50 workload takes minutes/batch
        # on CPU); the JSON line still appears, flagged.
        n_slices_pp = 5
    n_per_plane = n_slices_pp

    def build_runner(device=None, n=n_per_plane, n_patients=len(patients)):
        """The fused single-program 3-plane pipeline (enhance -> batched
        forward -> NMS -> masks -> 3 volume scatters -> consensus ->
        confusion counts) over a batch of patients, with all arrays
        committed to `device` (None = default backend). One dispatch +
        one [P,4]-scalar fetch per run."""
        place = (lambda x: jax.device_put(x, device)) if device else jnp.asarray
        variables_d = jax.tree_util.tree_map(place, variables)
        works = [prepare_plane_work(v, g, n) for v, g in patients[:n_patients]]
        slices_dev = {
            p: place(np.stack([np.asarray(w[p][1]) for w in works]))
            for p in works[0]
        }
        idx_dev = {
            p: place(np.stack([np.asarray(w[p][0], np.int32) for w in works]))
            for p in works[0]
        }
        gts_dev = place(
            np.stack([np.asarray(g, np.float32) for _, g in patients[:n_patients]])
        )
        cp = ConsensusPredictor(
            model, variables_d, vol_shape, mejora="GC",
            platform=device.platform if device else None,
        )

        def run_once():
            counts, _, _ = cp.lote(slices_dev, idx_dev, gts_dev)
            return counts  # fetching these scalars syncs the program

        def flops():
            """Executed flops of THE compiled lote program (AOT lower of
            the same jitted callable -> compile-cache hit)."""
            c = cp._jitted_lote.lower(
                cp.variables, dict(slices_dev), dict(idx_dev), gts_dev
            ).compile()
            return float(c.cost_analysis()["flops"])

        return run_once, flops

    total_slices = n_per_plane * 3 * len(patients)

    peak_flops = _peak_bf16_flops(jax.devices()[0])
    if serve_child is not None:
        # serving was measured in the flagged child (scoped VMEM 64 MiB
        # + rwb off); this process never compiles the TPU serving program
        sps = serve_child["value"]
        latency_s = serve_child["latency_batch_ms"] / 1e3
        mfu = serve_child.get("mfu")
    else:
        # NOTE the explicit device_get inside the timed region: on the
        # axon tunnel `block_until_ready` returns at dispatch, not
        # completion, so only a host fetch of the final counts gives an
        # honest end-to-end time. (r1's recorded 573.5 slices/s predates
        # this fix and measured dispatch+queue, not compute.)
        run_once, flops_fn = build_runner()
        t0 = time.time()
        jax.device_get(run_once())
        compile_s = time.time() - t0
        times = []
        for _ in range(3):  # steady state: best of 3
            t0 = time.time()
            jax.device_get(run_once())
            times.append(time.time() - t0)
        latency_s = min(times)

        # sustained serving throughput: enqueue K batches back-to-back
        # and fetch results in order — dispatch is async and the device
        # executes its stream sequentially, so each fetch overlaps the
        # later batches' compute. This is how a serving loop actually
        # runs; the per-batch tunnel round trip amortizes out of the
        # steady state (it stays visible in latency_batch_ms).
        K = 5
        t0 = time.time()
        outs = [run_once() for _ in range(K)]
        for o in outs:
            jax.device_get(o)
        sps = total_slices * K / (time.time() - t0)

        # --- MFU of the serving program: executed flops (XLA cost
        # analysis of the exact compiled program) x batches/s / peak ---
        mfu = None
        if flops_fn is not None and peak_flops:
            try:
                mfu = flops_fn() * (sps / total_slices) / peak_flops
            except Exception:
                mfu = None

    if serve_only:
        out = {"value": round(sps, 2),
               "latency_batch_ms": round(latency_s * 1e3, 1),
               # the parent rejects a CPU-backend child: that value is a
               # degraded floor, not a chip serving number (ADVICE r4)
               "backend": jax.default_backend()}
        if tpu_dead:
            out["tpu_dead"] = True
        if mfu is not None:
            out["mfu"] = round(mfu, 4)
        print(json.dumps(out))
        return

    # measured CPU floor in the same process: the SAME fused program on
    # the XLA-CPU backend, FIXED workload across rounds (1 patient ×
    # 5 slices/plane; per-slice throughput is n-independent for the
    # conv-dominated path and the full workload runs minutes on CPU).
    # Best-of-3 after warmup + recorded host conditions, so the honest
    # multiplier is reproducible run-over-run (VERDICT r4 #5 — the r3→r4
    # swing 3.35→1.55 was a single-sample timing under host load).
    cpu_sps = cpu_host = None
    try:
        n_cpu = 5
        run_cpu, _ = build_runner(
            jax.local_devices(backend="cpu")[0], n=n_cpu, n_patients=1
        )
        jax.device_get(run_cpu())  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.device_get(run_cpu())
            best = min(best, time.time() - t0)
        cpu_sps = 3 * n_cpu / best
        cpu_host = {
            "cores": _os.cpu_count(),
            "load1": round(_os.getloadavg()[0], 2),
            "slices": 3 * n_cpu,
        }
    except Exception:
        pass  # CPU backend unavailable: report the estimate only

    # --- training throughput (VERDICT r2 next #2): the REAL fused
    # augment->train-step program (the epoch-scan body) at the v5e
    # auto-batch size, K steps enqueued back-to-back, honest host fetch ---
    train_sps = train_mfu = None
    if not tpu_dead:  # a 640^2 b=32 train step on XLA-CPU takes minutes
        try:
            train_sps, train_mfu = measure_train_throughput(peak_flops)
        except Exception:
            pass

    try:
        import ultralytics  # noqa: F401  (the reference's engine)

        reference_runnable = True
    except ImportError:
        reference_runnable = False

    # headline multiplier: the measured same-host XLA-CPU floor when it
    # exists (reproducible, conditions recorded); the 2.5 slices/s
    # reference-CPU ESTIMATE stays as the labeled cross-round anchor
    out = {
        "metric": "flair_e2e_slices_per_sec_per_chip",
        "value": round(sps, 2),
        "unit": "slices/s",
    }
    if cpu_sps is not None:
        out["vs_measured_cpu"] = round(sps / cpu_sps, 2)
    out.update({
        "vs_baseline": round(sps / BASELINE_SLICES_PER_S, 2),
        "vs_baseline_kind": "estimate_2.5sps_reference_cpu",
        "latency_batch_ms": round(latency_s * 1e3, 1),
        "reference_runnable": reference_runnable,
        "patients_per_dispatch": len(patients),
    })
    if serve_child is not None and child_flagged:
        out["serving_vmem_flag"] = True  # measured in the flagged child
        # (scoped VMEM 64 MiB + rwb-fusion off — the r4+r5 sweep winner;
        # a user-managed LIBTPU_INIT_ARGS makes child_flagged False and
        # the label is omitted: the measured config did not run)
    if tpu_dead:
        out["tpu_unavailable"] = True  # relay probe failed; value is the
        # XLA-CPU floor at reduced scale, NOT a chip number
    elif sps < 500:
        # The relay has a SICK mode (observed r5): ports open, ops
        # complete, but every dispatch pays ~100x its healthy latency
        # (a trivial matmul compile took 783s; a <1ms conv, 7.9s/call).
        # Every healthy chip measurement since round 2 is >=600 slices/s
        # (601.8 r2 pre-fusion floor), so a TPU-backend number this far
        # below is an environment failure, not a regression — label it
        # so a degraded-tunnel round isn't read at face value.
        out["tunnel_degraded_suspected"] = True
    if cpu_sps is not None:
        out["measured_cpu_sps"] = round(cpu_sps, 2)
        out["cpu_floor_host"] = cpu_host
    if mfu is not None:
        out["mfu"] = round(mfu, 4)
    if train_sps is not None:
        out["train_slices_per_sec"] = round(train_sps, 2)
    if train_mfu is not None:
        out["train_mfu"] = round(train_mfu, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    import sys as _sys

    main(serve_only="--serve-child" in _sys.argv[1:])
