"""``batch=-1`` auto-batch: largest train batch that fits device memory.

Reference parity: the reference trains with ``batch=-1``
(``train.py:358-366``), which Ultralytics resolves by probing CUDA free
memory and picking ~60% utilization (their ``autobatch.py``). The TPU
equivalent implemented here is *exact* rather than sampled: AOT-compile
the REAL fused train-step program at two probe batch sizes — XLA's buffer
assignment reports the precise peak HBM bytes without executing anything
(``compiled.memory_analysis()``) — fit the linear model
``peak(B) = fixed + per_image * B``, and solve for the target HBM
fraction. The two probe compiles land in the persistent XLA compile
cache, and the resolved batch is memoized on disk per
(device, model, image size, instance budget) so later folds/runs skip
straight to the answer.
"""

from __future__ import annotations

import functools
import json
import os
from pathlib import Path

import jax
import numpy as np

from tpu_mslesseg.pipeline.logging_setup import get_logger

logger = get_logger(__file__)

# HBM per chip by device_kind prefix (jax doesn't expose capacity when
# memory_stats() is unavailable, e.g. through the axon tunnel)
_HBM_BY_KIND = (
    ("TPU v5 lite", 16 << 30),  # v5e
    ("TPU v5p", 95 << 30),
    ("TPU v5", 16 << 30),
    ("TPU v6 lite", 32 << 30),  # Trillium
    ("TPU v4", 32 << 30),
    ("TPU v3", 16 << 30),
    ("TPU v2", 8 << 30),
)

_CACHE_PATH = Path(
    os.environ.get(
        "TPU_MSLESSEG_AUTOBATCH_CACHE",
        Path.home() / ".cache" / "tpu_mslesseg" / "autobatch.json",
    )
)

DEFAULT_BATCH = 32  # fallback when memory can't be determined (CPU/testing)
# accelerator with *unknown* capacity: a conservative batch that fits the
# smallest chip in the table (8 GB v2) — falling back to 32 on an unlisted
# TPU could OOM exactly where batch=-1 was supposed to be safe
DEFAULT_BATCH_ACCEL = 8
DEFAULT_FRACTION = float(
    os.environ.get("TPU_MSLESSEG_AUTOBATCH_FRACTION", "0.6")
)  # Ultralytics autobatch target utilization


def device_hbm_bytes(device=None) -> int | None:
    """Usable accelerator memory in bytes, or None if undeterminable
    (e.g. CPU backend, where auto-batch falls back to the default)."""
    env = os.environ.get("TPU_MSLESSEG_HBM_BYTES")
    if env:
        return int(env)
    device = device or jax.devices()[0]
    stats = device.memory_stats() or {}
    if stats.get("bytes_limit"):
        return int(stats["bytes_limit"])
    for prefix, size in _HBM_BY_KIND:
        if device.device_kind.startswith(prefix):
            return size
    return None


def solve_max_batch(
    b_lo: int,
    peak_lo: int,
    b_hi: int,
    peak_hi: int,
    budget: int,
    max_batch: int = 128,
    multiple: int = 8,
) -> int | None:
    """Largest batch with fixed + per_image*B <= budget (linear model from
    two probe points), rounded down to `multiple`. None when the probe
    data is unusable (non-increasing peaks) or nothing fits."""
    if b_hi <= b_lo or peak_hi <= peak_lo or peak_lo <= 0:
        return None
    per_image = (peak_hi - peak_lo) / (b_hi - b_lo)
    fixed = peak_lo - per_image * b_lo
    b = int((budget - fixed) // per_image)
    b = min(b, max_batch)
    if b >= multiple:
        b -= b % multiple
    if b < 1:
        return None
    return b


def _peak_bytes(model, cfg, train_set, acfg, batch_size: int) -> int:
    """AOT peak-HBM of the fused (augment -> train step) program at
    `batch_size` — the scan body the epoch program actually runs — plus
    the argument footprint (device-resident dataset + train state), so
    the estimate covers what the deployed whole-epoch program holds in
    HBM. No execution: lowered from abstract shapes, only XLA's buffer
    assignment runs.
    """
    from tpu_mslesseg.train import augment, trainer

    steps_nominal = 100  # only feeds the LR schedule; shapes unaffected
    state_sh = jax.eval_shape(
        lambda: trainer.init_train_state(model, cfg, steps_nominal)
    )
    dd = train_set.as_dict()
    dset_sh = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), dd
    )
    key_sh = jax.ShapeDtypeStruct((2,), np.uint32)
    idx_sh = jax.ShapeDtypeStruct((batch_size, 4), np.int32)
    step = trainer.make_train_step_fn(model, cfg, steps_nominal)

    def aug_step(state, key, dset, idx):
        return step(state, augment.make_batch(key, dset, idx, acfg))

    compiled = (
        jax.jit(aug_step).lower(state_sh, key_sh, dset_sh, idx_sh).compile()
    )
    ma = compiled.memory_analysis()
    # peak may or may not count argument buffers depending on the
    # backend; adding them is a safe overestimate (smaller solved batch)
    return int(ma.peak_memory_in_bytes) + int(
        getattr(ma, "argument_size_in_bytes", 0)
    )


def _cache_load() -> dict:
    try:
        return json.loads(_CACHE_PATH.read_text())
    except (OSError, ValueError):
        return {}


def _cache_store(key: str, value: int) -> None:
    try:
        cache = _cache_load()
        cache[key] = value
        _CACHE_PATH.parent.mkdir(parents=True, exist_ok=True)
        _CACHE_PATH.write_text(json.dumps(cache, indent=1, sort_keys=True))
    except OSError:
        pass  # cache is an optimization, never a failure


def auto_batch_size(
    model,
    cfg,
    train_set,
    acfg,
    n_data: int = 1,
    fraction: float = DEFAULT_FRACTION,
    max_batch: int = 128,
    probes: tuple = (8, 16),
) -> int:
    """Resolve ``batch=-1``: per-device max batch at `fraction` of HBM,
    times the data-parallel axis size `n_data` (the batch dim shards over
    'data', so per-device memory scales with B/n_data)."""
    dev = jax.devices()[0]
    hbm = device_hbm_bytes(dev)
    if hbm is None:
        fallback = DEFAULT_BATCH if dev.platform == "cpu" else DEFAULT_BATCH_ACCEL
        logger.info(
            f"🤖 batch=-1: memoria del dispositivo desconocida "
            f"({dev.device_kind}); usando batch={fallback}."
        )
        return fallback * n_data

    # the device-resident dataset is part of the peak estimate
    # (_peak_bytes adds argument_size), so its footprint must key the
    # cache too — a batch solved against the 2-patient demo pool must NOT
    # be reused for the 53-patient --completo pool, where the resident
    # dataset eats a big slice of the HBM budget
    dset_bytes = sum(
        int(np.prod(a.shape)) * a.dtype.itemsize
        for a in jax.tree_util.tree_leaves(train_set.as_dict())
    )
    key = "|".join(
        str(v)
        for v in (
            dev.device_kind,
            hbm,  # budget participates: an HBM override must miss the cache
            type(model).__name__,
            getattr(model.cfg, "scale", "?"),
            cfg.imgsz,
            acfg.max_inst,
            cfg.max_fg,  # sizes the mask-loss chunks
            cfg.amp,
            getattr(cfg, "remat", False),  # remat halves the peak
            fraction,
            max_batch,
            dset_bytes,
        )
    )
    cached = _cache_load().get(key)
    if cached is not None:
        logger.info(f"🤖 batch=-1 (cacheado): {cached} por dispositivo x {n_data}.")
        return int(cached) * n_data

    # probe-failure fallback mirrors the memory-unknown one: 32 is only
    # safe on CPU/testing; an accelerator of unknown budget gets 8
    fallback = DEFAULT_BATCH if dev.platform == "cpu" else DEFAULT_BATCH_ACCEL
    try:
        peaks = [_peak_bytes(model, cfg, train_set, acfg, b) for b in probes]
    except Exception as e:  # AOT unsupported on this backend
        logger.warning(f"⚠️ batch=-1: sondeo AOT falló ({e}); batch={fallback}.")
        return fallback * n_data

    budget = int(hbm * fraction)
    if peaks[1] <= peaks[0] or peaks[0] <= 0:
        # probe produced no usable signal (e.g. a backend reporting zero
        # peaks): fall back to the default
        logger.warning(
            f"⚠️ batch=-1: picos AOT no informativos ({peaks}); "
            f"batch={fallback}."
        )
        return fallback * n_data
    b = solve_max_batch(probes[0], peaks[0], probes[1], peaks[1], budget,
                        max_batch=max_batch)
    if b is None:
        # informative probes and still nothing fits: falling back UP to a
        # batch that is known too big would guarantee an OOM — fail loudly
        raise ValueError(
            f"batch=-1: ni batch=1 cabe en {fraction:.0%} de "
            f"{hbm / 2**30:.0f}G (picos sonda {peaks} @ {probes}); reduzca "
            f"imgsz/escala o fije --batch explícitamente."
        )

    # verify at the SOLVED batch: the measured v5e peaks are piecewise —
    # up to ±20% off the (8,16) line either way (XLA picks a different
    # schedule per batch: b=64 compiled +18% ABOVE the line, b=160 jumped
    # 75% above it) — so the extrapolated answer can overshoot the budget
    # OR leave real capacity unused. Walk down until the ACTUAL peak
    # fits, then climb while the next multiple still fits (on v5e the
    # line solves 112 but 128 fits AND measures +8% throughput). Each
    # step is one AOT compile; the resolved batch is memoized on disk.
    def _actual_peak(bb):
        try:
            return _peak_bytes(model, cfg, train_set, acfg, bb)
        except Exception as e:
            logger.warning(
                f"⚠️ batch=-1: verificación AOT en b={bb} falló ({e}); "
                f"usando el ajuste lineal sin verificar."
            )
            return None

    if b > probes[1]:
        verified = True
        while b > probes[1]:
            peak_b = _actual_peak(b)
            if peak_b is None:
                verified = False
                break
            if peak_b <= budget:
                break
            logger.info(
                f"🤖 batch=-1: b={b} excede el presupuesto medido "
                f"({peak_b / 2**30:.2f}G > {budget / 2**30:.2f}G); bajando."
            )
            b -= 8
        while verified and b + 8 <= max_batch:
            peak_up = _actual_peak(b + 8)
            if peak_up is None or peak_up > budget:
                break
            b += 8

    per_image = (peaks[1] - peaks[0]) / (probes[1] - probes[0])
    logger.info(
        f"🤖 batch=-1: HBM {hbm / 2**30:.0f}G x {fraction:.0%} -> "
        f"batch {b}/dispositivo ({per_image / 2**20:.0f} MiB/imagen) x {n_data}."
    )
    _cache_store(key, b)
    return b * n_data
