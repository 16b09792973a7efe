"""Orbax checkpointing: best/last selection, resume.

The reference's training artifacts are ``weights/best.pt`` / ``last.pt`` +
``results.csv`` (success criterion ``train.py:105-116``). Ours are Orbax
checkpoint directories ``weights/best.ckpt`` / ``last.ckpt`` holding
{params, batch_stats, ema_params, step} (+ opt_state in last for resume).
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path, state, include_opt: bool = False):
    """Crash-safe save: write to a sibling tmp dir, then swap — a kill
    mid-save must not destroy the previous checkpoint or leave a partial
    directory that `checkpoint_exists` accepts."""
    import shutil

    path = Path(path).absolute()
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "ema_params": state.ema_params,
        "step": np.asarray(state.step),
    }
    if include_opt:
        payload["opt_state"] = state.opt_state
        # the gradient-accumulation carry: without it a resume would
        # restart the nbs-accumulation window and diverge bitwise from
        # the uninterrupted run whenever steps_per_epoch % accumulate != 0
        if getattr(state, "grad_accum", None) is not None:
            payload["grad_accum"] = state.grad_accum
    from tpu_mslesseg.core import distributed

    tmp = path.with_name(path.name + ".tmp")
    # multi-host: orbax's save is collective (every process writes its
    # addressable shards into tmp), but the filesystem swap must happen
    # exactly once — process 0, fenced by barriers so (a) the pre-clean
    # precedes any shard write, (b) all writes land before the swap,
    # (c) the swap is visible everywhere before anyone reads `path`.
    # Single-process: barriers are no-ops, behavior unchanged.
    if distributed.is_main_process() and tmp.exists():
        shutil.rmtree(tmp)
    distributed.barrier("ckpt-preclean")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(tmp, payload)
    ckptr.wait_until_finished()
    distributed.barrier("ckpt-written")
    if distributed.is_main_process():
        if path.exists():
            shutil.rmtree(path)
        tmp.rename(path)
    distributed.barrier("ckpt-swapped")


def load_checkpoint(path, template=None):
    """Load a checkpoint dict, device-agnostically.

    Without a template, the structure is reconstructed from checkpoint
    metadata as ShapeDtypeStructs so arrays restore onto the *current*
    backend (a raw restore pins to the saving device's sharding and fails
    across backends, e.g. CPU-saved -> TPU-restored)."""
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    if template is None:
        meta = ckptr.metadata(path)
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        template = jax.tree_util.tree_map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
            meta.item_metadata,
        )
    return ckptr.restore(path, template)


def load_checkpoint_compat(path, template, optional=("grad_accum",)):
    """Restore with forward-compatibility for template keys the
    checkpoint predates. A pre-grad-accumulation ``last.ckpt`` has no
    'grad_accum' entry; a strict template restore raises, and the
    caller's except would silently RESTART training — rewriting
    results.csv and clobbering best.ckpt with epoch-1 weights. Instead:
    try the full template, and on failure retry with each optional key
    removed, filling it back from the (freshly-initialized) template
    value. Returns the restored dict with all template keys present."""
    try:
        return load_checkpoint(path, template)
    except Exception:
        slim = {k: v for k, v in template.items() if k not in optional}
        if len(slim) == len(template):
            raise  # nothing optional to drop: a genuine mismatch
        restored = load_checkpoint(path, slim)
        for k in optional:
            if k in template:
                restored[k] = template[k]
        return restored


def checkpoint_exists(path) -> bool:
    p = Path(path)
    return p.is_dir() and any(p.iterdir())


def inference_variables(ckpt, use_ema: bool = True):
    """Checkpoint dict -> flax variables for model.apply."""
    params = ckpt["ema_params"] if use_ema and "ema_params" in ckpt else ckpt["params"]
    return {"params": params, "batch_stats": ckpt["batch_stats"]}


def load_stopper_state(weights_dir, start_epoch: int):
    """Resumed best-fitness / EarlyStopping state from
    ``<weights_dir>/fitness.json`` (shared by both engines).

    Returns ``(best_fit, best_epoch)``. A best.ckpt whose fitness note is
    missing (pre-fitness.json checkpoint, or a crash between the
    collective best save and the process-0 note write) gets an EPSILON
    floor, not 0.0: fitness is always >= 0 and the improvement test is
    ``fit >= best``, so a 0.0 floor would let a zero-fitness tie demote a
    good checkpoint and reset the patience counter."""
    import json

    weights = Path(weights_dir)
    best_fit, best_epoch = -1.0, start_epoch - 1
    if start_epoch > 1:
        ff = weights / "fitness.json"
        if ff.exists():
            try:
                note = json.loads(ff.read_text())
                best_fit = float(note["best_fitness"])
                best_epoch = int(note.get("best_epoch", best_epoch))
            except (ValueError, KeyError, TypeError):
                pass
        if best_fit < 0 and checkpoint_exists(weights / "best.ckpt"):
            best_fit = 1e-12
    return best_fit, best_epoch
