"""Volume metrics on device: DSC / AUC / Precision / Recall.

Numerical parity with the reference (``utils/utils.py:455-495``):
* DSC = 2·|A∩B| / (|A|+|B| + 1e-8), rounded to 3 decimals;
* precision = TP/(TP+FP+1e-8), recall = TP/(TP+FN+1e-8);
* AUC: sklearn ``roc_auc_score`` on flattened volumes — for *binary*
  predictions this reduces analytically to (1 + TPR − FPR)/2, which we
  compute in one fused reduction instead of a 7.2M-element host sort
  (the reference's per-patient bottleneck); NaN when GT has one class.

All four metrics come out of a single pass over the volume pair.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _confusion_counts(y_true, y_pred):
    """Stacked [tp, fp, fn, tn] — ONE array so callers pay a single host
    fetch (on the tunneled TPU every fetch is a ~30ms round trip; four
    separate float() conversions used to cost more than the entire fused
    predictor)."""
    t = (y_true > 0).astype(jnp.float32).ravel()
    p = (y_pred > 0).astype(jnp.float32).ravel()
    tp = jnp.sum(t * p)
    fp = jnp.sum((1 - t) * p)
    fn = jnp.sum(t * (1 - p))
    tn = jnp.sum((1 - t) * (1 - p))
    return jnp.stack([tp, fp, fn, tn])


def _round3(x: float) -> float:
    return float(np.round(x, 3))


def compute_metrics(y_true, y_pred) -> dict:
    """All four volume metrics in one device pass.

    Returns {"DSC", "AUC", "Precision", "Recall"} floats (AUC may be NaN).
    """
    return metrics_from_counts(_confusion_counts(y_true, y_pred))


def metrics_from_counts(counts) -> dict:
    """Host-side finish: [tp, fp, fn, tn] (device or host array) -> the
    reference metrics dict. Split from `compute_metrics` so fused programs
    can return the counts and defer the single host fetch to the caller."""
    tp, fp, fn, tn = np.asarray(counts, np.float64)

    dsc = (2.0 * tp) / (2 * tp + fp + fn + 1e-8)
    prec = tp / (tp + fp + 1e-8)
    rec = tp / (tp + fn + 1e-8)

    pos = tp + fn
    neg = fp + tn
    if pos == 0 or neg == 0:
        auc = math.nan  # single-class GT: AUC undefined (reference warns+NaN)
    else:
        tpr = tp / pos
        fpr = fp / neg
        auc = (1.0 + tpr - fpr) / 2.0

    return {
        "DSC": _round3(dsc),
        "AUC": _round3(auc) if not math.isnan(auc) else float("nan"),
        "Precision": _round3(prec),
        "Recall": _round3(rec),
    }


def DSC(y_true, y_pred) -> float:
    tp, fp, fn, _ = np.asarray(_confusion_counts(y_true, y_pred), np.float64)
    return _round3((2.0 * tp) / (2 * tp + fp + fn + 1e-8))


def precision(y_true, y_pred) -> float:
    tp, fp, _, _ = np.asarray(_confusion_counts(y_true, y_pred), np.float64)
    return _round3(tp / (tp + fp + 1e-8))


def recall(y_true, y_pred) -> float:
    tp, _, fn, _ = np.asarray(_confusion_counts(y_true, y_pred), np.float64)
    return _round3(tp / (tp + fn + 1e-8))


def AUC(y_true, y_pred) -> float:
    return compute_metrics(y_true, y_pred)["AUC"]
