"""Training visual artifacts: the reference's Ultralytics run directory
ships results.png, Box/Mask PR-P-R-F1 curves, train-batch previews and a
confusion matrix next to results.csv (see
``trains/Base/FLAIR_P50c_5folds_50epochs/axial/fold1/``). This module
recreates them from our own training state: the curves come from the
seg-mAP accumulator's score-sorted TP arrays (the same data Ultralytics
plots), results.png from results.csv, and the batch previews from one
augmented device batch.

All entry points are best-effort: a plotting failure warns and never
kills a training run (matching ``plots: true`` in the reference's
args.yaml being auxiliary output).
"""

from __future__ import annotations

import csv
from pathlib import Path

import numpy as np

from tpu_mslesseg.pipeline.logging_setup import get_logger

logger = get_logger(__file__)


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_results(results_csv, out_path=None) -> None:
    """results.png: the 2x5 grid of loss/metric trajectories vs epoch
    (same panel order as the reference's results.png)."""
    results_csv = Path(results_csv)
    out_path = Path(out_path or results_csv.parent / "results.png")
    try:
        with results_csv.open() as f:
            rows = list(csv.DictReader(f))
        if not rows:
            return
        epochs = [float(r["epoch"]) for r in rows]
        panels = [
            "train/box_loss", "train/seg_loss", "train/cls_loss",
            "train/dfl_loss", "metrics/precision(M)", "metrics/recall(M)",
            "val/box_loss", "val/seg_loss", "metrics/mAP50(M)",
            "metrics/mAP50-95(M)",
        ]
        plt = _mpl()
        fig, axes = plt.subplots(2, 5, figsize=(18, 6))
        for ax, col in zip(axes.ravel(), panels):
            vals = [float(r.get(col, 0) or 0) for r in rows]
            ax.plot(epochs, vals, marker=".", markersize=3, linewidth=1)
            ax.set_title(col, fontsize=9)
            ax.grid(alpha=0.3)
        fig.suptitle(results_csv.parent.name)
        fig.tight_layout()
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
    except Exception as e:  # auxiliary output only
        logger.warning(f"⚠️ No se pudo generar results.png: {e}")


def _curve_data(scores, tps, n_gt):
    """Score-sorted cumulative P/R/F1 (IoU .5) + smoothed PR curve on the
    101-pt recall grid — the arrays behind Ultralytics' curve plots."""
    order = np.argsort(-scores)
    conf = scores[order]
    t = tps[order, 0]
    tp_cum = np.cumsum(t)
    fp_cum = np.cumsum(~t)
    prec = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
    rec = tp_cum / max(n_gt, 1)
    f1 = 2 * prec * rec / np.maximum(prec + rec, 1e-9)
    # precision envelope over the recall grid (PR curve)
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([1.0], prec, [0.0]))
    mpre = np.flip(np.maximum.accumulate(np.flip(mpre)))
    grid = np.linspace(0, 1, 101)
    pr = np.interp(grid, mrec, mpre)
    return conf, prec, rec, f1, grid, pr


def plot_curves(acc, out_dir) -> None:
    """Box{P,R,F1,PR}_curve.png + Mask..., from the final validation's
    accumulated matches (IoU .5 operating curves, like the reference)."""
    out_dir = Path(out_dir)
    try:
        if not acc.scores:
            return
        scores = np.concatenate(acc.scores)
        if scores.size == 0:
            return
        plt = _mpl()
        for name, tps in (
            ("Box", np.concatenate(acc.tp_box)),
            ("Mask", np.concatenate(acc.tp_mask)),
        ):
            conf, prec, rec, f1, grid, pr = _curve_data(scores, tps, acc.n_gt)
            for suffix, x, y, xl, yl in (
                ("P_curve", conf, prec, "Confidence", "Precision"),
                ("R_curve", conf, rec, "Confidence", "Recall"),
                ("F1_curve", conf, f1, "Confidence", "F1"),
                ("PR_curve", grid, pr, "Recall", "Precision"),
            ):
                fig, ax = plt.subplots(figsize=(6, 4))
                ax.plot(x, y, linewidth=1.5)
                ax.set_xlabel(xl)
                ax.set_ylabel(yl)
                ax.set_xlim(0, 1)
                ax.set_ylim(0, 1.05)
                ax.grid(alpha=0.3)
                ax.set_title(f"{name} {suffix.replace('_', ' ')} (lesion)")
                fig.tight_layout()
                fig.savefig(out_dir / f"{name}{suffix}.png", dpi=120)
                plt.close(fig)
    except Exception as e:
        logger.warning(f"⚠️ No se pudieron generar las curvas: {e}")


def plot_confusion(acc, out_dir, conf_thres: float = 0.25) -> None:
    """confusion_matrix.png (+ normalized): 2x2 lesion/background detect
    matrix at conf>=0.25 (IoU .5 column of the TP arrays; the reference
    uses Ultralytics' 0.45 — documented deviation, same reading)."""
    out_dir = Path(out_dir)
    try:
        if not acc.scores:
            return
        scores = np.concatenate(acc.scores)
        tpb = np.concatenate(acc.tp_box)
        sel = scores >= conf_thres
        tp = int(tpb[sel, 0].sum())
        fp = int((~tpb[sel, 0]).sum())
        fn = max(acc.n_gt - tp, 0)
        m = np.array([[tp, fp], [fn, 0]], float)
        plt = _mpl()
        for norm in (False, True):
            mm = m.copy()
            if norm:
                col = mm.sum(axis=0, keepdims=True)
                mm = mm / np.maximum(col, 1e-9)
            fig, ax = plt.subplots(figsize=(5, 4))
            im = ax.imshow(mm, cmap="Blues")
            for (i, j), v in np.ndenumerate(mm):
                ax.text(j, i, f"{v:.2f}" if norm else f"{int(v)}",
                        ha="center", va="center", fontsize=12)
            ax.set_xticks([0, 1], ["lesion", "background"])
            ax.set_yticks([0, 1], ["lesion", "background"])
            ax.set_xlabel("True")
            ax.set_ylabel("Predicted")
            fig.colorbar(im)
            fig.tight_layout()
            name = "confusion_matrix_normalized" if norm else "confusion_matrix"
            fig.savefig(out_dir / f"{name}.png", dpi=120)
            plt.close(fig)
    except Exception as e:
        logger.warning(f"⚠️ No se pudo generar la matriz de confusión: {e}")


def plot_train_batches(batches, out_dir, max_imgs: int = 9) -> None:
    """train_batch<k>.jpg previews: grid of augmented images with their
    box labels (reference's train_batch0/1/2.jpg)."""
    out_dir = Path(out_dir)
    try:
        plt = _mpl()
        for k, batch in enumerate(batches):
            imgs = np.asarray(batch["images"])[..., 0]
            boxes = np.asarray(batch["boxes"])
            valid = np.asarray(batch["valid"])
            n = min(max_imgs, imgs.shape[0])
            side = int(np.ceil(np.sqrt(n)))
            fig, axes = plt.subplots(side, side, figsize=(3 * side, 3 * side))
            axes = np.atleast_1d(axes).ravel()
            for b in range(len(axes)):
                ax = axes[b]
                ax.axis("off")
                if b >= n:
                    continue
                ax.imshow(imgs[b], cmap="gray", vmin=0, vmax=1)
                for x1, y1, x2, y2 in boxes[b][valid[b]]:
                    ax.add_patch(plt.Rectangle(
                        (x1, y1), x2 - x1, y2 - y1,
                        fill=False, edgecolor="#00CC66", linewidth=1,
                    ))
            fig.tight_layout()
            fig.savefig(out_dir / f"train_batch{k}.jpg", dpi=80)
            plt.close(fig)
    except Exception as e:
        logger.warning(f"⚠️ No se pudieron generar los train_batch: {e}")


def plot_labels(train_set, out_dir, rows=None) -> None:
    """labels.jpg: GT label statistics (instances per image, box centers,
    box sizes) — the reference's Ultralytics labels.jpg analogue.
    `train_set` is a dataset object (or its as_dict()); `rows` optionally
    restricts to a subset (e.g. one fold's pool indices)."""
    out_dir = Path(out_dir)
    try:
        dd = train_set if isinstance(train_set, dict) else train_set.as_dict()
        boxes = np.asarray(dd["boxes"], float)
        valid = np.asarray(dd["valid"], bool)
        h, w = np.asarray(dd["images"]).shape[1:3]
        if rows is not None:
            rows = np.unique(np.asarray(rows))
            boxes, valid = boxes[rows], valid[rows]
        flat = boxes[valid]
        cx = (flat[:, 0] + flat[:, 2]) / 2 / w
        cy = (flat[:, 1] + flat[:, 3]) / 2 / h
        bw = (flat[:, 2] - flat[:, 0]) / w
        bh = (flat[:, 3] - flat[:, 1]) / h
        plt = _mpl()
        fig, axes = plt.subplots(2, 2, figsize=(10, 8))
        axes[0, 0].hist(valid.sum(axis=1), bins=range(0, valid.shape[1] + 2))
        axes[0, 0].set_title("instancias por corte")
        axes[0, 1].hist(np.sqrt(bw * bh), bins=40)
        axes[0, 1].set_title("tamaño relativo de lesión")
        axes[1, 0].scatter(cx, cy, s=4, alpha=0.4)
        axes[1, 0].set_title("centros (x, y)")
        axes[1, 0].set_xlim(0, 1); axes[1, 0].set_ylim(1, 0)
        axes[1, 1].scatter(bw, bh, s=4, alpha=0.4)
        axes[1, 1].set_title("ancho x alto")
        fig.tight_layout()
        fig.savefig(out_dir / "labels.jpg", dpi=100)
        plt.close(fig)
    except Exception as e:
        logger.warning(f"⚠️ No se pudo generar labels.jpg: {e}")


def plot_val_batch(model, variables, val_batch, out_dir, imgsz: int = 640,
                   conf: float = 0.25, iou: float = 0.7, k: int = 0) -> None:
    """val_batch<k>_labels.jpg / val_batch<k>_pred.jpg: the first val
    slices with GT boxes vs predicted boxes (reference artifact pair)."""
    out_dir = Path(out_dir)
    try:
        import jax
        import jax.numpy as jnp

        from tpu_mslesseg.infer import decode as dec
        from tpu_mslesseg.infer.nms import nms_batch

        imgs = np.asarray(val_batch["images"])[:9]
        gt_boxes = np.asarray(val_batch["boxes"])[:9]
        gt_valid = np.asarray(val_batch["valid"])[:9]

        @jax.jit
        def detect(variables, x):
            out = model.apply(variables, x, train=False)
            reg_max = model.cfg.reg_max
            box_d, cls_l, _ = dec.flatten_level_outputs(out, reg_max)
            anchors, strides = dec.make_anchors(imgsz, imgsz)
            boxes = dec.decode_boxes(box_d, anchors, strides, reg_max)
            scores = jax.nn.sigmoid(cls_l.astype(jnp.float32))[..., 0]
            nb, ns, keep, _ = nms_batch(boxes, scores, conf, iou, 300)
            return nb, ns, keep

        nb, ns, keep = jax.device_get(
            detect(variables, jnp.asarray(imgs, jnp.float32))
        )

        plt = _mpl()
        for suffix, draw in (
            ("labels", lambda ax, b: [
                ax.add_patch(plt.Rectangle(
                    (x1, y1), x2 - x1, y2 - y1, fill=False,
                    edgecolor="#00CC66", linewidth=1))
                for x1, y1, x2, y2 in gt_boxes[b][gt_valid[b]]
            ]),
            ("pred", lambda ax, b: [
                ax.add_patch(plt.Rectangle(
                    (x1, y1), x2 - x1, y2 - y1, fill=False,
                    edgecolor="#FF4500", linewidth=1))
                for (x1, y1, x2, y2), kp in zip(nb[b], keep[b]) if kp
            ]),
        ):
            fig, axes = plt.subplots(3, 3, figsize=(9, 9))
            axes = axes.ravel()
            for b in range(9):
                axes[b].axis("off")
                if b >= imgs.shape[0]:
                    continue
                axes[b].imshow(imgs[b, ..., 0], cmap="gray", vmin=0, vmax=1)
                draw(axes[b], b)
            fig.tight_layout()
            fig.savefig(out_dir / f"val_batch{k}_{suffix}.jpg", dpi=80)
            plt.close(fig)
    except Exception as e:
        logger.warning(f"⚠️ No se pudo generar val_batch{k}: {e}")
