"""In-memory training dataset: device-resident slices, instance maps, boxes.

The reference materializes per-fold YOLO datasets by copying thousands of
PNG/label files (``train.py:256-315``) and re-reading them through a
host dataloader with 8 worker processes (``args.yaml:14``). The whole
MSLesSeg fold fits in ~1 GB: here the dataset stage produces device arrays
once — enhanced PNG-space slices (longest side scaled to the train size),
a connected-component instance-ID map per slice (the dense-mask equivalent
of ``convert_segment_masks_to_yolo_seg``'s polygons,
``extraer_dataset.py:215-227``), and per-instance boxes — and the
augmentation + train step consume them with zero host involvement.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from tpu_mslesseg.core import geometry
from tpu_mslesseg.pipeline.paciente import Paciente, calcular_fold
from tpu_mslesseg.preproc import enhance

EIGHT_CONN = np.ones((3, 3), dtype=int)


@dataclass
class SliceDataset:
    """Device-resident dataset for one plane/enhancement configuration."""

    images: jnp.ndarray  # [M, H, W] uint8, PNG-space, longest side = train_size
    instmaps: jnp.ndarray  # [M, H, W] uint8 instance IDs (0 = background)
    boxes: jnp.ndarray  # [M, I, 4] f32 xyxy in resized coords
    valid: jnp.ndarray  # [M, I] bool
    meta: list  # per-slice (patient_id, modality, slice_index)
    src_hw: tuple  # PNG-space source (H, W) before resize
    ratio: float

    def __len__(self):
        return int(self.images.shape[0])

    @property
    def max_inst(self) -> int:
        return int(self.boxes.shape[1])

    def as_dict(self):
        return {
            "images": self.images,
            "instmaps": self.instmaps,
            "boxes": self.boxes,
            "valid": self.valid,
        }


def label_instances(mask2d: np.ndarray, max_inst: int):
    """8-connected components -> (instance map uint8, boxes [I,4], valid [I]).

    Components beyond `max_inst` are dropped smallest-first (the reference's
    polygon converter keeps all, but >max_inst components per slice is
    pathological for MS lesions; max_inst is sized from the data)."""
    labeled, n = ndimage.label(mask2d > 0, structure=EIGHT_CONN)
    boxes = np.zeros((max_inst, 4), np.float32)
    valid = np.zeros((max_inst,), bool)
    out = np.zeros_like(labeled, dtype=np.uint8)
    if n == 0:
        return out, boxes, valid
    slices = ndimage.find_objects(labeled)
    areas = ndimage.sum_labels(np.ones_like(labeled), labeled, range(1, n + 1))
    order = np.argsort(-areas)[:max_inst]
    for new_id, comp in enumerate(order, start=1):
        sl = slices[comp]
        out[labeled == comp + 1] = new_id
        y0, y1 = sl[0].start, sl[0].stop
        x0, x1 = sl[1].start, sl[1].stop
        boxes[new_id - 1] = (x0, y0, x1, y1)
        valid[new_id - 1] = True
    return out, boxes, valid


def count_max_instances(masks_png: np.ndarray) -> int:
    """Max 8-connected component count over slices (for sizing max_inst)."""
    best = 0
    for m in masks_png:
        _, n = ndimage.label(m > 0, structure=EIGHT_CONN)
        best = max(best, n)
    return best


def build_dataset(
    patients: list,
    plano: str,
    modalidades: list,
    mejora: str | None,
    num_cortes: int | None,
    dataset_dir,
    train_size: int = 640,
    max_inst: int | None = None,
) -> SliceDataset:
    """Extract + enhance + resize every lesion slice of `patients` into one
    device-resident dataset (all modalities, labels shared per slice —
    the reference's per-modality label duplication, ``train.py:190-218``)."""
    from tpu_mslesseg.core.runtime import host_compute, to_accelerator

    with host_compute():
        return _build_dataset_host(
            patients, plano, modalidades, mejora, num_cortes, dataset_dir,
            train_size, max_inst, to_accelerator,
        )


def _build_dataset_host(
    patients, plano, modalidades, mejora, num_cortes, dataset_dir,
    train_size, max_inst, to_accelerator,
) -> SliceDataset:
    all_imgs, all_masks, meta = [], [], []
    for pid in patients:
        p = Paciente(
            id=pid, plano=plano, modalidad=list(modalidades), dataset_dir=dataset_dir
        )
        idx = p.indices_a_usar(num_cortes)
        if not idx:
            continue
        mask_b = p.cortes_mascara_batch(idx)  # [n, h, w] volume space
        mask_png = np.asarray(geometry.to_png_space_batch(jnp.asarray(mask_b)))
        for mod in modalidades:
            img_b = p.cortes_imagen_batch(idx, mod)
            img_u8 = np.asarray(enhance.enhance_for_model(img_b, mejora))
            img_png = np.asarray(geometry.to_png_space_batch(jnp.asarray(img_u8)))
            all_imgs.append(img_png)
            all_masks.append(mask_png)
            meta.extend((pid, mod, i) for i in idx)
    if not all_imgs:
        raise ValueError("No se encontraron cortes válidos para el dataset.")

    imgs = np.concatenate(all_imgs, axis=0)  # [M, h, w] uint8 PNG space
    masks = np.concatenate(all_masks, axis=0)
    src_h, src_w = imgs.shape[1:]

    if max_inst is None:
        max_inst = min(max(8, count_max_instances(masks)), 32)

    # resize longest side to train_size (bilinear imgs / nearest handled via
    # labeling at source res then scaling boxes; instmap resized nearest)
    r = train_size / max(src_h, src_w)
    new_h, new_w = round(src_h * r), round(src_w * r)

    resized = np.asarray(
        jax.image.resize(
            jnp.asarray(imgs, jnp.float32), (imgs.shape[0], new_h, new_w), "bilinear"
        )
    ).astype(np.uint8)

    instmaps = np.zeros((imgs.shape[0], new_h, new_w), np.uint8)
    boxes = np.zeros((imgs.shape[0], max_inst, 4), np.float32)
    valid = np.zeros((imgs.shape[0], max_inst), bool)
    ys = np.clip(np.round((np.arange(new_h) + 0.5) / r - 0.5).astype(int), 0, src_h - 1)
    xs = np.clip(np.round((np.arange(new_w) + 0.5) / r - 0.5).astype(int), 0, src_w - 1)
    for i in range(imgs.shape[0]):
        inst, bx, vl = label_instances(masks[i], max_inst)
        instmaps[i] = inst[ys][:, xs]
        boxes[i] = bx * r
        valid[i] = vl

    arrays = to_accelerator(
        {
            "images": jnp.asarray(resized),
            "instmaps": jnp.asarray(instmaps),
            "boxes": jnp.asarray(boxes),
            "valid": jnp.asarray(valid),
        }
    )
    return SliceDataset(
        images=arrays["images"],
        instmaps=arrays["instmaps"],
        boxes=arrays["boxes"],
        valid=arrays["valid"],
        meta=meta,
        src_hw=(src_h, src_w),
        ratio=r,
    )


def fold_patient_split(all_patients: list, fold_test: int, k_folds: int):
    """(train_ids, test_ids) by the deterministic fold assignment
    (reference ``utils.py:299-316``)."""
    train, test = [], []
    for pid in all_patients:
        if calcular_fold(pid, k_folds) == fold_test:
            test.append(pid)
        else:
            train.append(pid)
    return train, test


def epoch_indices(key, n_slices: int, batch_size: int, mosaic: bool):
    """[steps, B, 4] random source indices for one epoch (4 per mosaic;
    col 0 is the primary slice when mosaic is off). Datasets smaller than
    one batch wrap around."""
    steps = max(n_slices // batch_size, 1)
    need = steps * batch_size
    perm = jax.random.permutation(key, n_slices)
    if need > n_slices:
        perm = jnp.tile(perm, -(-need // n_slices))
    perm = perm[:need]
    primary = perm.reshape(steps, batch_size, 1)
    extra = jax.random.randint(
        jax.random.fold_in(key, 1), (steps, batch_size, 3), 0, n_slices
    )
    idx = jnp.concatenate([primary, extra], axis=-1)
    return idx if mosaic else idx.at[..., 1:].set(0)
