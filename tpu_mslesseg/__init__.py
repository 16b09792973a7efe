"""tpu_mslesseg — TPU-native MS-lesion segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the
YOLO-MSLesSeg pipeline (reference: srozenblum/YOLO-MSLesSeg): an
eight-stage experiment pipeline for multiple-sclerosis lesion
segmentation on MRI (MSLesSeg / ICPR-2024), with a YOLO11-seg model,
on-device preprocessing/inference/reconstruction/consensus/metrics, and
filesystem-compatible stage artifacts.

Subpackages
-----------
core      dtypes, mesh/sharding, canonical geometry
io        NIfTI codec, PNG interop, dataset download/layout
preproc   enhancement kernels (HE/CLAHE/GC/LT), slice extraction
model     YOLO11-seg in Flax (conv/C3k2/SPPF/C2PSA, PAN-FPN, seg head)
infer     letterbox, padded NMS, mask decode, volume recon, consensus
train     TAL assigner, seg losses, augmentation, pjit train step
evalx     DSC/AUC/Precision/Recall on-device; fold/experiment aggregation
pipeline  stage functions, orchestrator CLI, configs, logging
viz       GIF / best-slice overlay figures
"""

__version__ = "0.1.0"
