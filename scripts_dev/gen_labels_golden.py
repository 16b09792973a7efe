"""Generate the labels-converter golden fixtures (cv2-only process).

Transcribes `ultralytics.data.converter.convert_segment_masks_to_yolo_seg`
(8.3.x, the function the reference calls at ``extraer_dataset.py:215-227``)
and runs it over synthetic masks covering the interesting shapes: round
blobs, L-shapes, diagonal strips, border-touching components, components
with holes (RETR_EXTERNAL ignores them), adjacent components, and 1-2 px
specks (dropped by the ``len(contour) >= 3`` guard).

cv2 and JAX deadlock in one process (CLAUDE.md), so this runs standalone:

    python scripts_dev/gen_labels_golden.py

and the outputs in tests/goldens/labels/ are committed; the comparison
test (tests/test_labels_golden.py) is cv2-free.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

try:
    import cv2
except ImportError:
    sys.exit("cv2 required (run outside the JAX test process)")

OUT = Path(__file__).resolve().parent.parent / "tests" / "goldens" / "labels"


def upstream_convert(mask: np.ndarray, classes: int = 1) -> list[str]:
    """Literal transcription of convert_segment_masks_to_yolo_seg's
    per-image body (pixel value v -> class v-1; RETR_EXTERNAL +
    CHAIN_APPROX_SIMPLE; polygons with >= 3 points; coords normalized
    and rounded to 6 decimals)."""
    pixel_to_class_mapping = {i + 1: i for i in range(classes)}
    img_height, img_width = mask.shape
    unique_values = np.unique(mask)
    yolo_format_data = []
    for value in unique_values:
        if value == 0:
            continue
        class_index = pixel_to_class_mapping.get(int(value), -1)
        if class_index == -1:
            continue
        contours, _ = cv2.findContours(
            (mask == value).astype(np.uint8),
            cv2.RETR_EXTERNAL,
            cv2.CHAIN_APPROX_SIMPLE,
        )
        for contour in contours:
            if len(contour) >= 3:
                contour = contour.squeeze()
                yolo_format = [class_index]
                for point in contour:
                    yolo_format.append(round(point[0] / img_width, 6))
                    yolo_format.append(round(point[1] / img_height, 6))
                yolo_format_data.append(yolo_format)
    return [" ".join(map(str, item)) for item in yolo_format_data]


def make_masks() -> dict:
    rng = np.random.default_rng(42)
    masks = {}

    m = np.zeros((48, 56), np.uint8)
    yy, xx = np.mgrid[:48, :56]
    m[(yy - 14) ** 2 + (xx - 18) ** 2 <= 49] = 1  # round blob
    m[30:42, 6:10] = 1
    m[38:42, 6:24] = 1  # L-shape
    masks["blob_L"] = m

    m = np.zeros((40, 40), np.uint8)
    for i in range(18):  # diagonal strip (8-connected)
        m[8 + i, 5 + i] = 1
        m[8 + i, 6 + i] = 1
    m[0:5, 35:40] = 1  # border-touching corner block
    masks["diag_border"] = m

    m = np.zeros((36, 36), np.uint8)
    m[6:20, 6:20] = 1
    m[10:14, 10:14] = 0  # hole (RETR_EXTERNAL ignores it)
    m[24, 30] = 1  # single pixel: dropped
    m[28, 30] = 1
    m[29, 30] = 1  # 2-px: dropped
    masks["hole_specks"] = m

    m = np.zeros((44, 44), np.uint8)
    m[5:15, 5:15] = 1
    m[5:15, 16:26] = 1  # adjacent (4-separated) blocks -> one 8-conn? no:
    # columns 15 vs 16 are adjacent -> cv2 8-connectivity merges them into
    # one external contour; keep a true gap for the second component
    m[30:40, 30:40] = 1
    masks["adjacent"] = m

    m = (rng.random((52, 60)) > 0.82).astype(np.uint8)  # speckle field
    masks["speckle"] = m
    return masks


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    for name, mask in make_masks().items():
        np.save(OUT / f"{name}_mask.npy", mask)
        lines = upstream_convert(mask)
        (OUT / f"{name}_upstream.txt").write_text(
            "\n".join(lines) + ("\n" if lines else "")
        )
        print(f"{name}: {len(lines)} polygons")


if __name__ == "__main__":
    main()
