"""labels.py vs the upstream converter golden (VERDICT r2 next #10).

tests/goldens/labels/ holds synthetic masks plus the output of a literal
transcription of `convert_segment_masks_to_yolo_seg` (8.3.x — the
function the reference calls, ``extraer_dataset.py:215-227``) generated
by the cv2-only script scripts_dev/gen_labels_golden.py (cv2 and JAX
can't share a process, CLAUDE.md).

Textual output differs by design (upstream: CHAIN_APPROX_SIMPLE corner
vertices; ours: full Moore boundary), so the comparison is semantic:

* same polygon COUNT per mask (both drop <3-point contours — 1-2 px
  specks produce no label row, an upstream behavior worth pinning: the
  reference's training never sees sub-3-px lesions through labels);
* expanding the golden's straight segments to unit steps reconstructs
  the exact boundary pixel SET our tracer emits, component by component;
* filling either boundary reproduces the component (holes excluded,
  RETR_EXTERNAL semantics).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest
from scipy import ndimage

from tpu_mslesseg.pipeline import labels as lb

GOLDEN = Path(__file__).parent / "goldens" / "labels"
CASES = sorted(p.stem[: -len("_mask")] for p in GOLDEN.glob("*_mask.npy"))


def parse_label_text(text: str, W: int, H: int) -> list:
    """Label rows -> list of [(row, col), ...] integer-pixel polygons."""
    polys = []
    for line in text.strip().splitlines():
        vals = line.split()
        assert vals[0] == "0"  # single class
        xs = [int(round(float(v) * W)) for v in vals[1::2]]
        ys = [int(round(float(v) * H)) for v in vals[2::2]]
        polys.append(list(zip(ys, xs)))
    return polys


def expand_to_unit_steps(poly: list) -> set:
    """CHAIN_APPROX_SIMPLE polygon -> full boundary pixel set (straight
    segments re-interpolated at unit pixel steps)."""
    pts = set()
    n = len(poly)
    for a, b in zip(poly, [*poly[1:], poly[0]]):
        dy, dx = b[0] - a[0], b[1] - a[1]
        steps = max(abs(dy), abs(dx), 1)
        # SIMPLE only removes collinear points along straight pixel runs
        assert dy % steps == 0 and dx % steps == 0, (a, b)
        for t in range(steps):
            pts.add((a[0] + t * dy // steps, a[1] + t * dx // steps))
    return pts


def fill_boundary(pix: set, shape) -> np.ndarray:
    m = np.zeros(shape, bool)
    for r, c in pix:
        m[r, c] = True
    return ndimage.binary_fill_holes(m)


@pytest.mark.parametrize("case", CASES)
def test_labels_match_upstream_converter_semantics(case, tmp_path):
    mask = np.load(GOLDEN / f"{case}_mask.npy")
    H, W = mask.shape
    golden = parse_label_text(
        (GOLDEN / f"{case}_upstream.txt").read_text(), W, H
    )

    out = tmp_path / f"{case}.txt"
    lb.write_yolo_seg_label(mask, out)
    ours = parse_label_text(out.read_text(), W, H)

    assert len(ours) == len(golden), (case, len(ours), len(golden))

    g_sets = sorted((frozenset(expand_to_unit_steps(p)) for p in golden),
                    key=lambda s: min(s))
    o_sets = sorted((frozenset(p) for p in ours), key=lambda s: min(s))
    for i, (g, o) in enumerate(zip(g_sets, o_sets)):
        assert g == o, (case, i, sorted(o ^ g)[:8])

    # our filled boundaries never exceed the mask's filled area (the
    # per-row set equality above is the strong check; full two-sided
    # coverage is NOT asserted because straight-line components are
    # legitimately dropped by both writers)
    filled = np.zeros((H, W), bool)
    for o in o_sets:
        filled |= fill_boundary(o, (H, W))
    assert (filled & ~ndimage.binary_fill_holes(mask > 0)).sum() == 0
    assert len(CASES) >= 5  # the fixture set stays meaningful
