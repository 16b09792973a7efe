"""First-class differential coverage for the native host-IO library
(native/hostio.cc via io/native.py) — VERDICT r3 weak #4.

The stage tests only exercise it implicitly (and silently fall back to
PIL on toolchain-less boxes); these tests pin the native writers
*against* the PIL/zlib reference decoders directly, and skip LOUDLY when
the toolchain is absent.

Reference artifacts this backs: the grayscale slice/mask PNGs of
``extraer_dataset.py:174-198`` and the prediction PNGs of
``generar_predicciones.py:143-153``; gzip backs the ``.nii.gz`` volumes.
"""

from __future__ import annotations

import gzip
import zlib

import numpy as np
import pytest

from tpu_mslesseg.io import native


def _require_native():
    if not native.available():
        pytest.skip(
            "NATIVE HOSTIO NOT BUILT (no g++/zlib toolchain?) — the C++ "
            "writer is untested on this box; only the PIL fallback runs"
        )


def _read_png(path):
    from PIL import Image

    with Image.open(path) as im:
        assert im.mode == "L", "must decode as 8-bit grayscale"
        return np.asarray(im)


def _images(rng, n=6):
    """Edge-case mix: random noise, constants, gradients, 1-px, odd dims."""
    return [
        rng.integers(0, 256, (37, 53), dtype=np.uint8),
        np.zeros((8, 8), np.uint8),
        np.full((16, 3), 255, np.uint8),
        (np.outer(np.arange(19), np.arange(29)) % 256).astype(np.uint8),
        rng.integers(0, 256, (1, 1), dtype=np.uint8),
        rng.integers(0, 256, (218, 182), dtype=np.uint8),  # demo slice dims
    ][:n]


def test_single_png_bitwise_vs_pil_decode(tmp_path):
    _require_native()
    rng = np.random.default_rng(0)
    for i, img in enumerate(_images(rng)):
        p = tmp_path / f"im{i}.png"
        assert native.write_gray_png(p, img)
        back = _read_png(p)
        np.testing.assert_array_equal(back, img)


def test_batch_matches_single_and_pil(tmp_path):
    _require_native()
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (12, 41, 33), dtype=np.uint8)
    paths = [tmp_path / f"b{i}.png" for i in range(12)]
    assert native.write_gray_png_batch(paths, imgs, threads=4)
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(_read_png(p), imgs[i])
    # batch output is byte-identical to the single writer (same encoder)
    q = tmp_path / "single.png"
    assert native.write_gray_png(q, imgs[0])
    assert q.read_bytes() == paths[0].read_bytes()


def test_png_structure_and_crc(tmp_path):
    """Validate the container itself (signature, IHDR fields, chunk CRCs,
    zlib stream) independent of any decoder's tolerance."""
    _require_native()
    img = (np.arange(25, dtype=np.uint8) * 9).reshape(5, 5)
    p = tmp_path / "s.png"
    assert native.write_gray_png(p, img)
    raw = p.read_bytes()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    pos, chunks = 8, []
    while pos < len(raw):
        ln = int.from_bytes(raw[pos : pos + 4], "big")
        typ = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + ln]
        crc = int.from_bytes(raw[pos + 8 + ln : pos + 12 + ln], "big")
        assert crc == zlib.crc32(typ + data), typ
        chunks.append((typ, data))
        pos += 12 + ln
    assert [t for t, _ in chunks] == [b"IHDR", b"IDAT", b"IEND"]
    ihdr = chunks[0][1]
    assert int.from_bytes(ihdr[0:4], "big") == 5  # width
    assert int.from_bytes(ihdr[4:8], "big") == 5  # height
    assert ihdr[8] == 8 and ihdr[9] == 0  # 8-bit grayscale
    scan = zlib.decompress(chunks[1][1])
    rows = np.frombuffer(scan, np.uint8).reshape(5, 6)
    assert (rows[:, 0] == 0).all()  # filter byte 0 per scanline
    np.testing.assert_array_equal(rows[:, 1:], img)


def test_gzip_roundtrip_and_python_interop():
    _require_native()
    rng = np.random.default_rng(2)
    for payload in (
        b"", b"a", b"hola" * 1000,
        rng.integers(0, 256, 100_000, dtype=np.uint8).tobytes(),
    ):
        for level in (1, 6, 9):
            out = native.gzip_bytes(payload, level=level)
            assert out is not None
            # stdlib gzip must decompress the native container exactly
            assert gzip.decompress(out) == payload
    # and the native output is a real gzip member (magic + deflate)
    out = native.gzip_bytes(b"xyz")
    assert out[:2] == b"\x1f\x8b" and out[2] == 8


def test_batch_reports_failures(tmp_path):
    _require_native()
    imgs = np.zeros((2, 4, 4), np.uint8)
    ok = native.write_gray_png_batch(
        [tmp_path / "ok.png", tmp_path / "no_such_dir" / "x.png"], imgs
    )
    assert ok is False  # one unwritable path -> failure reported
    np.testing.assert_array_equal(_read_png(tmp_path / "ok.png"), imgs[0])
