"""Setup stage: unzip with root-stripping + GT tree construction."""

import io
import os
import zipfile
from pathlib import Path

import numpy as np
import pytest

from tpu_mslesseg.io import nifti
from tpu_mslesseg.pipeline.stages import setup as setup_stage


@pytest.fixture
def synthetic_zip(tmp_path):
    """MSLesSeg-style ZIP: root folder, train/test patients, info_dataset."""
    def nii_bytes():
        import gzip as _g

        p = tmp_path / "_tmp.nii.gz"
        nifti.save(np.ones((4, 4, 4), np.float32), np.eye(4), p)
        return p.read_bytes()

    zpath = tmp_path / "MSLesSeg.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        blob = nii_bytes()
        z.writestr("MSLesSeg-Dataset/train/P1/T1/P1_T1_FLAIR.nii.gz", blob)
        z.writestr("MSLesSeg-Dataset/train/P1/T1/P1_T1_MASK.nii.gz", blob)
        z.writestr("MSLesSeg-Dataset/test/P54/P54_FLAIR.nii.gz", blob)
        z.writestr("MSLesSeg-Dataset/test/P54/P54_MASK.nii.gz", blob)
        z.writestr("MSLesSeg-Dataset/info_dataset/readme.txt", b"skip me")
    return zpath


def test_setup_from_local_zip(synthetic_zip, tmp_path):
    old = os.getcwd()
    workdir = tmp_path / "work"
    workdir.mkdir()
    os.chdir(workdir)
    try:
        setup_stage.ejecutar_flujo_setup(zip_path=synthetic_zip)
        # root folder stripped, info_dataset skipped
        assert (workdir / "MSLesSeg-Dataset" / "train" / "P1" / "T1"
                / "P1_T1_FLAIR.nii.gz").exists()
        assert not (workdir / "MSLesSeg-Dataset" / "info_dataset").exists()
        # GT tree with unified names: train from T1 subdir, test flat
        assert (workdir / "GT" / "train" / "P1" / "P1_MASK.nii.gz").exists()
        assert (workdir / "GT" / "test" / "P54" / "P54_MASK.nii.gz").exists()
        # idempotent second run
        setup_stage.ejecutar_flujo_setup(zip_path=synthetic_zip)
    finally:
        os.chdir(old)


def test_obtener_mask_path_variants(tmp_path):
    p = tmp_path / "P7"
    (p / "T1").mkdir(parents=True)
    (p / "T1" / "P7_T1_MASK.nii.gz").write_bytes(b"x")
    assert setup_stage.obtener_mask_path(p, "train").name == "P7_T1_MASK.nii.gz"
    q = tmp_path / "P8"
    q.mkdir()
    (q / "P8_MASK.nii.gz").write_bytes(b"x")
    assert setup_stage.obtener_mask_path(q, "train").name == "P8_MASK.nii.gz"
    assert setup_stage.obtener_mask_path(q, "test").name == "P8_MASK.nii.gz"
    r = tmp_path / "P9"
    r.mkdir()
    assert setup_stage.obtener_mask_path(r, "test") is None


def test_setup_download_via_localhost(synthetic_zip, tmp_path, monkeypatch):
    """End-to-end download path (reference `descargar_archivo`,
    setup.py:86): a stdlib HTTP server on localhost serves the dataset
    zip — no egress needed — and the full setup flow (download -> unzip
    -> GT tree) runs against its URL."""
    import http.server
    import os
    import threading

    serve_dir = synthetic_zip.parent

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(serve_dir), **kw)

        def log_message(self, *a):
            pass

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}/{synthetic_zip.name}"
        workdir = tmp_path / "dl"
        workdir.mkdir()
        cwd = os.getcwd()
        os.chdir(workdir)
        try:
            from tpu_mslesseg.pipeline.stages import setup as setup_stage

            setup_stage.ejecutar_flujo_setup(url=url)
        finally:
            os.chdir(cwd)
        assert (workdir / "MSLesSeg-Dataset" / "train").is_dir()
        assert any((workdir / "GT" / "train").rglob("*MASK.nii.gz"))
    finally:
        httpd.shutdown()
