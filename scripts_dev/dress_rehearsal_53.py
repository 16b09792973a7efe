"""53-patient full-experiment dress rehearsal (VERDICT r3 #5).

Runs the canonical full-experiment command path —
``ejecutar_pipeline --completo --entrenar`` (fold-parallel SPMD training,
the orchestrator default) for all three anatomical planes — on SYNTHETIC
53-patient data (tiny volumes, imgsz 64, 2 epochs) over the virtual
8-device CPU mesh, then audits everything the real run would need:

* fold assignment over IDs 1..53 (np.array_split parity: 11/11/11/10/10)
* the full artifact tree: per-fold weights + results.csv + args.yaml,
  53 patients x 3 plane volumes + consenso volumes, per-patient and
  per-fold results JSONs, the cross-fold global aggregates
* memory behavior (peak RSS)

The real MSLesSeg dataset cannot be fetched here (zero egress); this
drives the ORCHESTRATION at its real patient/fold/plane scale so the one
command the project exists to run is demonstrated end-to-end
(reference ``ejecutar_pipeline.py`` full mode; ``utils.py:299`` fold
assignment).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts_dev/dress_rehearsal_53.py [scratch_dir]
"""

import json
import os
import resource
import sys
import time
from pathlib import Path

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["TPU_MSLESSEG_IMGSZ"] = "64"

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from tpu_mslesseg.core.runtime import (
    cpu_cache_dir,
    enable_compilation_cache,
    filter_benign_aot_warnings,
)

enable_compilation_cache(cpu_cache_dir())
# the rehearsal drives ejecutar_pipeline() directly (not the CLI main),
# so install the same-host AOT tuning-feature filter itself — otherwise
# every cache load floods the audit log (docs/aot_cache_warning.md)
filter_benign_aot_warnings()

from tpu_mslesseg.io import nifti
from tpu_mslesseg.pipeline import ejecutar_pipeline as orch
from tpu_mslesseg.pipeline.logging_setup import configure_logging
from tpu_mslesseg.pipeline.modelo import Modelo
from tpu_mslesseg.pipeline.paciente import calcular_fold
from tpu_mslesseg.train.trainer import TrainConfig

SHAPE = (24, 28, 24)
N_PAT = 53
K_FOLDS = 5
EPOCHS = 2
PLANES = ("axial", "coronal", "sagital")


def _modelo(plano):
    return Modelo(
        plano=plano, num_cortes=4, modalidad=["FLAIR"], k_folds=K_FOLDS,
        mejora="GC",
    )


def build_dataset(root: Path):
    rng = np.random.default_rng(53)
    ds = root / "MSLesSeg-Dataset" / "train"
    gt_root = root / "GT" / "train"
    if ds.is_dir() and len(list(ds.iterdir())) == N_PAT:
        print("dataset ya construido")
        return
    for i in range(1, N_PAT + 1):
        pid = f"P{i}"
        vol = rng.normal(1000, 200, SHAPE).astype(np.float32)
        mask = np.zeros(SHAPE, np.float32)
        x0, y0, z0 = 4 + i % 6, 6 + i % 5, 4 + i % 7
        mask[x0 : x0 + 8, y0 : y0 + 9, z0 : z0 + 8] = 1
        pdir = ds / pid / "T1"
        nifti.save(vol, np.eye(4), pdir / f"{pid}_T1_FLAIR.nii.gz")
        nifti.save(mask, np.eye(4), pdir / f"{pid}_T1_MASK.nii.gz")
        nifti.save(
            mask.astype(np.uint8), np.eye(4), gt_root / pid / f"{pid}_MASK.nii.gz"
        )
    print(f"dataset sintético: {N_PAT} pacientes {SHAPE}")


def main():
    root = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/dress53")
    root.mkdir(parents=True, exist_ok=True)
    build_dataset(root)
    os.chdir(root)
    configure_logging(log_file="pipeline.log")

    # fold assignment audit before anything runs (array_split parity)
    sizes = {}
    for i in range(1, N_PAT + 1):
        sizes.setdefault(calcular_fold(f"P{i}", K_FOLDS), []).append(i)
    assert [len(sizes[k]) for k in sorted(sizes)] == [11, 11, 11, 10, 10], sizes
    assert 1 in sizes[1] and 53 in sizes[5]
    print("fold split 11/11/11/10/10 ✓")

    cfg = TrainConfig(epochs=EPOCHS, batch_size=8, imgsz=64)
    t_all = time.time()
    for plano in PLANES:
        t0 = time.time()
        orch.ejecutar_pipeline(
            _modelo(plano), epochs=EPOCHS, entrenar=True, train_cfg=cfg,
            train_paralelo=True,
        )
        print(f"--- plano {plano}: {time.time()-t0:.0f}s")
    wall = time.time() - t_all

    # ---- artifact-tree audit ----
    m = _modelo("axial")
    base_vols = root / "pred_vols" / f"{m.base_path}_{EPOCHS}epochs"
    base_res = root / "results" / f"{m.base_path}_{EPOCHS}epochs"
    missing = []
    for k in range(1, K_FOLDS + 1):
        for plano in PLANES:
            from tpu_mslesseg.pipeline.paths import ConfigTrain

            ct = ConfigTrain(
                modelo=_modelo(plano), epochs=EPOCHS, fold_test=k, root=root
            )
            for f in ("best.ckpt", "last.ckpt"):
                if not (ct.weights_dir / f).exists():
                    missing.append(ct.weights_dir / f)
            for f in ("results.csv", "args.yaml"):
                if not (ct.fold_dir / f).exists():
                    missing.append(ct.fold_dir / f)
        for i in sizes[k]:
            pid = f"P{i}"
            for suf in [f"{pid}_{p}.nii.gz" for p in PLANES] + [
                f"{pid}_consenso.nii.gz"
            ]:
                if not (base_vols / f"fold{k}" / pid / suf).exists():
                    missing.append(base_vols / f"fold{k}" / pid / suf)
            for plano in list(PLANES) + ["consenso"]:
                rj = base_res / f"fold{k}" / pid / f"{pid}_{plano}_results.json"
                if not rj.exists():
                    missing.append(rj)
        for plano in list(PLANES) + ["consenso"]:
            fj = base_res / f"fold{k}" / f"fold{k}_{plano}_results.json"
            if not fj.exists():
                missing.append(fj)

    if missing:
        print(f"FALTAN {len(missing)} artefactos; primeros 10:")
        for p in missing[:10]:
            print("  ", p)
        raise SystemExit(1)

    # cross-fold global aggregates exist and parse
    globals_found = sorted(
        str(p.relative_to(root)) for p in (root / "results").rglob("global_*")
    )
    print("agregados globales:", globals_found)
    for plano in list(PLANES) + ["consenso"]:
        gj = base_res / f"global_{plano}_results.json"
        assert gj.exists(), gj
    fold1 = json.loads(
        (base_res / "fold1" / "fold1_axial_results.json").read_text()
    )
    assert set(fold1) >= {"DSC", "AUC", "Precision", "Recall"}, fold1

    rss_gib = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20
    print(
        f"\nDRESS REHEARSAL OK: {N_PAT} pacientes x {len(PLANES)} planos x "
        f"{K_FOLDS} folds, {EPOCHS} epochs fold-parallel (8 disp. virtuales)\n"
        f"wall={wall:.0f}s  peakRSS={rss_gib:.2f}GiB"
    )


if __name__ == "__main__":
    main()
