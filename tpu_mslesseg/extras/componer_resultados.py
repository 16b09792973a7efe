"""Results-table composer: all global JSONs -> one CSV of ``mean ± std``.

Reference: ``extras/componer_resultados.py`` — aggregates every
``global_<plano>_results.json`` across enhancements into a table ordered
Base/HE/CLAHE/GC/LT x Axial/Coronal/Sagital/Consenso (:150-222).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import pandas as pd

from tpu_mslesseg.pipeline.logging_setup import get_logger

logger = get_logger(__file__)

ORDEN_MEJORAS = ["Base", "HE", "CLAHE", "GC", "LT"]
ORDEN_PLANOS = ["axial", "coronal", "sagital", "consenso"]
METRICAS = ["DSC", "AUC", "Precision", "Recall"]


def parsear_experimento(json_path: Path):
    """(mejora, config, plano) from results/<mejora>/<config>/global_<plano>_results.json"""
    plano = json_path.stem.replace("global_", "").replace("_results", "")
    return json_path.parent.parent.name, json_path.parent.name, plano


def componer_resultados(results_root="results") -> pd.DataFrame:
    root = Path(results_root)
    rows = []
    for f in sorted(root.glob("*/*/global_*_results.json")):
        mejora, config, plano = parsear_experimento(f)
        data = json.loads(f.read_text())
        row = {"Mejora": mejora, "Config": config, "Plano": plano.capitalize()}
        for m in METRICAS:
            if m in data:
                row[m] = f"{data[m]['media']:.3f} ± {data[m]['std']:.3f}"
        rows.append(row)
    if not rows:
        raise FileNotFoundError(f"No hay global_*_results.json bajo {root}.")
    df = pd.DataFrame(rows)
    df["_m"] = df["Mejora"].map(
        {m: i for i, m in enumerate(ORDEN_MEJORAS)}
    ).fillna(len(ORDEN_MEJORAS))
    df["_p"] = df["Plano"].str.lower().map(
        {p: i for i, p in enumerate(ORDEN_PLANOS)}
    ).fillna(len(ORDEN_PLANOS))
    df = df.sort_values(["_m", "Config", "_p"]).drop(columns=["_m", "_p"])
    return df.reset_index(drop=True)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Tabla global de resultados.")
    parser.add_argument("--results", default="results")
    parser.add_argument("--out", default="resultados_globales.csv")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])
    df = componer_resultados(args.results)
    df.to_csv(args.out, index=False)
    logger.info(f"📋 Tabla global escrita en {args.out} ({len(df)} filas).")
    return df


if __name__ == "__main__":
    main()
