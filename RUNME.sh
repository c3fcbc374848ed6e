#!/usr/bin/env bash
# Build + test + run, end to end — the analog of the reference's SLURM
# batch script (reference RUNME.sh:1-18: clean rebuild + run `main`).
# Usage: ./RUNME.sh | tee screen.log
set -euo pipefail
cd "$(dirname "$0")"

echo "== native build =="
python -c "from tpu_knn.native.build import build; print(build(force=True))"

echo "== tests (CPU backend, 8 virtual devices) =="
python -m pytest tests/ -x -q

echo "== harness (all versions, TA datasets) =="
python -m tpu_knn.harness.runner \
    --versions v0,v1,v2,v3,v4,v5,v6,v7,v8,v9,v10,v11 --shapes ta \
    --results-csv results.csv

echo "== multi-chip scaling evidence (virtual 8-device CPU mesh) =="
python scripts/mesh_scaling.py

echo "== benchmark =="
python bench.py

echo "== rendered report (docs/REPORT.html + docs/REPORT.pdf) =="
python scripts/render_report.py
python scripts/render_pdf.py
