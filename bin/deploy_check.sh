#!/bin/bash
# Cluster-deploy proof (north_rule: "run via spark-submit --py-files on
# multi-executor clusters"): package src/ocrflow as a zip, then run the
# extraction job via spark-submit from OUTSIDE the repo with ONLY the
# zip on the python path — proving the pipeline needs no repo checkout
# on executors. Exits non-zero on any failure.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=/tmp/ocrflow_deploy.zip
OUT=/tmp/ocrflow_deploy_out
rm -rf "$ZIP" "$OUT"
(cd "$REPO/src" && zip -qr "$ZIP" ocrflow)
cd /tmp
spark-submit --master "local[4]" --py-files "$ZIP" \
  "$REPO/bin/run_extract.py" --turns 2000 --out "$OUT" 2>/dev/null
python - <<PY
import json, sys
# the job writes an icelite table: row counts live in the manifest
snap = json.load(open("$OUT/metadata/snap-1.json"))
rows = sum(e["rows"] for e in snap["files"])
print(f"deploy check: {rows} rows extracted via --py-files zip")
sys.exit(0 if rows == 2000 else 1)
PY
