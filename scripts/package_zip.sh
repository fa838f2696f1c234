#!/bin/sh
# Build gips_spark.zip for spark-submit --py-files (jobs/run_stage.py).
set -e
cd "$(dirname "$0")/.."
rm -f gips_spark.zip
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("gips_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("gips_spark/**/*.py")):
        z.write(p, p.as_posix())
print("wrote gips_spark.zip")
EOF
