#!/bin/sh
# Package the engine for cluster deployment:
#   spark-submit --py-files dist/fetcho_spark.zip your_job.py
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/fetcho_spark.zip
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("dist/fetcho_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("fetcho_spark/**/*.py")):
        z.write(p, p.as_posix())
print("wrote dist/fetcho_spark.zip")
EOF
