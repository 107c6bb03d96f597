#!/bin/sh
# Build the --py-files artifact for cluster deployment:
#   spark-submit --py-files dist/tric_spark.zip your_job.py
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/tric_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/tric_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("tric_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/tric_spark.zip")
EOF
unzip -l dist/tric_spark.zip | tail -3
