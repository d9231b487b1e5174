#!/usr/bin/env bash
# Package ner_spark for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/ner_spark.zip
python - <<'EOF'
import zipfile
from pathlib import Path

with zipfile.ZipFile("dist/ner_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(Path("ner_spark").rglob("*.py")):
        z.write(p, p.as_posix())
print("wrote dist/ner_spark.zip")
EOF
