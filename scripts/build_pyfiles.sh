#!/usr/bin/env bash
# Package yadf_spark for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/yadf_spark.zip
python -c "
import zipfile, pathlib
root = pathlib.Path('yadf_spark')
with zipfile.ZipFile('dist/yadf_spark.zip', 'w', zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.rglob('*.py')):
        z.write(p, p.as_posix())
print('dist/yadf_spark.zip written')
"
