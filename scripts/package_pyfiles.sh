#!/bin/sh
# Package the engine for spark-submit --py-files (north rule deployment
# path).  Pure-Python package, no binary deps beyond the cluster's
# numpy/pandas/pyarrow -> one zip ships everywhere.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/search_engine_spark.zip
python -c "
import zipfile, os
with zipfile.ZipFile('dist/search_engine_spark.zip', 'w', zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk('search_engine_spark'):
        if '__pycache__' in root:
            continue
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
print('dist/search_engine_spark.zip')
"
