#!/usr/bin/env bash
# Build engine.zip for spark-submit --py-files (north rule: ship the engine
# to a multi-executor cluster).
#
#   scripts/package.sh                  # -> dist/engine.zip
#   spark-submit --py-files dist/engine.zip \
#       --conf spark.sql.catalog.ocrx=org.apache.iceberg.spark.SparkCatalog \
#       --conf spark.sql.catalog.ocrx.type=hadoop \
#       --conf spark.sql.catalog.ocrx.warehouse=<path> \
#       jobs/extract_job.py --pages ... --out ... --progress ... --batch-id N
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/engine.zip
zip -qr dist/engine.zip ocr_table_extractor_to_csv_spark -x '*__pycache__*'
echo "dist/engine.zip:"
unzip -l dist/engine.zip | tail -2
