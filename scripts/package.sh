#!/usr/bin/env bash
# Build the --py-files zip for spark-submit (north_rule packaging requirement).
#   spark-submit --py-files dist/hatchery_spark.zip \
#     --master <cluster> dist/main.py --input ... --out ...
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/hatchery_spark.zip
zip -qr dist/hatchery_spark.zip hatchery_spark -x '*__pycache__*'
cp hatchery_spark/cli.py dist/main.py
echo "dist/hatchery_spark.zip + dist/main.py ready"
