#!/usr/bin/env bash
# Build dist/feasts_spark.zip for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/feasts_spark.zip
zip -qr dist/feasts_spark.zip feasts_spark -x '*__pycache__*'
echo "dist/feasts_spark.zip:"
unzip -l dist/feasts_spark.zip | tail -2
