#!/usr/bin/env bash
# Build the --py-files artifact for cluster submission (north rule:
# "runs via spark-submit --py-files on multi-executor clusters").
#
#   ./scripts/make_pyfiles.sh            # writes dist/chopin_spark.zip
#   spark-submit --py-files dist/chopin_spark.zip your_job.py
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/chopin_spark.zip
zip -qr dist/chopin_spark.zip chopin_spark -x '*__pycache__*'
echo "wrote dist/chopin_spark.zip"
