#!/usr/bin/env bash
# Build the --py-files artifact for cluster submission (north rule:
# "runs via spark-submit --py-files on multi-executor clusters").
#
#   ./scripts/package.sh                 -> dist/sentometrics_spark.zip
#   spark-submit --py-files dist/sentometrics_spark.zip \
#       --conf spark.sql.adaptive.enabled=true \
#       --conf spark.sql.adaptive.skewJoin.enabled=true \
#       scripts/submit_job.py --input <iceberg-table> --output <tier-root>
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/sentometrics_spark.zip
zip -qr dist/sentometrics_spark.zip sentometrics_spark -x '*__pycache__*'
echo "dist/sentometrics_spark.zip"
unzip -l dist/sentometrics_spark.zip | tail -2
