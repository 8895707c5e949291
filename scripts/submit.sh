#!/usr/bin/env bash
# Package + spark-submit entry point (north_rule: "packaged for
# spark-submit --py-files on a multi-executor cluster").
#
# Usage: scripts/submit.sh [--master spark://...] [pipeline args...]
# Default master is local[*]; on a real cluster pass the master URL and
# executor sizing, e.g.:
#   scripts/submit.sh --master spark://host:7077 \
#     --conf spark.executor.instances=1000 \
#     --conf spark.executor.cores=8 --conf spark.executor.memory=32g \
#     -- --input s3://bucket/repo_files --checkpoint-root s3://bucket/ck
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/amp_pyfiles.zip
rm -f "$ZIP"
zip -qr "$ZIP" amp

SUBMIT_ARGS=()
APP_ARGS=()
seen_sep=0
for a in "$@"; do
  if [[ "$a" == "--" ]]; then seen_sep=1; continue; fi
  if [[ $seen_sep == 0 ]]; then SUBMIT_ARGS+=("$a"); else APP_ARGS+=("$a"); fi
done
[[ ${#SUBMIT_ARGS[@]} -eq 0 ]] && SUBMIT_ARGS=(--master 'local[*]')

exec spark-submit \
  "${SUBMIT_ARGS[@]}" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  scripts/run_pipeline.py "${APP_ARGS[@]}"
