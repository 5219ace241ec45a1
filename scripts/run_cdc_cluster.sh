#!/usr/bin/env bash
# Cluster deployment shape (north rule: spark-submit --py-files on a
# multi-executor cluster). In this sandbox there is no cluster; on a real one:
#
#   N-executor run:   --num-executors 25  --executor-cores 4
#   4N-executor run:  --num-executors 100 --executor-cores 4
#
# and compare change-events/sec between the two (target efficiency >= 0.8;
# the sandbox stand-in measurement lives in bench.py / BENCH/BASELINE.md).
set -euo pipefail

EVENTS_DIR=${1:?events dir}
TABLE_PATH=${2:?table path}
CHECKPOINT=${3:?checkpoint dir}

PYFILES=$(python -m migration_pair_spark package)

exec spark-submit \
  --deploy-mode client \
  --py-files "$PYFILES" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.task.maxFailures=4 \
  "$(python -c 'import migration_pair_spark, os; print(os.path.join(os.path.dirname(migration_pair_spark.__file__), "__main__.py"))")" \
  cdc-run --events "$EVENTS_DIR" --table-path "$TABLE_PATH" \
  --checkpoint "$CHECKPOINT" --write-mode mor
