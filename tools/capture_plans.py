"""Capture .explain("formatted") output for headline queries (guide §1.1).

Usage: python tools/capture_plans.py <out_dir> [suffix] [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query (default: every
bench.py headline query; suffix defaults to "before"). Run from the repo
whose plans you want — the round-start worktree for the _before set, the
working tree for _after.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    from bench import HEADLINE_QUERIES

    names = sys.argv[3:] or HEADLINE_QUERIES
    os.makedirs(out_dir, exist_ok=True)

    from migration_pair_spark.queries import REGISTRY
    from migration_pair_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        "capture-plans", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    for name in names:
        spark.sparkContext.setJobDescription(f"plan:{name}")
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001 - record the failure, keep going
            plan = f"PLAN CAPTURE FAILED: {e!r}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
