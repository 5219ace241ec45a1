"""Extra measurement harness (guide §1) — bench.py is FROZEN for driver
measurement, so per-query isolation, repeats, job counts and steal-aware
timing live here.

Usage:
    python bench_extra.py [--reps N] [--sink count|noop] [query ...]

For each query (default: bench.py's HEADLINE_QUERIES) runs up to `reps`
CLEAN timed executions and prints one JSON line per query:
    {"query": ..., "walls": [...], "min": ..., "jobs": n, "dirty": k}

Steal discipline (same as bench.py's worker): the sandbox VM has
hypervisor-steal phases that inflate walls 2-8x. An all-core CPU-bound
calibration probe brackets every sample; samples whose opening OR closing
probe reads >35% over the session's best probe are recorded under
"dirty_walls" and do not count toward `walls`/`min`. `jobs` = Spark jobs
launched by the last rep (via job groups) — the fixed-overhead signal for
multi-action queries.
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ProcessPoolExecutor

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def _burn(_):
    s = 0
    for i in range(1_000_000):
        s += i * i
    return s


_cal_best: float | None = None


def calibrate() -> float:
    t0 = time.monotonic()
    with ProcessPoolExecutor(CPUS) as ex:
        list(ex.map(_burn, range(CPUS)))
    return time.monotonic() - t0


def box_clean() -> bool:
    global _cal_best
    c = calibrate()
    _cal_best = c if _cal_best is None else min(_cal_best, c)
    return c <= _cal_best * 1.35


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    sink = "count"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--sink":
            sink = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    from bench import HEADLINE_QUERIES

    names = names or HEADLINE_QUERIES

    from migration_pair_spark.queries import REGISTRY
    from migration_pair_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "bench-extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    # same uniform warm-up as bench.run_queries
    spark.range(1000).selectExpr("avg(xxhash64(id)) a").collect()
    from migration_pair_spark.functions.extract import extract_text_udf

    spark.createDataFrame([(b"<p>w</p>",)] * CPUS, "html binary").repartition(
        CPUS
    ).withColumn("t", extract_text_udf("html")).count()

    sc = spark.sparkContext
    for name in names:
        walls, dirty_walls = [], []
        jobs = None
        attempts = 0
        deadline = time.monotonic() + 600
        while (
            len(walls) < reps
            and attempts < reps + 6
            and time.monotonic() < deadline
        ):
            attempts += 1
            pre_clean = box_clean()
            group = f"bx-{name}-{attempts}"
            sc.setJobGroup(group, name)
            t0 = time.monotonic()
            df = REGISTRY[name].fn(spark, sf_dir)
            if sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            w = round(time.monotonic() - t0, 3)
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            sc.setJobGroup(None, None)
            if pre_clean and box_clean():
                walls.append(w)
            else:
                dirty_walls.append(w)
                time.sleep(3)
        print(
            json.dumps(
                {
                    "query": name,
                    "walls": walls,
                    "min": min(walls) if walls else None,
                    "dirty_walls": dirty_walls,
                    "jobs": jobs,
                    "sink": sink,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
