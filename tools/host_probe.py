"""One-shot host-health probe: the same fixed pure-Catalyst shuffle bench.py
interleaves between queries (see bench._host_probe).  Prints one JSON line
{"probe_sec": N, "rows": R, "cpus": C}.  Healthy on this host: ~1-4 s at
10M rows / ~2-4 s at 30M (BASELINE.md "Host-degradation log"); degraded
windows run the same job 10-70x slower.  Use it to decide whether a bench
or scaling artifact is worth recording right now."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zelph_spark.session import get_spark  # noqa: E402


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(
        app_name="host-probe", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    from pyspark.sql import functions as F

    # one untimed warmup so JVM spin-up is not counted
    spark.range(0, 1_000_000).groupBy((F.col("id") % 100)).count().count()
    t0 = time.time()
    (
        spark.range(0, rows)
        .withColumn("k", F.pmod(F.xxhash64("id"), F.lit(1_000_000)))
        .groupBy("k")
        .count()
        .count()
    )
    print(json.dumps({
        "probe_sec": round(time.time() - t0, 2), "rows": rows, "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
