#!/usr/bin/env python
"""Environment probe: how well does PLAIN Spark shuffle work scale on this
box? Runs an engine-free join+aggregate job (spark.range -> two hash
shuffles, zero Python, zero zelph code) at two thread counts in fresh JVMs
and prints the efficiency. If raw Catalyst shuffle work itself caps well
below 1.0 here, that bound is an environment property (one memory bus, one
set of physical cores shared with the driver and OS) and applies to ANY
Spark job on this sandbox — it separates what the engine can fix from what
only a real multi-host cluster changes.

Usage: python tools/shuffle_probe.py [rows] [low_cores] [high_cores]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def one(rows: int, cores: str) -> float:
    code = f"""
import time
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[{cores}]")
         .config("spark.sql.shuffle.partitions", "64")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false")
         .config("spark.local.dir", "{os.environ.get('ZELPH_SPARK_LOCAL_DIR', '/dev/shm/spark-local')}")
         .getOrCreate())
a = spark.range({rows}).select((F.col("id") % 10_000_000).alias("k"),
                               (F.col("id") % 1000).alias("v"))
b = spark.range({rows} // 4).select((F.col("id") % 10_000_000).alias("k"),
                                    (F.col("id") % 777).alias("w"))
t0 = time.time()
out = (a.join(b, "k")
       .groupBy((F.col("k") % 1024).alias("g"))
       .agg(F.sum(F.col("v") + F.col("w")).alias("s"))
       .agg(F.sum("s")).collect())
print("PROBE_SEC", time.time() - t0)
spark.stop()
"""
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=os.environ)
    for line in p.stdout.splitlines():
        if line.startswith("PROBE_SEC"):
            return float(line.split()[1])
    raise SystemExit(p.stderr[-2000:])


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000_000
    low = sys.argv[2] if len(sys.argv) > 2 else "8"
    high = sys.argv[3] if len(sys.argv) > 3 else "32"
    os.makedirs(os.environ.get("ZELPH_SPARK_LOCAL_DIR", "/dev/shm/spark-local"),
                exist_ok=True)
    t_low, t_high = one(rows, low), one(rows, high)
    ratio = int(high) / int(low)
    print(json.dumps({
        "metric": "raw_shuffle_scaling_efficiency",
        "value": round((t_low / t_high) / ratio, 3),
        "unit": f"speedup/(cores ratio {int(ratio)}x)",
        "rows": rows,
        f"local[{low}]": round(t_low, 2),
        f"local[{high}]": round(t_high, 2),
    }))


if __name__ == "__main__":
    main()
