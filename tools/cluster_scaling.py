#!/usr/bin/env python
"""N vs 4N EXECUTOR scaling on a local standalone Spark cluster.

The BASELINE.json contract asks for the job to ship via ``spark-submit
--py-files`` to clusters of N and 4N executors. ``bench.py --scaling``
approximates that with local[N] thread counts inside ONE JVM — which also
shares one GC and one shuffle manager across all "executors". This harness
runs the real deployment shape inside the sandbox: a standalone master +
N separate Worker JVMs (one executor each, fixed cores/memory per
executor), the package shipped as a zip via ``--py-files``, and the same
e2e job (bench.py --one-scale submit) submitted against both cluster sizes.

Usage:  python tools/cluster_scaling.py [n_docs] [low_workers] [high_workers]
Env:    ZELPH_EXEC_CORES (default 8), ZELPH_EXEC_MEM (default 18g),
        ZELPH_CLUSTER_LOCAL_DIR (default /dev/shm/spark-local — the
        per-executor-disk stand-in; the sandbox has one physical disk).
Prints one JSON line: throughput at both sizes + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
import zipfile

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MASTER_URL = "spark://127.0.0.1:7077"


def make_pyfiles_zip() -> str:
    zpath = "/tmp/zelph_spark_pyfiles.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(os.path.join(REPO, "zelph_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def _daemon_env() -> dict:
    return {
        **os.environ,
        "SPARK_HOME": SPARK_HOME,
        "SPARK_LOG_DIR": "/tmp/spark-logs",
        "SPARK_MASTER_HOST": "127.0.0.1",
        "JAVA_TOOL_OPTIONS": "",
    }


def start_master() -> None:
    subprocess.run(
        [f"{SPARK_HOME}/sbin/start-master.sh", "--host", "127.0.0.1",
         "--port", "7077", "--webui-port", "8090"],
        env=_daemon_env(), capture_output=True,
    )
    time.sleep(4)


def stop_master() -> None:
    subprocess.run([f"{SPARK_HOME}/sbin/stop-master.sh"],
                   env=_daemon_env(), capture_output=True)


def start_workers(n: int, cores: int, mem: str) -> list:
    procs = []
    for i in range(n):
        wd = f"/tmp/spark-worker-{i}"
        shutil.rmtree(wd, ignore_errors=True)
        os.makedirs(wd, exist_ok=True)
        p = subprocess.Popen(
            [f"{SPARK_HOME}/bin/spark-class",
             "org.apache.spark.deploy.worker.Worker", MASTER_URL,
             "--cores", str(cores), "--memory", mem,
             "--work-dir", wd, "--webui-port", str(8101 + i),
             "--host", "127.0.0.1", "--port", str(7201 + i)],
            env=_daemon_env(),
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        procs.append(p)
    time.sleep(6 + n)
    return procs


def stop_workers(procs: list) -> None:
    for p in procs:
        p.terminate()
    for p in procs:
        try:
            p.wait(timeout=20)
        except subprocess.TimeoutExpired:
            p.kill()


def run_submit(n_docs: int, zpath: str, n_workers: int, cores: int,
               mem: str, local_dir: str) -> dict:
    cmd = [
        f"{SPARK_HOME}/bin/spark-submit",
        "--master", MASTER_URL,
        "--deploy-mode", "client",
        "--py-files", zpath,
        "--driver-memory", "10g",
        "--conf", f"spark.executor.cores={cores}",
        "--conf", f"spark.executor.memory={mem}",
        "--conf", f"spark.pyspark.python={sys.executable}",
        "--conf", f"spark.local.dir={local_dir}",
        "--conf", "spark.sql.shuffle.partitions=32",
        "--conf", "spark.ui.enabled=false",
        f"{REPO}/bench.py", "--one-scale", "submit", "--n-docs", str(n_docs),
    ]
    env = {**os.environ, "PYSPARK_PYTHON": sys.executable,
           "TMPDIR": os.environ.get("TMPDIR", "/dev/shm/zelph-tmp")}
    os.makedirs(env["TMPDIR"], exist_ok=True)
    p = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd=REPO)
    lines = [l for l in p.stdout.splitlines() if l.startswith("SCALE_RESULT ")]
    if not lines:
        sys.stderr.write(p.stdout[-3000:] + "\n" + p.stderr[-3000:] + "\n")
        raise SystemExit(f"cluster run with {n_workers} workers failed")
    return json.loads(lines[0][len("SCALE_RESULT "):])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    cores = int(os.environ.get("ZELPH_EXEC_CORES", "8"))
    mem = os.environ.get("ZELPH_EXEC_MEM", "18g")
    local_dir = os.environ.get("ZELPH_CLUSTER_LOCAL_DIR", "/dev/shm/spark-local")
    os.makedirs(local_dir, exist_ok=True)

    zpath = make_pyfiles_zip()
    results = {}
    start_master()
    try:
        for n_workers in (low, high):
            procs = start_workers(n_workers, cores, mem)
            try:
                results[n_workers] = run_submit(
                    n_docs, zpath, n_workers, cores, mem, local_dir
                )
            finally:
                stop_workers(procs)
    finally:
        stop_master()

    t_low, t_high = results[low]["sec"], results[high]["sec"]
    ratio = high / low
    eff = (t_low / t_high) / ratio

    def side(n):
        r = results[n]
        return {
            "sec": round(r["sec"], 2),
            "docs_per_sec": round(r["docs_per_sec"], 1),
            "stage_secs": r.get("stage_secs", {}),
            "fixpoint_rounds": r.get("fixpoint_rounds"),
            "fixpoint_secs": r.get("fixpoint_secs"),
        }

    print(json.dumps({
        "metric": "executor_scaling_efficiency",
        "value": round(eff, 3),
        "unit": f"speedup/(executor ratio {int(ratio)}x)",
        "n_docs": n_docs,
        "executor": {"cores": cores, "memory": mem},
        f"{low}_executors": side(low),
        f"{high}_executors": side(high),
    }))


if __name__ == "__main__":
    main()
