"""Scaling evidence: the identical extraction job at two parallelism
levels (local[8] vs local[32]) on the same input — the sandbox stand-in
for N vs 4N executors (north_rule).  Each level runs in its own
subprocess (fresh JVM, warmup pass first).

Scaling is only observable when task compute dominates fixed costs, so
the input is ~1M pages (built deterministically by replicating the
cached synthetic pages with distinct urls — per-row work is identical).
The timed job is the extraction plan → bucket-partitioned parquet sink,
i.e. exactly the production dataflow (scan → broadcast claims join →
boilerplate branch → extract UDF → match UDF → shuffle on
(bucket, salt) → write).

Usage: python BENCH/scaling.py [n_base_rows] [replicate]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

WORKER = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, os.environ["SPARK_GRAFT_REPO"])
from ocr_api_spark.plans.pipeline import extraction_plan
from ocr_api_spark.plans.session import build_session

cpus = int(sys.argv[1])
pages_path = sys.argv[2]
claims_path = sys.argv[3]
spark = build_session(app_name=f"scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")

def job(out):
    pages = spark.read.parquet(pages_path)
    claims = spark.read.parquet(claims_path)
    plan = extraction_plan(pages, claims, 32, 8, n_parts=cpus * 4)
    plan.write.mode("overwrite").partitionBy("bucket").parquet(out)

# warmup on a slice: JVM stages + Python worker pool
warm = tempfile.mkdtemp(prefix="scale_warm_")
pages = spark.read.parquet(pages_path).limit(20000)
claims = spark.read.parquet(claims_path)
extraction_plan(pages, claims, 32, 8, n_parts=cpus) \
    .write.mode("overwrite").partitionBy("bucket").parquet(warm + "/x")
shutil.rmtree(warm, ignore_errors=True)

out = tempfile.mkdtemp(prefix=f"scale_out_{cpus}_") + "/extracted"
t0 = time.time()
job(out)
wall = time.time() - t0
n = spark.read.parquet(out).count()
shutil.rmtree(os.path.dirname(out), ignore_errors=True)
print(json.dumps({"cpus": cpus, "rows": n, "wall_s": round(wall, 3),
                  "docs_per_sec": round(n / wall, 2)}))
spark.stop()
"""

BUILD_INPUT = r"""
import os, sys
sys.path.insert(0, os.environ["SPARK_GRAFT_REPO"])
from pyspark.sql import functions as F
from ocr_api_spark.plans.session import build_session

base_pages, base_claims, out_dir, replicate = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
spark = build_session(app_name="scaling-input", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
rep = F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))).alias("rep")
pages = spark.read.parquet(base_pages).select("*", rep) \
    .withColumn("url", F.concat(F.col("url"), F.lit("/r"), F.col("rep"))).drop("rep")
claims = spark.read.parquet(base_claims).select("*", rep) \
    .withColumn("url", F.concat(F.col("url"), F.lit("/r"), F.col("rep"))).drop("rep")
pages.repartition(32).write.mode("overwrite").parquet(out_dir + "/pages.parquet")
claims.repartition(8).write.mode("overwrite").parquet(out_dir + "/claims.parquet")
print("rows:", spark.read.parquet(out_dir + "/pages.parquet").count())
spark.stop()
"""


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from ocr_api_spark.sources.pages import write_pages

    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 84
    env = dict(os.environ, SPARK_GRAFT_REPO=repo)

    base = os.path.join(tempfile.gettempdir(), f"spark_graft_pages_scalebase_{n_base}")
    if not os.path.exists(os.path.join(base, "_DONE")):
        shutil.rmtree(base, ignore_errors=True)
        write_pages(base, n_rows=n_base, seed=42)
        open(os.path.join(base, "_DONE"), "w").write("ok")

    big = os.path.join(tempfile.gettempdir(), f"spark_graft_scaling_{n_base}x{replicate}")
    if not os.path.exists(os.path.join(big, "_DONE")):
        shutil.rmtree(big, ignore_errors=True)
        subprocess.run(
            [sys.executable, "-c", BUILD_INPUT, f"{base}/pages.parquet", f"{base}/claims.parquet", big, str(replicate)],
            env=env,
            check=True,
        )
        open(os.path.join(big, "_DONE"), "w").write("ok")

    n_small = int(os.environ.get("SPARK_GRAFT_SCALE_N", "4"))
    n_big = n_small * 4
    results = {}
    for cpus in (n_small, n_big):
        out = subprocess.run(
            [sys.executable, "-c", WORKER, str(cpus), f"{big}/pages.parquet", f"{big}/claims.parquet"],
            capture_output=True,
            text=True,
            env=env,
            check=True,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
        print(line)

    ts = results[n_small]["docs_per_sec"]
    tb = results[n_big]["docs_per_sec"]
    eff = round(tb / (4 * ts), 3)
    summary = {
        "rows": results[n_big]["rows"],
        "n": n_small,
        "4n": n_big,
        f"local{n_small}_docs_per_sec": ts,
        f"local{n_big}_docs_per_sec": tb,
        "scaling_efficiency_n_to_4n": eff,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
