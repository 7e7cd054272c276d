"""The end-to-end extraction pipeline (reference lifecycle E1/E2 as one
Spark job — SURVEY.md §3) with the scale contract of the north_rule:

- **url-hash bucketing**: every row gets ``bucket = pmod(xxhash64(url),
  n_buckets)``; the output is partitioned by bucket, and a completed
  bucket is the unit of resume.
- **skew salting**: hot hosts would skew a host-keyed shuffle; the
  repartition key is ``(bucket, salt)`` with ``salt = pmod(xxhash64(url),
  n_salts)`` so one hot bucket spreads over many tasks.  The salt only
  affects placement — extraction is pure per-row, so content is
  deterministic regardless of layout.
- **lineage + metrics**: after the extraction write commits, one row per
  bucket (rows in/out, failures, wall seconds) is appended to
  ``metrics``; the set of completed buckets is the ``lineage`` table.
  A re-run reads lineage first and filters completed buckets out of the
  *scan* (partition pruning at the source), making a mid-flight kill
  resumable without duplicates.
- **claims join**: left join on url.  Claims at production scale are
  bucketed the same way; at test scale AQE chooses a broadcast.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_api_spark.operators.extract import fused_extract_udf

CLAIM_COLS = [
    "name",
    "father_name",
    "dob",
    "pan",
    "adharno",
    "address",
    "ifsc",
    "micr",
    "account_number",
    "company",
    "sources",
    "req_id",
]


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn("bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int"))


def with_salt(df: DataFrame, n_salts: int, hot_hosts: list[str] | None = None) -> DataFrame:
    """Uniform salt by default; when a hot-host list is supplied (from
    ``plans.skew.hot_hosts``), only those hosts get salted — cold hosts
    keep salt 0 so their files stay consolidated."""
    if hot_hosts:
        from ocr_api_spark.plans.skew import host_col

        salted = F.pmod(F.xxhash64("url", F.lit(1)), F.lit(n_salts)).cast("int")
        hot_arr = F.array(*[F.lit(h) for h in hot_hosts])
        return df.withColumn(
            "salt",
            F.when(F.array_contains(hot_arr, host_col(F.col("url"))), salted).otherwise(F.lit(0)),
        )
    return df.withColumn("salt", F.pmod(F.xxhash64("url", F.lit(1)), F.lit(n_salts)).cast("int"))


def read_completed_buckets(spark: SparkSession, out_dir: str) -> list[int]:
    """Buckets already committed (resume input).  ONLY a missing lineage
    table means 'first run' — any other read failure must surface, or a
    corrupt/mixed-schema lineage would silently re-extract every bucket
    and duplicate the output."""
    lineage_path = os.path.join(out_dir, "lineage")
    if not os.path.isdir(lineage_path):
        return []
    rows = spark.read.parquet(lineage_path).select("bucket").distinct().collect()
    return [int(r["bucket"]) for r in rows]


def extraction_plan(
    pages: DataFrame,
    claims: DataFrame | None,
    n_buckets: int,
    n_salts: int,
    n_parts: int | None = None,
    broadcast_claims: bool = True,
    hot_hosts: list[str] | None = None,
) -> DataFrame:
    """Build the logical plan: bucket+salt, repartition the *raw* pages
    (parallelism for the UDF stage + alignment for the bucket-partitioned
    sink — and the shuffle moves input bytes, not extracted structs),
    join claims, resolve text (HTML branch lazy), extract, match.

    ``broadcast_claims``: claims are per-url facts; at test scale they
    broadcast, at 10^12 scale disable this and co-bucket both tables so
    the join is shuffle-free."""
    pages = with_salt(with_bucket(pages, n_buckets), n_salts, hot_hosts)
    if n_parts:
        # r8 (guide §6 file sizing + §2.5): RANGE partition on (bucket,
        # salt) instead of hash.  Hash scattered every bucket's n_salts
        # salt groups across random partitions, so each task wrote ~8
        # bucket directories — 481 files of ~250 rows at the sf1.0 bench
        # (and a per-file writer/commit cost that dominated the write).
        # Range keeps each partition on 1-2 consecutive buckets → 111
        # files, measured 4.21 → 3.79 s for the same write INCLUDING
        # range sampling's extra pass.  Skew posture is equal-or-better:
        # the sampler balances partitions by row count, so a hot bucket
        # is split at salt boundaries instead of hashing whole into one
        # task.  Row placement stays deterministic (fixed sampling
        # seed), and extraction is pure per-row, so output content is
        # unchanged — only file layout improves.
        pages = pages.repartitionByRange(n_parts, "bucket", "salt")
    if claims is not None:
        right = F.broadcast(claims) if broadcast_claims else claims
        joined = pages.join(right, "url", "left")
    else:
        joined = pages
        for c in ["doc_type", *CLAIM_COLS]:
            joined = joined.withColumn(c, F.lit(None).cast("string"))

    # fused single Arrow crossing: boilerplate + extract + match
    html_when_needed = F.when(F.col("text").isNull() | (F.length("text") == 0), F.col("html"))
    extracted = joined.withColumn(
        "extraction",
        fused_extract_udf(
            F.col("text"),
            html_when_needed,
            F.col("doc_type"),
            F.col("name"),
            F.col("father_name"),
            F.col("dob"),
            F.col("pan"),
            F.col("adharno"),
            F.col("address"),
            F.col("ifsc"),
            F.col("micr"),
            F.col("account_number"),
        ),
    )
    return extracted.select(
        "url",
        "warc_ts",
        "lang",
        "bucket",
        "salt",
        "doc_type",
        F.col("extraction.extracted_text").alias("extracted_text"),
        F.col("extraction.status").alias("status"),
        F.col("extraction.error").alias("error"),
        F.col("extraction.pan").alias("pan"),
        F.col("extraction.aadhaar").alias("aadhaar"),
        F.col("extraction.bank").alias("bank"),
        F.col("extraction.financial").alias("financial"),
        F.col("extraction.dl").alias("dl"),
        F.col("extraction.passport").alias("passport"),
        F.col("extraction.match").alias("match"),
    )


def dedupe_pages(pages: DataFrame) -> DataFrame:
    """Exact-dedup stage (training-data-pipeline tier): one row per
    distinct text payload, deterministic keeper (min url).  At scale this
    is one shuffle keyed by the md5 fingerprint — high cardinality, no
    skew.  HTML rows dedupe on the raw payload."""
    from pyspark.sql.window import Window

    key = F.md5(F.coalesce(F.nullif(F.col("text"), F.lit("")), F.col("html").cast("string"), F.lit("")))
    return (
        pages.withColumn("__rn", F.row_number().over(Window.partitionBy(key).orderBy("url")))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def _data_files(out_path: str) -> set[str]:
    """All parquet data files under the bucket-partitioned output.
    Local-filesystem walk — the parquet-emulation counterpart of reading
    an Iceberg snapshot manifest; an object-store deployment uses the
    table format's manifest (plans/sink.py snapshot_files) instead of
    listing."""
    found = set()
    for root, _dirs, files in os.walk(out_path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith("."):
                found.add(os.path.join(root, f))
    return found


def _bucket_stats(new_files: set[str], wall_s: float) -> list[tuple]:
    """(bucket, rows_out, rows_failed, wall_s) per bucket touched by this
    run: row counts from parquet footers (no data read); failed counts
    from row-group ``status`` statistics when they decide (min==max),
    falling back to a single-column read only for mixed row groups."""
    import re as _re
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    def one(path: str) -> tuple[int, int, int] | None:
        mm = _re.search(r"bucket=(\d+)", path)
        if not mm:
            return None
        b = int(mm.group(1))
        pf = pq.ParquetFile(path)
        md = pf.metadata
        rows = md.num_rows
        failed = 0
        if rows:
            # parquet LEAF column index (struct columns flatten into
            # multiple leaves, so the arrow field index would be wrong)
            status_idx = next(
                i for i in range(md.num_columns) if md.schema.column(i).path == "status"
            )
            for rg in range(md.num_row_groups):
                col_md = md.row_group(rg).column(status_idx)
                st = col_md.statistics
                if st is not None and st.has_min_max and st.min == st.max:
                    if st.min == "Failed":
                        failed += md.row_group(rg).num_rows
                    continue
                status = pf.read_row_group(rg, columns=["status"]).column("status")
                failed += int(pc.sum(pc.equal(status, "Failed")).as_py() or 0)
        return (b, rows, failed)

    # r8: footer opens are I/O + C-parse (GIL released in pyarrow), so a
    # small thread pool cuts the driver-side stall roughly by its width;
    # per-bucket aggregation order is unaffected (results merged after).
    per_bucket: dict[int, list[int]] = {}
    with ThreadPoolExecutor(max_workers=8) as pool:
        for res in pool.map(one, sorted(new_files)):
            if res is None:
                continue
            b, rows, failed = res
            agg = per_bucket.setdefault(b, [0, 0])
            agg[0] += rows
            agg[1] += failed
    return [(b, r, f, wall_s) for b, (r, f) in sorted(per_bucket.items()) if r]


def _append_table(dir_path: str, columns: dict) -> None:
    """Append one parquet file of driver-local rows to a table directory.
    Column types pin the schema Spark's writer used for these tables
    (bucket int32, counts int64, wall float64, attempt_ts UTC-adjusted
    timestamp) so old and new files in one directory always merge."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    types = {
        "bucket": pa.int32(),
        "rows_out": pa.int64(),
        "rows_failed": pa.int64(),
        "wall_s": pa.float64(),
        "attempt_ts": pa.timestamp("us", tz="UTC"),
    }
    os.makedirs(dir_path, exist_ok=True)
    table = pa.table(
        {
            k: (
                pa.array([_ts_us(v) for v in vals], type=types[k])
                if k == "attempt_ts"
                else pa.array(vals, type=types[k])
            )
            for k, vals in columns.items()
        }
    )
    # dot-temp + rename (review r7): a SIGKILL mid-write must not leave
    # a torn .parquet in lineage/metrics — read_completed_buckets
    # deliberately surfaces read failures, so a truncated commit file
    # would brick every subsequent resume.  Dotfiles are invisible to
    # both Spark's reader and _data_files; rename on one filesystem is
    # atomic, so the table only ever contains whole files.
    name = f"part-{uuid.uuid4().hex}.parquet"
    tmp = os.path.join(dir_path, "." + name + ".tmp")
    pq.write_table(table, tmp)
    os.rename(tmp, os.path.join(dir_path, name))


def _ts_us(epoch_s: float):
    import datetime

    return datetime.datetime.fromtimestamp(epoch_s, tz=datetime.timezone.utc)


def run_extraction(
    spark: SparkSession,
    pages_path: str,
    claims_path: str | None,
    out_dir: str,
    n_buckets: int = 64,
    n_salts: int = 8,
    repartition: int | None = None,
    dedupe: bool = False,
    buckets: list[int] | None = None,
) -> dict:
    """Run (or resume) the pipeline.  Returns run statistics.

    ``buckets``: restrict this invocation to the given bucket ids (the
    url-hash bucket is deterministic, so a filtered run commits exactly
    those buckets' lineage).  ``run_extraction_chunked`` uses this to
    bound the blast radius of a mid-flight failure."""
    t0 = time.time()
    from ocr_api_spark.kernels.image import ENGINE_PROP, image_engine

    # resolve the image engine ON THE DRIVER and stamp it onto every
    # task of this run (local property ships with each task): a
    # heterogeneous fleet can no longer mix cv2 and numpy pixels by
    # worker placement — a "numpy" stamp pins the fallback everywhere,
    # a "cv2" stamp makes an OpenCV-less worker raise instead of
    # silently diverging (ADVICE r5; see kernels.image._cv2)
    driver_engine = image_engine()
    spark.sparkContext.setLocalProperty(ENGINE_PROP, driver_engine)
    pages = spark.read.parquet(pages_path)
    if dedupe:
        pages = dedupe_pages(pages)
    claims = spark.read.parquet(claims_path) if claims_path else None

    done = read_completed_buckets(spark, out_dir)
    pages = with_bucket(pages, n_buckets)
    if buckets is not None:
        pages = pages.filter(F.col("bucket").isin([int(b) for b in buckets]))
    if done:
        pages = pages.filter(~F.col("bucket").isin(done))
    pages = pages.drop("bucket")  # extraction_plan re-derives it

    # Repartition on (bucket, salt) happens INSIDE the plan, before the
    # UDF stage: it sets UDF parallelism (a compressed-byte-sized scan
    # would otherwise under-partition a compute-heavy stage), moves raw
    # input bytes instead of extracted structs, and aligns tasks with the
    # bucket-partitioned sink (n_parts files, not n_tasks × n_buckets).
    n_parts = repartition or spark.sparkContext.defaultParallelism * 2
    plan = extraction_plan(pages, claims, n_buckets, n_salts, n_parts=n_parts)

    # Metrics ride on the write with ZERO extra Spark jobs over the data:
    # - two global observe() aggregates (rows/failed) — measured free
    #   (a per-bucket observe with 2×n_buckets conditional sums costs ~75%
    #   of the whole job: the observe accumulator evaluates every expr per
    #   row, interpreted);
    # - per-bucket counts from the parquet FOOTERS of only THIS run's new
    #   files (dir-diff around the write), and per-bucket failed counts
    #   from a pyarrow read of just the dictionary-encoded ``status``
    #   column of those files — O(this run's output), never re-reading
    #   prior runs.  On Iceberg the dir-diff disappears: the new
    #   snapshot's manifest lists exactly these files with row counts.
    from pyspark.sql import Observation

    obs = Observation("run_metrics")
    plan = plan.observe(
        obs,
        F.count(F.lit(1)).alias("rows_out"),
        F.sum(F.when(F.col("status") == "Failed", 1).otherwise(0)).alias("rows_failed"),
    )

    out_path = os.path.join(out_dir, "extracted")
    before = _data_files(out_path)
    plan.write.mode("append").partitionBy("bucket").parquet(out_path)
    new_files = _data_files(out_path) - before

    m = obs.get
    n_rows = int(m["rows_out"] or 0)
    wall_now = round(time.time() - t0, 3)
    stats_rows = _bucket_stats(new_files, wall_now)
    if stats_rows:
        # metrics + lineage are driver-local lists (one row per bucket);
        # writing them through Spark jobs is pure scheduling overhead, so
        # append single-file parquet directly — spark.read.parquet reads
        # the directories identically, and the tables stay tiny at any
        # corpus scale (rows ∝ n_buckets, not data)
        _append_table(
            os.path.join(out_dir, "metrics"),
            {
                "bucket": [r[0] for r in stats_rows],
                "rows_out": [r[1] for r in stats_rows],
                "rows_failed": [r[2] for r in stats_rows],
                "wall_s": [r[3] for r in stats_rows],
                "attempt_ts": [time.time()] * len(stats_rows),
            },
        )
        # Iceberg-shaped commit record: which files this run added, with
        # per-bucket counts (plans/sink.py — verify_sink/compact_bucket
        # consume these)
        from ocr_api_spark.plans.sink import write_snapshot

        write_snapshot(out_dir, new_files, stats_rows)

    # Lineage commits OUTSIDE the stats_rows gate when this run was
    # bucket-scoped (review r7): a requested bucket that hashes zero
    # urls produces no files, but the write that would have contained
    # it DID commit — without a lineage row, run_extraction_chunked
    # would re-launch that group's full job on every resume forever.
    # Unscoped runs keep the old behavior (only touched buckets; a
    # single job never loops on lineage).
    lineage_buckets = {r[0] for r in stats_rows}
    if buckets is not None:
        lineage_buckets |= set(int(b) for b in buckets) - set(done)
    if lineage_buckets:
        _append_table(
            os.path.join(out_dir, "lineage"),
            {"bucket": sorted(lineage_buckets)},
        )

    footer_rows = sum(r[1] for r in stats_rows)
    if footer_rows != n_rows:
        # a concurrent run committing into the same out_dir between the
        # dir-diff snapshots shows up here; its rows are legitimately
        # committed, so surface the discrepancy instead of failing a job
        # whose own write already succeeded
        import warnings

        warnings.warn(
            f"metrics mismatch: footers counted {footer_rows} rows, observe saw {n_rows} "
            "(concurrent writer into the same out_dir?)",
            stacklevel=2,
        )

    wall = time.time() - t0
    return {
        "rows": n_rows,
        "wall_s": round(wall, 3),
        "docs_per_sec": round(n_rows / wall, 2) if wall > 0 else None,
        "buckets_skipped": len(done),
        # reproducibility stamp (review r5): which engine the DRIVER
        # resolved — and, since the run stamped it onto every task as a
        # local property, which engine every worker either used or
        # refused to substitute (see kernels.image._cv2)
        "image_engine": driver_engine,
    }


def run_extraction_chunked(
    spark: SparkSession,
    pages_path: str,
    claims_path: str | None,
    out_dir: str,
    n_buckets: int = 64,
    buckets_per_commit: int = 16,
    **kw,
) -> dict:
    """Resume-granular extraction for very long runs: process buckets in
    groups of ``buckets_per_commit``, each group one Spark job + one
    lineage/metrics/snapshot commit.  A mid-flight kill (OOM, preempted
    driver, spot reclaim) loses at most the in-flight group's work; the
    next invocation reads lineage and continues from the last commit —
    this is what "resumable at 10^12 documents" means operationally:
    the unit of redo is a bucket group, not the corpus.  Single-job
    ``run_extraction`` remains the right call when the whole corpus
    fits one job's failure domain.

    Group size trades scheduler overhead (one job per group) against
    redo bound; with bucket = hash(url) % n_buckets the groups are
    statistically even, and each group's job internally repartitions to
    full cluster parallelism, so chunking costs extra scans of the
    (pruned) input, not idle executors."""
    if kw.get("dedupe"):
        # review r7: dedupe_pages is a corpus-wide window that cannot be
        # pushed below the per-group bucket filter — chunking would pay
        # the FULL dedupe shuffle once per group (16x at 4096/256).
        # Stage a deduped corpus once upstream instead.
        raise ValueError(
            "dedupe=True is not supported in chunked mode: run dedupe_pages "
            "once and point pages_path at the deduped table"
        )
    t0 = time.time()
    done = set(read_completed_buckets(spark, out_dir))
    totals = {"rows": 0, "groups_run": 0, "groups_skipped": 0}
    for start in range(0, n_buckets, buckets_per_commit):
        group = [
            b for b in range(start, min(start + buckets_per_commit, n_buckets))
            if b not in done
        ]
        if not group:
            totals["groups_skipped"] += 1
            continue
        stats = run_extraction(
            spark, pages_path, claims_path, out_dir,
            n_buckets=n_buckets, buckets=group, **kw,
        )
        totals["rows"] += stats["rows"]
        totals["groups_run"] += 1
    wall = time.time() - t0
    totals["wall_s"] = round(wall, 3)
    totals["docs_per_sec"] = round(totals["rows"] / wall, 2) if wall > 0 else None
    return totals
