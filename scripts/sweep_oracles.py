"""Run EVERY registered query against its DuckDB oracle at every
testdata SF — the superset of the driver's sf0.01 gate.

The driver verifies at one scale; engine-divergence bugs can hide at
the gate SF and surface at another (round 5: ``events_user_stats``'
float ``round(avg, 3)`` flipped at a half-ulp boundary for 3 of 1500
users at sf0.1 while sf0.01 was green — fixed with the decimal-sum
pattern).  Run this after touching any query or oracle:

    python scripts/sweep_oracles.py            # all SFs
    python scripts/sweep_oracles.py sf0.1      # one SF

Exit code 1 on any mismatch.
"""

from __future__ import annotations

import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v, ndigits: int | None = None):
    """Canonicalize one cell.  Floats compare EXACTLY by default
    (ADVICE r5: a 1e-6 pre-round hid sub-rounding engine divergences —
    the very drift class this tool exists to catch); ``ndigits`` is the
    documented fallback used only to tell "diverged in the last ulps"
    from "genuinely different", and rows equal only after rounding are
    loudly WARNed, not silently passed."""
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v if ndigits is None else round(v, ndigits)
    return v.isoformat() if hasattr(v, "isoformat") else v


def sweep(sf_dir: str, spark) -> list[str]:
    import duckdb

    import __spark_entry__ as entry

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = entry.queries(), entry.oracle_sql()
    # Retired rows (swapped out of the 50-row driver registry) stay in
    # the sweep's exact gate at every SF.
    qs = {**qs, **entry.retired_queries()}
    oracles = {**oracles, **entry.retired_oracle_sql()}
    fails: list[str] = []
    for name in qs:
        try:
            sdf = qs[name](spark, sf_dir)
            cols = sorted(sdf.columns)
            s_raw = [tuple(r) for r in sdf.select(*cols).collect()]
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            order = sorted(range(len(dcols)), key=lambda i: dcols[i])
            d_raw = [tuple(r[i] for i in order) for r in res.fetchall()]

            def rows(raw, nd=None):
                return sorted([tuple(_norm(x, nd) for x in t) for t in raw], key=repr)

            s_rows, d_rows = rows(s_raw), rows(d_raw)
            if cols != sorted(dcols):
                fails.append(name)
                print(f"  COLS {name}: {cols} vs {sorted(dcols)}")
            elif s_rows != d_rows:
                # exact mismatch: is it last-ulp drift or a real diff?
                if rows(s_raw, 6) == rows(d_raw, 6):
                    print(
                        f"  WARN {name}: rows equal only after 1e-6 rounding "
                        "— engine drift below the old tolerance; pin the "
                        "divergent column (decimal-sum / literal-lookup)"
                    )
                    continue
                fails.append(name)
                diff = [i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
                first = diff[0] if diff else min(len(s_rows), len(d_rows))
                print(
                    f"  ROWS {name}: {len(s_rows)} vs {len(d_rows)}; "
                    f"first diff {s_rows[first] if first < len(s_rows) else '<none>'} "
                    f"vs {d_rows[first] if first < len(d_rows) else '<none>'}"
                )
            else:
                print(f"  ok   {name} ({len(s_rows)} rows)")
        except Exception as e:  # noqa: BLE001 - report and continue the sweep
            fails.append(name)
            print(f"  ERR  {name}: {type(e).__name__}: {str(e)[:160]}")
    con.close()
    return fails


def main() -> int:
    from ocr_api_spark.plans.session import build_session

    base = "/root/testdata"
    # args may be driver SF tags (sf0.01) or paths to generated SF dirs
    # (dist/testdata/sf1.0 from scripts/gen_scaled_sf.py)
    wanted = sys.argv[1:] or sorted(
        d for d in os.listdir(base) if d.startswith("sf")
    )
    spark = build_session(
        app_name="oracle-sweep", master="local[16]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for sf in wanted:
        sf_dir = sf if os.path.isdir(sf) else os.path.join(base, sf)
        print(f"== {sf_dir}")
        fails = sweep(sf_dir, spark)
        if fails:
            bad += len(fails)
            print(f"== {sf}: {len(fails)} FAILURES: {fails}")
        else:
            print(f"== {sf}: all green")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
