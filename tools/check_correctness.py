"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 on Spark and its
``oracle_sql()`` twin on DuckDB, then compares row count, column names,
and order-insensitive values (exact equality, floats included — the
engine's determinism contract is bit-for-bit).

Usage: python tools/check_correctness.py [--json OUT.json] [sf_dir] [name ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

_argv = sys.argv[1:]
JSON_OUT = None
MERGE = False
if _argv and _argv[0] == "--json":
    JSON_OUT = _argv[1]
    _argv = _argv[2:]
if _argv and _argv[0] == "--merge":
    # run ONLY the named queries but merge their rows into an existing
    # --json artifact (recomputing totals), so registering a new query
    # mid-round needs one run, not a full 105-query re-sweep. Every
    # merged row is still a real Spark-vs-oracle run; the guard test
    # (test_allcheck_artifacts_cover_full_registry) checks the merged
    # total against the registry.
    MERGE = True
    _argv = _argv[1:]
SF_DIR = _argv[0] if _argv else "/root/testdata/sf0.01"
ONLY = set(_argv[1:])
if MERGE and not (JSON_OUT and ONLY):
    sys.exit("--merge requires --json OUT.json and explicit query names")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Approx queries have no hashable oracle (an HLL estimate cannot
# bit-match a foreign engine), but they DO have a bound gate: every
# column except the approx-distinct one must equal the exact twin's
# oracle bit-for-bit, and the approx column must sit within 3x the
# default 5% relative standard deviation. name -> (approx_col, rel_tol).
APPROX_BOUND: dict[str, tuple[str, float]] = {
    "wip_aggregate_approx": ("lot_count", 0.15),
    "priority_wip_approx": ("lot_count", 0.15),
}


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    from dagster_etl_spark.plans.cache import release_pinned
    from dagster_etl_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("correctness", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    report: dict[str, dict] = {}
    # Load context (r17 verdict task 6): gate seconds are used for
    # round-over-round plan triage but swing ~6x under sweep-time load
    # (kn_bigram_surprisal 2.25s -> 14.64s, code unchanged). Record the
    # 1-min loadavg at sweep start AND per query so a slow row can be
    # adjudicated as contention vs plan regression from the artifact.
    import os as _os

    sweep_load = round(_os.getloadavg()[0], 2)
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        load1 = round(_os.getloadavg()[0], 2)
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            report[name] = {"status": "FAIL", "err": f"spark error: {exc}"[:400]}
            failures += 1
            continue
        finally:
            release_pinned()
        if name not in oracles:
            if name in APPROX_BOUND and name.removesuffix("_approx") in oracles:
                # bound gate vs the exact twin's (hash-verified) oracle:
                # mirrors tests/test_wip.py's twin comparison so the
                # full-sweep artifact records a verdict, not ROWS_ONLY
                approx_col, tol = APPROX_BOUND[name]
                exact = con.execute(oracles[name.removesuffix("_approx")]).fetchdf()
                probs = []
                if len(sdf) != len(exact):
                    probs.append(f"rows {len(sdf)} vs {len(exact)}")
                elif sorted(sdf.columns) != sorted(exact.columns):
                    probs.append(f"cols {sorted(sdf.columns)} vs {sorted(exact.columns)}")
                else:
                    keys = [c for c in sorted(sdf.columns) if c != approx_col]
                    a = sdf.sort_values(keys, kind="mergesort").reset_index(drop=True)
                    b = exact.sort_values(keys, kind="mergesort").reset_index(drop=True)
                    try:
                        pd.testing.assert_frame_equal(
                            a[keys], b[keys], check_dtype=False, check_exact=True
                        )
                    except AssertionError as exc:
                        probs.append(f"exact cols diverge: {str(exc)[:200]}")
                    else:
                        err = (a[approx_col] - b[approx_col]).abs()
                        bound = (tol * b[approx_col]).clip(lower=1)
                        n_bad = int((err > bound).sum())
                        if n_bad:
                            probs.append(
                                f"{approx_col} out of {tol:.0%} bound on {n_bad} rows "
                                f"(max rel err {(err / b[approx_col].clip(lower=1)).max():.3f})"
                            )
                elapsed = round(time.time() - t0, 2)
                if probs:
                    print(f"FAIL {name}: " + "; ".join(probs))
                    report[name] = {
                        "status": "FAIL",
                        "spark_rows": len(sdf),
                        "err": "; ".join(probs)[:400],
                    }
                    failures += 1
                else:
                    print(
                        f"PASS {name}: bound check vs exact twin, "
                        f"{len(sdf)} rows ({elapsed:.1f}s)"
                    )
                    report[name] = {
                        "status": "BOUND_OK",
                        "spark_rows": len(sdf),
                        "oracle_rows": len(exact),
                        "sec": elapsed,
                        "load1": load1,
                    }
                continue
            print(f"ok?  {name}: rows-only check, {len(sdf)} rows ({time.time()-t0:.1f}s)")
            report[name] = {"status": "ROWS_ONLY", "spark_rows": len(sdf)}
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            print(f"FAIL {name}: oracle error: {exc}")
            report[name] = {"status": "FAIL", "err": f"oracle error: {exc}"[:400]}
            failures += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        else:
            # The driver's value-hash stringifies per dtype (int 5 != float
            # 5.0), so a DuckDB HUGEINT->float64 fetchdf coercion passes a
            # value-equality check but fails the driver.  Gate on dtype KIND
            # (int/uint folded together; width differences are hash-neutral).
            fold = {"u": "i"}
            for c in sorted(sdf.columns):
                sk = fold.get(sdf[c].dtype.kind, sdf[c].dtype.kind)
                ok = fold.get(odf[c].dtype.kind, odf[c].dtype.kind)
                if sk != ok:
                    problems.append(f"dtype kind {c}: spark {sdf[c].dtype} vs oracle {odf[c].dtype}")
        if not problems:
            a, b = normalize(sdf), normalize(odf)
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            except AssertionError as exc:
                problems.append(f"values: {str(exc)[:400]}")
        elapsed = round(time.time() - t0, 2)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            report[name] = {
                "status": "FAIL",
                "spark_rows": len(sdf),
                "oracle_rows": len(odf),
                "err": "; ".join(problems)[:400],
            }
            failures += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows ({elapsed:.1f}s)")
            report[name] = {
                "status": "PASS",
                "spark_rows": len(sdf),
                "oracle_rows": len(odf),
                "sec": elapsed,
                "load1": load1,
            }
    spark.stop()
    if JSON_OUT and MERGE and Path(JSON_OUT).exists():
        prior = json.loads(Path(JSON_OUT).read_text())
        merged = dict(prior.get("queries", {}))
        merged.update(report)
        # drop rows for queries no longer registered (a rename would
        # otherwise leave a stale row inflating the total)
        merged = {n: r for n, r in merged.items() if n in qs}
        report = merged
        failures = sum(1 for r in report.values() if r["status"] == "FAIL")
    if JSON_OUT:
        n_pass = sum(1 for r in report.values() if r["status"] == "PASS")
        payload = {
            "sf_dir": SF_DIR,
            "loadavg_at_start": sweep_load,
            "total": len(report),
            "pass": n_pass,
            "rows_only": sum(1 for r in report.values() if r["status"] == "ROWS_ONLY"),
            "bound_ok": sum(1 for r in report.values() if r["status"] == "BOUND_OK"),
            "fail": failures,
            "queries": report,
        }
        Path(JSON_OUT).write_text(json.dumps(payload, indent=1, sort_keys=True) + "\n")
        print(f"wrote {JSON_OUT}: {n_pass} PASS / {failures} FAIL / {len(report)} total")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
