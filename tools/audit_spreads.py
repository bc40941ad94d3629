"""Spread audit over every committed trend artifact (r10).

A paired median is only quotable if the run-to-run spread doesn't
swallow it: this box shows cold-run bimodality (a first parquet read
after the other engine's leg evicted page cache can cost 5-10x the
warm time), and a median computed over a mix of cold and warm runs
can flatter either engine. This tool flags every row in every
SCALETREND_*.json where an engine's spread exceeds its own median,
so the flagged ratios get either a re-run or an explicit robustness
argument in BASELINE.md instead of being quoted naked.

r10 outcome: the one materially exposed claim was the r9 x200
wip_aggregate_approx 0.89x (duck spread 16.6s > median 7.3s) - re-run
on the full protocol in SCALETREND_r10.json (1.05x; quotable claim
revised to parity-at-120M). The other flagged rows are ratio-robust:
their flagged engine's worst-case time still leaves the quoted ratio
on the same side of 1x by a wide margin (e.g. rolling_customer_spend
x100 spark 2.0s +/- 3.0s vs duck 26.1s stable - worst case 0.19x
against a quoted 0.08x).

Usage: python tools/audit_spreads.py [glob ...]
"""

from __future__ import annotations

import glob
import json
import sys

PATTERNS = sys.argv[1:] or ["SCALETREND_*.json", "BENCH_r*.json"]


def audit_bench_extras(f: str, d: dict) -> int:
    """BENCH extras (the exact wip/priority twins) are quoted numbers
    too (r10 verdict task 6): flag any whose best-of-2 spread exceeds
    the quoted minimum — that number is drift, not a measurement.
    Handles both raw bench.py output and the driver's {parsed: ...}
    wrapper; artifacts older than the extra_spread field are skipped
    (nothing to audit, by design not retroactively trusted)."""
    parsed = d.get("parsed", d)
    if not isinstance(parsed, dict):
        return 0
    extras = parsed.get("extra") or {}
    spreads = parsed.get("extra_spread") or {}
    flagged = 0
    for name, sec in extras.items():
        sp = spreads.get(name)
        if sp is not None and sec and sp > sec:
            flagged += 1
            print(f"{f} extra {name} spread {sp} > quoted {sec}")
    return flagged


def main() -> int:
    flagged = 0
    files = sorted({f for pat in PATTERNS for f in glob.glob(pat)})
    for f in files:
        d = json.load(open(f))
        if "BENCH" in f:
            flagged += audit_bench_extras(f, d)
            continue
        for q, pts in d.get("queries", {}).items():
            for k, v in pts.items():
                if not isinstance(v, dict):
                    continue
                notes = []
                for eng, med_k, sp_k in (
                    ("duck", "duckdb_sec", "duck_spread_sec"),
                    ("spark", "spark_sec", "spark_spread_sec"),
                ):
                    med, sp = v.get(med_k), v.get(sp_k)
                    if med and sp and sp > med:
                        notes.append(f"{eng} spread {sp} > median {med}")
                if notes:
                    flagged += 1
                    print(f"{f} {q} {k} ratio={v.get('ratio')} | " + "; ".join(notes))
    print(f"# {flagged} flagged rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
