#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [--allow-partial]
                              [--census <golden_tsv>]

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the parquet tables
in <sfDir>, sorts columns by name and rows by all columns, and compares
values exactly. Reports per-query PASS/FAIL with diffs.

--census mode (the extra-scale audit ratchet): the sf0.1 sweep has a
stable, adjudicated failure class — golden-fixture oracles pinned to the
sf0.01 gate scale plus single-cell cross-engine double-rounding flips
(ARCHITECTURE.md "Cross-engine double rounding"). Membership lives in
<golden_tsv> (src/test/resources/golden/census_failures.tsv: name<TAB>
reason). With --census, a failure OUTSIDE the golden list exits nonzero
(a NEW query joined the class — adjudicate it in the round that caused
it), while golden-listed failures count as expected; a golden entry that
now PASSES is flagged stale so the list can shrink.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def cmp_cell(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            return float(a) == float(b) or (math.isnan(float(a)) and math.isnan(float(b)))
        except (TypeError, ValueError):
            return False
    return a == b


def main():
    argv = sys.argv[1:]
    census_golden = None
    if "--census" in argv:
        i = argv.index("--census")
        census_golden = Path(argv[i + 1])
        del argv[i:i + 2]
    args = [a for a in argv if a != "--allow-partial"]
    allow_partial = "--allow-partial" in argv
    sf_dir, out_dir = args[0], args[1]
    marker = Path(out_dir) / "PARTIAL_RUN.txt"
    if marker.exists():
        msg = marker.read_text().strip()
        if allow_partial:
            print(f"WARN: partial run ({msg}) — NOT a full verification")
        else:
            print(f"FAIL: {marker} exists ({msg}); this dump is a filtered "
                  "subset, not a full verification. Re-run Verify without "
                  "SPARK_GRAFT_ONLY, or pass --allow-partial.")
            sys.exit(1)
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = n_skipped = 0
    passed, failed, not_run = [], [], []
    for name in sorted(oracle):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            # A missing qdir means the query was never executed (filtered
            # dump) — a different fact from "ran and mismatched". It gets
            # its own counter so the headline tally agrees with the census
            # treatment (a filtered run must not overstate failures), and
            # census mode must not adjudicate it as a NEW extra-scale
            # failure. Still fatal unless --allow-partial said a subset
            # was expected.
            print(f"SKIP {name}: no Spark output (not run)")
            n_skipped += 1
            not_run.append(name)
            continue
        try:
            got = canon(pd.read_parquet(qdir))
            want = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
            continue
        # Driver hashes typed values: DuckDB HUGEINT (any SUM of integers)
        # arrives as float64 while Spark longs arrive as int64 — equal values,
        # different hashes. Flag kind mismatches unless nulls forced the cast.
        tbad = None
        for c in got.columns:
            gk, wk = got[c].dtype.kind, want[c].dtype.kind
            if gk != wk and {gk, wk} <= {"i", "u", "f"} and \
                    not got[c].isna().any() and not want[c].isna().any():
                tbad = (c, got[c].dtype, want[c].dtype)
                break
        if tbad:
            print(f"FAIL {name}: dtype col {tbad[0]}: spark={tbad[1]} duckdb={tbad[2]}")
            n_fail += 1
            continue
        bad = None
        for c in got.columns:
            ga, wa = got[c].tolist(), want[c].tolist()
            for i, (x, y) in enumerate(zip(ga, wa)):
                if not cmp_cell(x, y):
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: col {c} row {i}: spark={x!r} duckdb={y!r}")
            n_fail += 1
            failed.append(name)
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
            passed.append(name)
    skip_note = f", {n_skipped} not run" if n_skipped else ""
    print(f"== {n_pass} pass, {n_fail} fail{skip_note}")
    if census_golden is not None:
        allowed = {}
        for line in census_golden.read_text().splitlines():
            line = line.strip()
            if line and not line.startswith("#"):
                parts = line.split("\t")
                allowed[parts[0]] = parts[1] if len(parts) > 1 else ""
        # the loop above appends names from `oracle`'s key order, but the
        # exception branches don't reach `failed` — recount from the
        # printed tallies instead: every EXECUTED name is in passed or
        # implicitly failed. Never-run names (missing qdir under a
        # filtered dump) are a separate category: "not run" is not
        # evidence a query joined the extra-scale failure class.
        new = [n for n in sorted(oracle)
               if n not in passed and n not in allowed and n not in not_run]
        stale = [n for n in passed if n in allowed]
        if not_run:
            print(f"CENSUS WARN: {len(not_run)} quer"
                  f"{'y' if len(not_run) == 1 else 'ies'} not run in this "
                  "dump (filtered/partial) — census verdict covers only "
                  "the executed subset")
        for n in stale:
            print(f"CENSUS stale: {n} now passes at this scale — drop it "
                  f"from {census_golden.name}")
        if new:
            for n in new:
                print(f"CENSUS NEW FAILURE: {n} is not in "
                      f"{census_golden.name} — a new query joined the "
                      "extra-scale failure class; adjudicate it THIS round "
                      "(boundary-rounding flip or fixture-pinned oracle?) "
                      "and either fix it or add it with a reason")
            print(f"== CENSUS: {len(new)} new failure(s), "
                  f"{len(allowed) - len(stale)} expected, {len(stale)} stale")
            sys.exit(1)
        print(f"== CENSUS: 0 new failures, "
              f"{len(allowed) - len(stale)} expected, {len(stale)} stale")
        # A partial dump must be DECLARED partial even in census mode:
        # a wedged/killed Verify leaves a parseable prefix that would
        # otherwise pass the census gate silently (r17 advice).
        sys.exit(1 if (not_run and not allow_partial) else 0)
    # not-run queries are fatal too unless a partial dump was declared —
    # a full verification with missing outputs is not a verification
    sys.exit(1 if (n_fail or (n_skipped and not allow_partial)) else 0)


if __name__ == "__main__":
    main()
