#!/usr/bin/env python3
"""Regenerate src/main/resources/golden/query_prices.tsv — the per-query
price book (quiet-box warm-median seconds at sf0.1) that Bench's
book_suspect flag compares against.

Usage: python3 tools/pricebook.py bench_detail1.json [bench_detail2.json ...]

Each argument is a bench_detail.json written by a full `graft.Bench` run
on a quiet box at sf0.1. The book price per query is the MEDIAN across
the given runs of that run's warm median. PriceBookSpec pins the book's
key set to SparkEntry.queries, so regen this after adding queries.
"""
import json
import pathlib
import statistics
import sys

out = (pathlib.Path(__file__).resolve().parent.parent
       / "src/main/resources/golden/query_prices.tsv")
runs = [json.loads(pathlib.Path(p).read_text()) for p in sys.argv[1:]]
if not runs:
    sys.exit(__doc__)
names = set()
for r in runs:
    names |= set(r["queries"])
rows = []
for n in sorted(names):
    vals = [r["queries"][n] for r in runs if n in r["queries"]]
    rows.append(f"{n}\t{statistics.median(vals):.3f}")
out.parent.mkdir(parents=True, exist_ok=True)
header = ("# Per-query price book: quiet-box warm-median seconds at sf0.1.\n"
          f"# Median of {len(runs)} run(s). Regenerate: "
          "python3 tools/pricebook.py bench_detail*.json\n")
out.write_text(header + "\n".join(rows) + "\n")
print(f"wrote {len(rows)} prices to {out}")
