#!/bin/bash
# Regenerate plans/r20/<query>_after.txt for a comma-separated query list:
# runs graft.Bench with SPARK_GRAFT_EXPLAIN (which prints each query's
# .explain("formatted") to stderr before timing), then splits the stream
# into one file per query. Usage: tools/dump_plans.sh q153_pagerank,q290_hits
set -eu
QUERIES="$1"
OUT_DIR="${2:-plans/r20}"
LOG=$(mktemp /tmp/plans_XXXX.log)
SPARK_GRAFT_ONLY="$QUERIES" SPARK_GRAFT_EXPLAIN=1 SPARK_GRAFT_REPEAT=1 \
  SPARK_GRAFT_FRESH_CHECK=0 tools/benchrun.sh >/dev/null 2>"$LOG"
python3 - "$LOG" "$OUT_DIR" <<'EOF'
import re, sys
log, out = sys.argv[1], sys.argv[2]
text = open(log, errors="replace").read()
# drop log4j noise lines; keep plan blocks delimited by "== name =="
blocks = re.split(r"^== (q\w+) ==$", text, flags=re.M)
for i in range(1, len(blocks) - 1, 2):
    name, body = blocks[i], blocks[i + 1]
    # the plan ends where bench/log lines resume
    lines = []
    for ln in body.splitlines():
        if re.match(r"^\d{2}/\d{2}/\d{2} ", ln) or ln.startswith("[bench]"):
            break
        lines.append(ln)
    open(f"{out}/{name}_after.txt", "w").write("\n".join(lines).strip() + "\n")
    print("wrote", f"{out}/{name}_after.txt")
EOF
