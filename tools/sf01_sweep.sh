#!/usr/bin/env bash
# Full sf0.1 oracle sweep, including the quadratic-oracle slice pass.
#
# The driver's correctness gate runs at sf0.01; this reproduces the
# builder's 10x-scale evidence:
#   1. every query vs DuckDB at full sf0.1 (90 s per-oracle timeout —
#      the four all-pairs n-gram oracles are DuckDB-quadratic and time
#      out there; the engine side runs them in seconds);
#   2. those five (q18/q33/q44/q57/q75) vs DuckDB on a deterministic
#      2500-doc slice (doc_id % 2 = 0 — a pure modular predicate both
#      engines compute identically), other tables symlinked. Raised
#      from 1000 in round 10 (r9 verdict #6): measured oracle cost is
#      ~227 s per all-pairs query at 2500 docs vs ~41 s at 1000 —
#      the largest size the 1800 s per-oracle budget sustains across
#      all five; the full 5000-doc table extrapolates to ~15-20 min
#      PER oracle, past any routine sweep budget.
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.1}
SLICE=/tmp/sf01_slice
QUAD=q18_neardup_lsh,q33_components,q44_jaccard_neardup,q57_decontaminate,q75_neardup_winners

echo "== full $SF sweep =="
sbt -batch "runMain graft.Verify $SF /tmp/verify_sf01" >/dev/null
python3 tools/compare_oracle.py /tmp/verify_sf01 "$SF" 90

echo "== building 2500-doc slice =="
mkdir -p "$SLICE"
for t in region nation customer supplier part orders lineitem events embeddings; do
  ln -sf "$SF/$t.parquet" "$SLICE/$t.parquet"
done
python3 - "$SF" "$SLICE" <<'EOF'
import sys, duckdb
sf, sl = sys.argv[1], sys.argv[2]
duckdb.connect().execute(
    f"COPY (SELECT * FROM '{sf}/documents.parquet' WHERE doc_id % 2 = 0) "
    f"TO '{sl}/documents.parquet' (FORMAT PARQUET)")
EOF

echo "== quadratic-oracle queries on the slice =="
sbt -batch "runMain graft.Verify $SLICE /tmp/verify_slice" >/dev/null
python3 tools/compare_oracle.py /tmp/verify_slice "$SLICE" 1800 "$QUAD"
