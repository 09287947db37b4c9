#!/usr/bin/env bash
# Full sf0.1 oracle sweep, including the quadratic-oracle slice pass.
#
# The driver's correctness gate runs at sf0.01; this reproduces the
# builder's 10x-scale evidence:
#   1. every query vs DuckDB at full sf0.1 (90 s per-oracle timeout —
#      the four all-pairs n-gram oracles are DuckDB-quadratic and time
#      out there; the engine side runs them in seconds);
#   2. those four (q18/q33/q44/q57) vs DuckDB on a deterministic
#      1000-doc slice (doc_id % 5 = 2 — the same pure modular
#      predicate as Sampling.stratified, computed identically by both
#      engines), other tables symlinked.
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.1}
SLICE=/tmp/sf01_slice
QUAD=q18_neardup_lsh,q33_components,q44_jaccard_neardup,q57_decontaminate,q75_neardup_winners

echo "== full $SF sweep =="
sbt -batch "runMain graft.Verify $SF /tmp/verify_sf01" >/dev/null
python3 tools/compare_oracle.py /tmp/verify_sf01 "$SF" 90

echo "== building 1k-doc slice =="
mkdir -p "$SLICE"
for t in region nation customer supplier part orders lineitem events embeddings; do
  ln -sf "$SF/$t.parquet" "$SLICE/$t.parquet"
done
python3 - "$SF" "$SLICE" <<'EOF'
import sys, duckdb
sf, sl = sys.argv[1], sys.argv[2]
duckdb.connect().execute(
    f"COPY (SELECT * FROM '{sf}/documents.parquet' WHERE doc_id % 5 = 2) "
    f"TO '{sl}/documents.parquet' (FORMAT PARQUET)")
EOF

echo "== quadratic-oracle queries on the slice =="
sbt -batch "runMain graft.Verify $SLICE /tmp/verify_slice" >/dev/null
python3 tools/compare_oracle.py /tmp/verify_slice "$SLICE" 1800 "$QUAD"
