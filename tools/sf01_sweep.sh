#!/usr/bin/env bash
# Full sf0.1 oracle sweep, including the quadratic-oracle passes.
#
# The driver's correctness gate runs at sf0.01; this reproduces the
# builder's 10x-scale evidence:
#   1. every query vs DuckDB at full sf0.1 (90 s per-oracle timeout —
#      the all-pairs n-gram oracles are DuckDB-quadratic and time out
#      there; the engine side runs them in seconds);
#   2. round-11 ceiling probe result: q18/q44/q57 verify at the FULL
#      5000-doc table within a 2400 s per-oracle budget (measured
#      2026-08-14: 3/5 full-table green), so they run full-table here;
#   3. q33/q75/q128/q141: DuckDB's recursive-CTE closure exceeds 2400 s
#      at 5000 docs, so they verify full-table against tools/closure_oracle.py
#      — the SAME DuckDB pair set (the q18-verified face) with only
#      the closure step replaced by an independent union-find (the
#      q16 trusted-local-implementation rule). Replaces the r11
#      3500-doc slice: zero slice caveats left.
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.1}
QUAD_FULL=q18_neardup_lsh,q44_jaccard_neardup,q57_decontaminate,q131_incr_neardup,q150_neardup_tombstone,q154_streaming_neardup

echo "== full $SF sweep =="
sbt -batch "runMain graft.Verify $SF /tmp/verify_sf01" >/dev/null
python3 tools/compare_oracle.py /tmp/verify_sf01 "$SF" 90

echo "== full-table quadratic oracles (q18/q44/q57/q131/q150/q154, 2400 s budget) =="
python3 tools/compare_oracle.py /tmp/verify_sf01 "$SF" 2400 "$QUAD_FULL"

echo "== q33/q75/q128/q141 full-table closure oracle (union-find over the verified pair set) =="
python3 tools/closure_oracle.py /tmp/verify_sf01 "$SF"
