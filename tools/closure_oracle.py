#!/usr/bin/env python3
"""Full-table closure oracle for q33_components / q75_neardup_winners
/ q128_leakfree_split / q141_split_from_index.

DuckDB's recursive-CTE transitive closure cannot finish the 5000-doc
sf0.1 documents table inside a 2400 s budget, but the PAIR set feeding
it is the same all-pairs exact-Jaccard face that q18_neardup_lsh
verifies full-table. This tool recomputes that pair set in DuckDB
(the non-recursive prefix of the q33/q75 oracles, verbatim) and
replaces ONLY the closure step with an independent union-find (the
q16 rule: a trusted local implementation, like q95's FastCDC oracle),
then compares the engine outputs row-for-row.

Usage: closure_oracle.py <verify_out_dir> <sf_dir>
  expects <verify_out_dir>/q33_components/*.parquet and/or
          <verify_out_dir>/q75_neardup_winners/*.parquet
  (written by `sbt "runMain graft.Verify <sf_dir> <verify_out_dir>"`).
Exit code 0 iff every present query matches.
"""
import os
import sys

import duckdb

# the non-recursive prefix of the q33/q75 oracle SQL, verbatim
# (threshold 0.8, word-3-gram shingles, round-6 Jaccard)
PAIR_SQL = """
WITH w AS (SELECT doc_id, list_filter(string_split_regex(lower(
             regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g')), ' '),
             x -> x <> '') AS t FROM documents),
sh AS (SELECT doc_id,
         list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                        for i in range(1, len(t) - 1)]) AS s
       FROM w),
pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
         CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) AS j
       FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
SELECT id_a, id_b FROM pr WHERE round(j, 6) >= 0.8
"""


class UnionFind:
    def __init__(self):
        self.parent = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = self.parent.setdefault(p, p)
            x = self.parent[x]
            p = self.parent[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[ra] = rb


def main():
    vdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sfdir}/documents.parquet'")
    print("computing the full-table pair set (the q18-verified face)...",
          flush=True)
    pairs = con.execute(PAIR_SQL).fetchall()
    print(f"  {len(pairs)} pairs", flush=True)

    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    # component label = min member id (the q33 cluster convention)
    members = {}
    for x in uf.parent:
        members.setdefault(uf.find(x), []).append(x)
    label = {}
    for root, ms in members.items():
        lo = min(ms)
        for m in ms:
            label[m] = lo

    ok = True

    q33_dir = os.path.join(vdir, "q33_components")
    if os.path.isdir(q33_dir):
        got = sorted(con.execute(
            f"SELECT id, cluster FROM '{q33_dir}/*.parquet'").fetchall())
        want = sorted((i, label[i]) for i in label)
        if got == want:
            print(f"q33_components        OK rows={len(got)} (full table)")
        else:
            ok = False
            diff = set(got) ^ set(want)
            print(f"q33_components        MISMATCH got={len(got)} "
                  f"want={len(want)} diff={sorted(diff)[:10]}")

    # q128 (from raw text) and q141 (from the at-rest signature index)
    # share one output contract: (doc_id, cluster, split) with cluster
    # = union-find label (singleton fill) and split = the shared md5
    # bucket arithmetic over the CLUSTER id — computed here in DuckDB
    # over the union-find labels so the hash definition stays the one
    # the q128 oracle SQL states
    split_want = None
    for qname in ("q128_leakfree_split", "q141_split_from_index"):
        q_dir = os.path.join(vdir, qname)
        if not os.path.isdir(q_dir):
            continue
        if split_want is None:
            all_ids = [r[0] for r in con.execute(
                "SELECT doc_id FROM documents").fetchall()]
            con.execute(
                "CREATE TEMP TABLE uf (doc_id BIGINT, cluster BIGINT)")
            con.executemany("INSERT INTO uf VALUES (?, ?)",
                            [(i, label.get(i, i)) for i in all_ids])
            split_want = sorted(con.execute(
                """SELECT doc_id, cluster,
                     CASE WHEN bk < 80 THEN 'train'
                          WHEN bk < 90 THEN 'val' ELSE 'test' END
                   FROM (SELECT doc_id, cluster,
                           CAST(md5_number_lower('13:' || CAST(cluster AS VARCHAR))
                                % 4611686018427387904 AS BIGINT) % 100 AS bk
                         FROM uf)""").fetchall())
        got = sorted(con.execute(
            f"SELECT doc_id, cluster, split FROM '{q_dir}/*.parquet'"
        ).fetchall())
        if got == split_want:
            print(f"{qname:<21} OK rows={len(got)} (full table)")
        else:
            ok = False
            diff = set(got) ^ set(split_want)
            print(f"{qname:<21} MISMATCH got={len(got)} "
                  f"want={len(split_want)} diff={sorted(diff)[:10]}")

    # q75 (from raw text) and q142 (from the at-rest signature index)
    # share one survivor contract: ids that are their own component
    # minimum (or in no pair)
    for qname in ("q75_neardup_winners", "q142_winners_from_index"):
        q_dir = os.path.join(vdir, qname)
        if not os.path.isdir(q_dir):
            continue
        got = sorted(r[0] for r in con.execute(
            f"SELECT doc_id FROM '{q_dir}/*.parquet'").fetchall())
        all_ids = [r[0] for r in con.execute(
            "SELECT doc_id FROM documents").fetchall()]
        want = sorted(i for i in all_ids if label.get(i, i) >= i)
        if got == want:
            print(f"{qname:<21} OK rows={len(got)} (full table)")
        else:
            ok = False
            diff = set(got) ^ set(want)
            print(f"{qname:<21} MISMATCH got={len(got)} "
                  f"want={len(want)} diff={sorted(diff)[:10]}")

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
