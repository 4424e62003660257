#!/usr/bin/env python3
"""Generate an on-disk sf1-equivalent fixture (10x the sf0.1 corpus) so
Verify/Bench can run END-TO-END at 10x scale — the r10 verdict's gap #8:
ScaleProbe's in-memory inflation probes per-family cost curves but cannot
catch whole-query memory cliffs the way a real parquet dir can.

Inflation scheme mirrors graft.tools.ScaleProbe so the near-dup spectrum
stays realistic (copies are NEAR- but never exact duplicates):
 - documents: 10 copies per doc; doc_id' = doc_id*10 + copy (dense — the
   perturbed-corpus queries add 1_000_000 to doc_ids, and max inflated id
   stays far below that); text gets a 'c<copy> ' head tag + vowel-alphabet
   rotation by copy%5 (template-family near-dups, not exact-dup cliques).
 - embeddings: 10 copies per vector; vec_id' = vec_id*10 + copy;
   components rotated by copy%8 (stays unit-norm, decorrelates copies).
 - relational tables + events: copied verbatim (the heavy families under
   study are text/dedup/ANN; the oracle reads the same files either way).

Row groups are written SMALL (1-2k rows) on purpose: Spark's scan
parallelism comes from file splits, and splits cannot subdivide a row
group — a single-row-group 20 MB embeddings file put the whole
broadcast-KNN fan-out (20k queries x 20k vectors = 400M scored rows)
into ONE task (observed: minutes of single-threaded spill-sort). Real
tables at 100 TB have thousands of row groups; a synthetic fixture must
too, or it measures the file layout instead of the engine.

Usage: python3 scripts/gen_sf1.py [src_sf_dir] [out_dir]
Defaults: /root/testdata/sf0.1 -> /root/repo/testdata_sf1
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1"

VERBATIM = ["region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "events"]

ROTS = ["aeiou", "eioua", "iouae", "ouaei", "uaeio"]


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in VERBATIM:
        con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 10000)")
        print(f"[gen_sf1] {t}: copied verbatim")

    rot_case = " ".join(
        f"WHEN {i} THEN translate(t0, 'aeiou', '{ROTS[i]}')"
        for i in range(5))
    con.sql(f"""
      COPY (
        SELECT doc_id * 10 + copy AS doc_id,
               CASE copy % 5 {rot_case} END AS text,
               lang, source,
               length(CASE copy % 5 {rot_case} END) AS n_chars
        FROM (
          SELECT d.doc_id,
                 concat('c', CAST(c.copy AS VARCHAR), ' ', d.text) AS t0,
                 d.lang, d.source, c.copy
          FROM '{SRC}/documents.parquet' d
          CROSS JOIN (SELECT unnest(range(0, 10)) AS copy) c)
      ) TO '{OUT}/documents.parquet'
        (FORMAT PARQUET, ROW_GROUP_SIZE 500)""")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/documents.parquet'").fetchone()[0]
    print(f"[gen_sf1] documents: {n} rows (10x)")

    # component rotation by copy%8: list slice concat, FLOAT preserved
    con.sql(f"""
      COPY (
        SELECT e.vec_id * 10 + c.copy AS vec_id,
               CAST(list_concat(
                 e.embedding[(c.copy % 8 + 1):64],
                 e.embedding[1:(c.copy % 8)]) AS FLOAT[]) AS embedding,
               e.label
        FROM '{SRC}/embeddings.parquet' e
        CROSS JOIN (SELECT unnest(range(0, 10)) AS copy) c
      ) TO '{OUT}/embeddings.parquet'
        (FORMAT PARQUET, ROW_GROUP_SIZE 500)""")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/embeddings.parquet'").fetchone()[0]
    d = con.sql(f"SELECT len(embedding) FROM '{OUT}/embeddings.parquet' LIMIT 1").fetchone()[0]
    print(f"[gen_sf1] embeddings: {n} rows (10x), dim {d}")

    # DuckDB floors parquet ROW_GROUP_SIZE at ~2048 rows; rewrite the
    # two fan-out-heavy tables with pyarrow to get genuinely small row
    # groups (splits cannot subdivide a row group, so group count is the
    # hard ceiling on scan parallelism for these small-byte files).
    import pyarrow.parquet as pq
    for t, rg in [("documents", 500), ("embeddings", 500)]:
        path = f"{OUT}/{t}.parquet"
        tbl = pq.read_table(path)
        pq.write_table(tbl, path, row_group_size=rg)
        print(f"[gen_sf1] {t}: rewritten, "
              f"{pq.ParquetFile(path).num_row_groups} row groups")


if __name__ == "__main__":
    main()
