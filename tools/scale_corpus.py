#!/usr/bin/env python3
"""Build the 10x scaled corpus used by SCALING.md's probes.

Usage: python3 tools/scale_corpus.py [srcDir] [dstDir] [replicas]
       (defaults: /root/testdata/sf0.1 /tmp/sf1x10 10)

documents: replicated with ids shifted by r*10^7; replicas r>0 get two
replica-specific token substitutions so cross-replica text pairs fall
BELOW the 0.8 jaccard near-dup threshold — near-dup structure grows
linearly with corpus size (as in a real crawl), not quadratically as
naive cloning would force. embeddings: small replica-specific affine
perturbation for the same reason. All other fixture tables are copied
unchanged so the full Bench registry still runs against the directory.
"""
import sys, shutil
import duckdb

def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1x10"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
    copy (
      select doc_id + r*10000000 as doc_id,
             case when r = 0 then text
                  else replace(replace(text, 'the', 'the'||r), 'and', 'and'||r)
             end as text,
             lang, source, n_chars
      from read_parquet('{src}/documents.parquet'), range({n}) t(r)
    ) to '{dst}/documents.parquet' (format parquet)
    """)
    con.execute(f"""
    copy (
      select vec_id + r*10000000 as vec_id,
             list_transform(embedding,
               x -> cast(x * (1 + 0.003*r) + 0.001*r as float)) as embedding,
             label
      from read_parquet('{src}/embeddings.parquet'), range({n}) t(r)
    ) to '{dst}/embeddings.parquet' (format parquet)
    """)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"]:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    d = con.execute(f"select count(*), count(distinct doc_id) from read_parquet('{dst}/documents.parquet')").fetchone()
    e = con.execute(f"select count(*), count(distinct vec_id) from read_parquet('{dst}/embeddings.parquet')").fetchone()
    print(f"documents: {d}, embeddings: {e} -> {dst}")

if __name__ == "__main__":
    main()
