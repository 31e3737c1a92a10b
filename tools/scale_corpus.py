#!/usr/bin/env python3
"""Build the 10x scaled corpus used by SCALING.md's probes.

Usage: python3 tools/scale_corpus.py [srcDir] [dstDir] [replicas] [tables]
       (defaults: /root/testdata/sf0.1 /tmp/sf1x10 10 all-tables;
        tables = comma list to restrict, e.g. lineitem,orders,events —
        the 1000x relational probe skips the 20 GB of embeddings it
        would never read)

documents: replicated with ids shifted by r*10^7; replicas r>0 get two
replica-specific token substitutions so cross-replica text pairs fall
BELOW the 0.8 jaccard near-dup threshold — near-dup structure grows
linearly with corpus size (as in a real crawl), not quadratically as
naive cloning would force. embeddings: small replica-specific affine
perturbation for the same reason.

Relational tables (round-11 addition): customer/supplier/part/orders/
lineitem/events replicate with EVERY key column shifted by r*10^7 in
lockstep (custkey, suppkey, partkey, orderkey, event_id, user_id), so
each replica is a self-contained TPC-H-ish world: per-key join fan-out
and per-user event-session shape are constant while table sizes grow
Nx — the same "more customers, not bigger customers" scaling TPC-H
itself uses. nation/region stay fixed (as in TPC-H at every SF).
"""
import sys, shutil
import duckdb

def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1x10"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    import os
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    def want(t):
        return only is None or t in only
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    if want("documents"):
        # Replica texts must fall below the LSH *candidate* floor
        # (~0.35 jaccard for 2-row bands), not just the 0.8 verify
        # threshold. The old recipe (two token substitutions) left
        # cross-replica jaccard at ~0.91 for docs poor in 'the'/'and' —
        # every base doc became a TRUE near-dup clique of n replicas and
        # pair counts grew quadratically (found by the round-13 1000x
        # probe: billions of real pairs, "No space left on device").
        # Tag ~half the words per replica, keyed on the WORD ITSELF
        # (hash(w) % 2), so any within-replica pair structure is
        # preserved exactly (both members transform identically) while
        # a cross-replica 3-shingle survives only if all 3 words are
        # untagged: (1/2)^3 = 12.5% shared shingles, jaccard ~= 0.07.
        con.execute(f"""
        copy (
          select doc_id + r*10000000 as doc_id,
                 case when r = 0 then text
                      else array_to_string(list_transform(
                        string_split(text, ' '),
                        w -> case when hash(w) % 2 = 0 then w || r else w end
                      ), ' ')
                 end as text,
                 lang, source, n_chars
          from read_parquet('{src}/documents.parquet'), range({n}) t(r)
        ) to '{dst}/documents.parquet' (format parquet)
        """)
    if want("embeddings"):
        con.execute(f"""
        copy (
          select vec_id + r*10000000 as vec_id,
                 list_transform(embedding,
                   x -> cast(x * (1 + 0.003*r) + 0.001*r as float)) as embedding,
                 label
          from read_parquet('{src}/embeddings.parquet'), range({n}) t(r)
        ) to '{dst}/embeddings.parquet' (format parquet)
        """)
    for t in ["region", "nation"]:
        if want(t):
            shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    # keyed replication: shift every key column by r*10^7 in lockstep so
    # each replica is a self-contained join world (constant fan-out per key)
    S = 10_000_000
    keyed = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part":     ["p_partkey"],
        "orders":   ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events":   ["event_id", "user_id"],
    }
    for t, keys in keyed.items():
        if not want(t):
            continue
        cols = [c[0] for c in con.execute(
            f"describe select * from read_parquet('{src}/{t}.parquet')").fetchall()]
        sel = ", ".join(
            f"{c} + r*{S} as {c}" if c in keys else c for c in cols)
        con.execute(f"""
        copy (
          select {sel}
          from read_parquet('{src}/{t}.parquet'), range({n}) t(r)
        ) to '{dst}/{t}.parquet' (format parquet)
        """)
    d = con.execute(f"select count(*), count(distinct doc_id) from read_parquet('{dst}/documents.parquet')").fetchone() if want("documents") else None
    e = con.execute(f"select count(*), count(distinct vec_id) from read_parquet('{dst}/embeddings.parquet')").fetchone() if want("embeddings") else None
    li = con.execute(f"select count(*), count(distinct l_orderkey) from read_parquet('{dst}/lineitem.parquet')").fetchone() if want("lineitem") else None
    print(f"documents: {d}, embeddings: {e}, lineitem: {li} -> {dst}")

if __name__ == "__main__":
    main()
