#!/usr/bin/env python3
"""Generate an sf1 dataset (10x of sf0.1) for the cross-SF scaling run
(round-12 verdict task 5).

The driver's generator only ships sf0.001/0.01/0.1, so sf1 is derived
by replicating the sf0.1 FACT tables 10x with shifted keys; dimension
tables copy verbatim (TPC-H dims scale sub-linearly and every foreign
key stays in-range). Per-table choices that keep the measurement
honest:

- orders/lineitem: orderkeys shift by k*10_000_000 per replica (join
  preserved replica-locally, keys unique globally); all other columns
  verbatim, so distributions and group cardinalities scale linearly.
- events: event_id shifts; user_id and ts stay UNCHANGED so the
  designed q76/q77 hot-key skew GROWS with the data - that is the
  scenario salting exists for, and shifting user_ids would quietly
  parallelize the unsalted worst case away.
- documents: replicas must NOT be near-duplicates of each other or of
  the original (identical/suffixed texts would make LSH candidate
  pairs grow ~quadratically in the replica count - a generator
  artifact, not an engine property, poisoning the linearity reading).
  Every 5th word (offset = replica index mod 5) gets a "~k" tag, so
  every 5-shingle window differs across replicas: cross-replica
  Jaccard is 0 and the near-dup structure WITHIN each replica mirrors
  sf0.1's, scaling pair counts linearly.
- embeddings: vec_id shifts; replica k>0 vectors get a deterministic
  per-replica ORTHOGONAL transform (coordinate rotation by 7k mod d,
  then a (dim, k)-keyed sign-flip pattern). Orthogonal maps preserve
  every WITHIN-replica cosine exactly, so each replica's near-dup and
  cluster structure mirrors sf0.1's and candidate-pair counts scale
  linearly; ACROSS replicas the transformed vectors scatter (a rotated
  copy is not a near-duplicate of its original), so the embedding-dedup
  and ANN family (q45/q91/q99/q100) measures honestly at sf1 —
  round 12's verbatim replication made replicas exact duplicates and
  had to exclude those queries by construction (round-12 verdict
  task 6 closes that).

Usage: gen_sf1.py [src=/root/testdata/sf0.1] [dst=/tmp/graft_sf1]
"""
import shutil
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

REPL = 10


def main(src, dst):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part"]:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    con.execute(f"""
COPY (
  SELECT o_orderkey + r.k*10000000 AS o_orderkey, o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM '{src}/orders.parquet', (SELECT unnest(range({REPL})) AS k) r
) TO '{dst}/orders.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
COPY (
  SELECT l_orderkey + r.k*10000000 AS l_orderkey, l_partkey, l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{src}/lineitem.parquet', (SELECT unnest(range({REPL})) AS k) r
) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
COPY (
  SELECT event_id + r.k*10000000 AS event_id, ts, user_id, event_type,
         value, props
  FROM '{src}/events.parquet', (SELECT unnest(range({REPL})) AS k) r
) TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    etbl = pq.read_table(f"{src}/embeddings.parquet")
    erows = etbl.to_pylist()

    # per-replica sign pattern, keyed JOINTLY by (dim, k): the old
    # k*40503 term was divisible by 3, so it vanished mod 3 and every
    # replica shared ONE pattern — replicas then differed only by
    # rotation, and rotation-invariant vectors became exact
    # cross-replica duplicates, partially re-introducing the
    # quadratic-pair artifact this transform exists to remove
    # (round-13 ADVICE). 40507 is prime (and not divisible by 3).
    def signs(k, d):
        return tuple(((i + 1) * 2654435761 + k * 40507) % 3 == 0
                     for i in range(d))

    # no two replica transforms may coincide (and none may be the
    # identity), or the affected replicas are verbatim copies of each
    # other and cross-replica pairs grow quadratically again
    dset = {len(row["embedding"]) for row in erows}
    for d in dset:
        seen = {(0, tuple([False] * d))}  # k=0 keeps the identity
        for k in range(1, REPL):
            t = ((7 * k) % d, signs(k, d))
            assert t not in seen, \
                f"replica transform collision at k={k}, d={d}: {t[0]}"
            seen.add(t)

    eout = []
    for k in range(REPL):
        for row in erows:
            r = dict(row)
            r["vec_id"] = row["vec_id"] + k * 1000000
            if k > 0:
                v = list(row["embedding"])
                d = len(v)
                rot = (7 * k) % d
                v = v[rot:] + v[:rot]
                sg = signs(k, d)
                v = [-x if sg[i] else x for i, x in enumerate(v)]
                r["embedding"] = v
            eout.append(r)
    pq.write_table(pa.Table.from_pylist(eout, schema=etbl.schema),
                   f"{dst}/embeddings.parquet")

    tbl = pq.read_table(f"{src}/documents.parquet")
    rows = tbl.to_pylist()
    out = []
    for k in range(REPL):
        for row in rows:
            r = dict(row)
            r["doc_id"] = row["doc_id"] + k * 1000000
            if k > 0:
                ws = row["text"].split(" ")
                off = k % 5
                ws = [w + f"~{k}" if i % 5 == off else w
                      for i, w in enumerate(ws)]
                r["text"] = " ".join(ws)
                r["n_chars"] = len(r["text"])
            out.append(r)
    pq.write_table(pa.Table.from_pylist(out, schema=tbl.schema),
                   f"{dst}/documents.parquet")
    for t in ["orders", "lineitem", "events", "documents", "embeddings"]:
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
    import os
    os.makedirs(dst, exist_ok=True)
    main(src, dst)
