#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify output
against DuckDB oracle SQL and diff. Usage:
    python3 tools/check_oracle.py <sfDir> <outDir>
Builder-side debugging tool only; not part of the library.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        # driver semantics: sort columns by name, then compare values
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        grows = [tuple(norm(v) for v in r) for r in got.itertuples(index=False)]
        wrows = [tuple(norm(v) for v in r) for r in want.itertuples(index=False)]
        # compare both as-ordered and sorted (driver's exact row handling unknown;
        # we require BOTH to pass to be safe)
        mism = sum(1 for a, b in zip(grows, wrows) if a != b)
        mism_sorted = sum(1 for a, b in zip(sorted(map(repr, grows)),
                                            sorted(map(repr, wrows))) if a != b)
        if mism == 0 and mism_sorted == 0:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {mism} ordered / {mism_sorted} sorted mismatching rows of {len(got)}")
            for a, b in list(zip(grows, wrows))[:200]:
                if a != b:
                    print(f"   spark: {a}")
                    print(f"   duck : {b}")
                    break
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
