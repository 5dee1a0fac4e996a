#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query output
parquet written by graft.Verify, run the corresponding oracle SQL in
DuckDB over the same sf-dir tables and compare (column names sorted,
rows as written, values normalised).

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json
import math
import sys

import duckdb


def normalise(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = f"{v:.9g}"
            elif isinstance(v, bytes):
                v = v.hex()
            vals.append(str(v))
        out.append("|".join(vals))
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            gdf = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            wdf = con.execute(sql).df()
            grows = list(gdf.itertuples(index=False, name=None))
            gcols = list(gdf.columns)
            wrows = list(wdf.itertuples(index=False, name=None))
            wcols = list(wdf.columns)
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(wcols):
            print(f"FAIL {name}: cols spark={sorted(gcols)} oracle={sorted(wcols)}")
            n_fail += 1
            continue
        # dtype-sensitive like the driver's pandas-hash compare: a DuckDB
        # HUGEINT (e.g. uncast sum()) lands as float64 and must NOT be
        # considered equal to Spark's int64 even when values agree.
        gk = {c: gdf[c].dtype.kind for c in gcols}
        wk = {c: wdf[c].dtype.kind for c in wcols}
        if gk != {c: wk[c] for c in gk}:
            diff = {c: (gk[c], wk[c]) for c in gk if gk[c] != wk[c]}
            print(f"FAIL {name}: dtype kinds spark-vs-oracle {diff}")
            n_fail += 1
            continue
        g = normalise(grows, gcols)
        w = normalise(wrows, wcols)
        if g == w:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(w)}")
            for i, (a, b) in enumerate(zip(g, w)):
                if a != b:
                    print(f"  first diff at row {i}:\n    spark : {a}\n    oracle: {b}")
                    break
            else:
                if len(g) != len(w):
                    k = min(len(g), len(w))
                    extra = g[k] if len(g) > len(w) else w[k]
                    print(f"  extra row at {k}: {extra}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
