#!/usr/bin/env python3
"""Dev-only self-check mimicking the driver's DuckDB oracle compare:
runs each oracle_sql.json query in DuckDB over the sf parquet tables and
compares (schema-insensitively: columns sorted by name, rows sorted,
values rounded-string) against the Spark parquet dumped by graft.Verify."""
import sys, json, glob, math
import duckdb, pyarrow.parquet as pq

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for tbl in ["region","nation","customer","supplier","part","orders",
            "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                # driver-precision compare: shortest-roundtrip repr, NOT %.6g
                # (%.6g hid a 4th-decimal divergence on values >= 100 in r2)
                if math.isnan(v): v = "NaN"
                else: v = repr(v)
            vals.append(str(v))
        out.append(tuple(vals))
    return [cols[i] for i in idx], sorted(out)

fail = 0
for name, sql in sorted(oracle.items()):
    try:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        t = pq.read_table(files[0]) if files else None
        if t is None:
            print(f"[MISS ] {name}: no spark output"); fail += 1; continue
        scols, srows = canon(t.column_names, [list(r) for r in zip(*[c.to_pylist() for c in t.columns])] if t.num_rows else [])
        d = con.sql(sql)
        dcols, drows = canon(d.columns, d.fetchall())
        if scols != dcols:
            print(f"[SCHEMA] {name}: spark={scols} duck={dcols}"); fail += 1; continue
        if srows != drows:
            diff = [(a,b) for a,b in zip(srows,drows) if a!=b][:3]
            print(f"[ROWS ] {name}: spark={len(srows)} duck={len(drows)} first-diffs={diff}"); fail += 1; continue
        print(f"[OK   ] {name}: {len(srows)} rows")
    except Exception as e:
        print(f"[ERR  ] {name}: {e}"); fail += 1
sys.exit(1 if fail else 0)
