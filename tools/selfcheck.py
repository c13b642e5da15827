#!/usr/bin/env python3
"""Dev-only self-check mimicking the driver's DuckDB oracle compare:
runs each oracle_sql.json query in DuckDB over the sf parquet tables and
compares (schema-insensitively: columns sorted by name, rows sorted,
values rounded-string) against the Spark parquet dumped by graft.Verify."""
import sys, json, glob, math
import duckdb, pyarrow as pa, pyarrow.parquet as pq

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

def norm_type(t):
    """Normalize an arrow type to the equivalence class the driver's typed
    hash effectively distinguishes. All int widths -> int64 (Spark/DuckDB
    agree on value bits); any DECIMAL is an error marker: DuckDB window/agg
    sums of ints return HUGEINT -> arrow decimal128, which hash-mismatches
    Spark's int64 even when values are bit-identical (the 3-round-old
    q_sessionize red). Oracles must CAST such outputs to BIGINT."""
    if pa.types.is_integer(t): return "int64"
    if pa.types.is_decimal(t): return "DECIMAL!"
    if pa.types.is_floating(t): return "float64"
    if pa.types.is_timestamp(t): return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{norm_type(t.value_type)}>"
    return str(t)

fail = 0
for name, sql in sorted(oracle.items()):
    try:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        t = pq.read_table(files[0]) if files else None
        if t is None:
            print(f"[MISS ] {name}: no spark output"); fail += 1; continue
        scols, srows = canon(t.column_names, [list(r) for r in zip(*[c.to_pylist() for c in t.columns])] if t.num_rows else [])
        d = con.sql(sql)
        # ONE execution: fetch arrow, derive both the type map and the rows
        # from it (relations are lazy — .arrow() then .fetchall() would run
        # every oracle twice, ~2x wall on the 16 s minhash oracle)
        darrow = d.arrow()
        drows_raw = [list(r) for r in zip(*[c.to_pylist() for c in darrow.columns])] if darrow.num_rows else []
        dcols, drows = canon(darrow.column_names, drows_raw)
        if scols != dcols:
            print(f"[SCHEMA] {name}: spark={scols} duck={dcols}"); fail += 1; continue
        stypes = {f.name: norm_type(f.type) for f in t.schema}
        dtypes = {f.name: norm_type(f.type) for f in darrow.schema}
        tdiff = sorted(c for c in stypes
                       if "DECIMAL" in dtypes.get(c, "") or "DECIMAL" in stypes[c]
                       or stypes[c] != dtypes.get(c))
        if tdiff:
            print(f"[TYPE ] {name}: " + "; ".join(
                f"{c}: spark={stypes[c]} duck={dtypes.get(c)}" for c in tdiff))
            fail += 1; continue
        if srows != drows:
            diff = [(a,b) for a,b in zip(srows,drows) if a!=b][:3]
            print(f"[ROWS ] {name}: spark={len(srows)} duck={len(drows)} first-diffs={diff}"); fail += 1; continue
        print(f"[OK   ] {name}: {len(srows)} rows")
    except Exception as e:
        print(f"[ERR  ] {name}: {e}"); fail += 1
sys.exit(1 if fail else 0)
