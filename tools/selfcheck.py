#!/usr/bin/env python3
"""Dev-only self-check mimicking the driver's DuckDB oracle compare:
runs each oracle_sql.json query in DuckDB over the sf parquet tables and
compares (schema-insensitively: columns sorted by name, rows sorted,
values rounded-string) against the Spark parquet dumped by graft.Verify."""
import sys, json, glob, math, os
import duckdb, pyarrow as pa, pyarrow.parquet as pq

args = [a for a in sys.argv[1:] if not a.startswith("--")]
pyfold_on = "--pyfold" in sys.argv
sf_dir, out_dir = args[0], args[1]
con = duckdb.connect()
for tbl in ["region","nation","customer","supplier","part","orders",
            "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

# ---- --pyfold: large-scale path for the recursive-CTE oracles ----------
# The connected-components and greedy-pack recursive CTEs explode in DuckDB
# past sf0.01; at bigger scales Python re-implements ONLY those two folds,
# over NON-recursive SQL fragments (pyfold_sql.json) that share their CTE
# text with the real oracles. Without --pyfold the tool keeps mimicking the
# driver exactly (recursive SQL and all).
PACK_BUDGET = 200

def _union_find_minlabel(ids, edges):
    parent = {i: i for i in ids}
    def find(x):
        r = x
        while parent[r] != r: r = parent[r]
        while parent[x] != r: parent[x], x = r, parent[x]
        return r
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo  # root stays the MIN id of the component
    return {i: find(i) for i in ids}

def _pack_fold(prep_rows):
    """prep: (source, doc_id, ntok, shard) -> (source, doc_id, ntok, shard, bin)."""
    cells = {}
    for src, did, ntok, shard in prep_rows:
        cells.setdefault((src, shard), []).append((did, ntok))
    out = []
    for (src, shard), docs in cells.items():
        docs.sort()
        b, fill = 0, 0
        for did, ntok in docs:
            if fill > 0 and fill + ntok > PACK_BUDGET: b += 1; fill = ntok
            else: fill += ntok
            out.append((src, did, ntok, shard, b))
    return out

def _pyfold_expected(name, frags):
    """Arrow table equal to what the recursive oracle would return."""
    def rows(key):
        return con.sql(frags[key]).fetchall()
    if name == "q_dedup_clusters":
        ids = [r[0] for r in rows("q_dedup_clusters!docs")]
        lbl = _union_find_minlabel(ids, rows("q_dedup_clusters!edges"))
        return pa.table({"doc_id": ids, "cluster_id": [lbl[i] for i in ids]})
    if name == "q_cluster_reps":
        # Same corpus + edge CTE text as q_dedup_clusters; the fold adds a
        # quality-argmax (max q, min id tiebreak) + member count per label.
        ids = [r[0] for r in rows("q_dedup_clusters!docs")]
        lbl = _union_find_minlabel(ids, rows("q_dedup_clusters!edges"))
        q = dict(rows("q_cluster_reps!quality"))
        best, members = {}, {}
        for i in ids:
            c = lbl[i]
            members[c] = members.get(c, 0) + 1
            if c not in best or (-q[i], i) < best[c]:
                best[c] = (-q[i], i)
        cl = sorted(best)
        return pa.table({"cluster_id": cl,
                         "rep_id": [best[c][1] for c in cl],
                         "rep_quality": [-best[c][0] for c in cl],
                         "n_members": [members[c] for c in cl]})
    if name == "q_cluster_split":
        ids = [r[0] for r in rows("q_dedup_clusters!docs")]
        lbl = _union_find_minlabel(ids, rows("q_dedup_clusters!edges"))
        con.register("pyclu", pa.table({"doc_id": ids,
                                        "cluster_id": [lbl[i] for i in ids]}))
        return con.sql(frags["q_cluster_split!out"]).arrow()
    if name in ("q_pack_bins", "q_pack_stats"):
        packed = _pack_fold(rows("q_pack_bins!prep"))
        if name == "q_pack_bins":
            packed.sort(key=lambda r: (r[0], r[1]))
            return pa.table({"source": [r[0] for r in packed],
                             "doc_id": [r[1] for r in packed],
                             "n_tokens": [r[2] for r in packed],
                             "shard_id": [r[3] for r in packed],
                             "bin_id": [r[4] for r in packed]})
        agg = {}
        for src, _did, ntok, shard, b in packed:
            n, used = agg.get((src, shard, b), (0, 0))
            agg[(src, shard, b)] = (n + 1, used + ntok)
        keys = sorted(agg)
        return pa.table({"source": [k[0] for k in keys],
                         "shard_id": [k[1] for k in keys],
                         "bin_id": [k[2] for k in keys],
                         "n_docs": [agg[k][0] for k in keys],
                         "used": [agg[k][1] for k in keys],
                         "fill_frac": [round(min(agg[k][1], PACK_BUDGET) / PACK_BUDGET, 4)
                                       for k in keys]})
    if name == "q_curation_funnel":
        # Materialize the triple-regex PII scrub ONCE (it dominated the
        # sf0.1 wall time when each of the five funnel fragments re-ran
        # it); the other fragments select from this temp table.
        con.sql("CREATE OR REPLACE TEMP TABLE pyscr AS "
                + frags["q_curation_funnel!scr"])
        s2 = [r[0] for r in rows("q_curation_funnel!s2rows")]
        lbl = _union_find_minlabel(s2, rows("q_curation_funnel!edges"))
        reps = sorted(i for i in s2 if lbl[i] == i)
        con.register("pyreps", pa.table({"doc_id": reps}))
        stages = rows("q_curation_funnel!stages012") + rows("q_curation_funnel!stages345")
        packed = _pack_fold(rows("q_curation_funnel!s5prep"))
        bins = {(r[0], r[3], r[4]) for r in packed}
        stages.append((6, "packed_bins", len(bins), sum(r[2] for r in packed)))
        stages.sort()
        return pa.table({"stage_idx": [int(s[0]) for s in stages],
                         "stage": [s[1] for s in stages],
                         "n_docs": [int(s[2]) for s in stages],
                         "n_tokens": [int(s[3]) for s in stages]})
    raise KeyError(name)

pyfold_frags = {}
if pyfold_on:
    pf = f"{out_dir}/pyfold_sql.json"
    if not os.path.exists(pf):
        print("[ERR  ] --pyfold requested but pyfold_sql.json missing"); sys.exit(1)
    pyfold_frags = json.load(open(pf))
PYFOLD_QUERIES = {"q_dedup_clusters", "q_cluster_reps", "q_cluster_split", "q_pack_bins",
                  "q_pack_stats", "q_curation_funnel"}

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
        if pyfold_on and name in PYFOLD_QUERIES:
            darrow = _pyfold_expected(name, pyfold_frags)
        else:
            d = con.sql(sql)
            # ONE execution: fetch arrow, derive both the type map and the
            # rows from it (relations are lazy — .arrow() then .fetchall()
            # would run every oracle twice, ~2x wall on the minhash oracle)
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
