#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate: run each oracle SQL
in DuckDB over the testdata parquet, load the Spark parquet written by
graft.Verify, sort columns by name + rows, and compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, glob, json, math
import duckdb
import pyarrow.parquet as pq

def canon(rows, cols):
    # sort columns by name, then rows lexicographically (None-safe)
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in idx))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t)), \
        [cols[i] for i in idx]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = p.split("/")[-1].removesuffix(".parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only is not None and name not in only:
            continue
        sql = oracles[name]
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        st = pq.read_table(spark_files[0])
        s_rows, s_cols = canon([list(r.values()) for r in st.to_pylist()],
                               list(st.column_names))
        try:
            res = con.execute(sql)
            d_cols = [c[0] for c in res.description]
            d_rows, d_cols = canon(res.fetchall(), d_cols)
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {ex}")
            n_fail += 1
            continue
        if s_cols != d_cols:
            print(f"FAIL {name}: cols spark={s_cols} duckdb={d_cols}")
            n_fail += 1
        elif len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duckdb={len(d_rows)}")
            n_fail += 1
        elif s_rows != d_rows:
            bad = sum(1 for a, b in zip(s_rows, d_rows) if a != b)
            print(f"FAIL {name}: {bad}/{len(s_rows)} rows differ; first:")
            for a, b in zip(s_rows, d_rows):
                if a != b:
                    print(f"  spark : {a}\n  duckdb: {b}")
                    break
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    # rows-only entries (no oracle)
    for d in sorted(glob.glob(f"{out_dir}/q*")):
        name = d.split("/")[-1]
        if name not in oracles:
            files = glob.glob(f"{d}/*.parquet")
            n = pq.read_metadata(files[0]).num_rows if files else -1
            print(f"ROWS {name}: {n}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

main()
