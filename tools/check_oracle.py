#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB against
views over <sfDir>/*.parquet, loads the Spark result parquet from
<verifyOutDir>/<name>/, and compares: row count, column names (sorted),
and a hash over the value matrix with columns sorted by name and rows
sorted lexicographically. Mirrors the driver contract described in the
builder prompt ("sorts columns by name before hashing values").
"""
import sys, json, glob, os, hashlib
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for row in mat:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        tbl = pq.read_table(spark_dir)
        s_cols = list(tbl.column_names)
        s_rows = [tuple(row[c] for c in s_cols) for row in tbl.to_pylist()]
        try:
            res = con.execute(sql)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        # Arrow-level type lint: fetchall() folds HUGEINT/DECIMAL into
        # Python ints, but the driver's compare does not — an oracle
        # column that is not plain int/float/string/bool/date at the
        # arrow layer (e.g. an un-cast window SUM → decimal128) can
        # hash-mismatch driver-side while passing here. Lint-only: its
        # own try, so an arrow conversion hiccup can never turn a
        # passing query into a FAIL (re-executes the SQL; fine at
        # sf0.01 — do not fold into the comparison fetch, whose value
        # types must stay fetchall's).
        try:
            import pyarrow as pa
            for f in con.execute(sql).arrow().schema:
                t = f.type
                ok = (pa.types.is_integer(t) or pa.types.is_floating(t)
                      or pa.types.is_string(t) or pa.types.is_large_string(t)
                      or pa.types.is_boolean(t) or pa.types.is_temporal(t)
                      or pa.types.is_list(t) or pa.types.is_large_list(t))
                if not ok:
                    print(f"TYPEWARN {name}: oracle column '{f.name}' is "
                          f"{t} at the arrow layer — CAST it in the SQL "
                          f"(driver compare may render it differently)")
        except Exception as e:
            print(f"TYPEWARN {name}: arrow type lint skipped: {e}")
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rows spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            hs, hd = table_hash(s_cols, s_rows), table_hash(d_cols, d_rows)
            if hs != hd:
                problems.append("hash mismatch")
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                ms = sorted(tuple(norm_cell(r[i]) for i in order_s) for r in s_rows)
                md = sorted(tuple(norm_cell(r[i]) for i in order_d) for r in d_rows)
                for i, (a, b) in enumerate(zip(ms, md)):
                    if a != b:
                        problems.append(f"first diff row {i}: spark={a} duck={b}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
