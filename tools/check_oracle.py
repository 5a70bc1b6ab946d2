#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compares each
SparkEntry query parquet (written by graft.Verify) against its DuckDB
oracle SQL on the same sf dir. Usage (args auto-detected by content):
    python3 tools/check_oracle.py <verifyOutDir> <sfDir> [query...]
"""
import json, math, os, sys
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # tolerate last-ulp noise: 9 significant digits
        return f"{v:.9g}"
    if hasattr(v, "as_py"):
        v = v.as_py()
    return str(v)

def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out), [cols[i] for i in order]

def main():
    a, b = sys.argv[1], sys.argv[2]
    if os.path.exists(os.path.join(a, "oracle_sql.json")):
        out_dir, sf_dir = a, b
    else:
        sf_dir, out_dir = a, b
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = n_skip = 0
    for name, sql in oracles.items():
        if only and name not in only:
            continue
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            print(f"MISSING  {name}: no spark output")
            n_fail += 1
            continue
        try:
            tbl = pq.read_table(qdir)
            s_cols = [c.lower() for c in tbl.column_names]
            s_rows = [tuple(tbl.column(i)[j].as_py() for i in range(tbl.num_columns))
                      for j in range(tbl.num_rows)]
            res = con.execute(sql)
            d_cols = [d[0].lower() for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"ERROR    {name}: {str(e)[:200]}")
            n_fail += 1
            continue
        s_norm, s_c = norm_rows(s_cols, s_rows)
        d_norm, d_c = norm_rows(d_cols, d_rows)
        if s_c != d_c:
            print(f"SCHEMA   {name}: spark={s_c} duck={d_c}")
            n_fail += 1
        elif s_norm != d_norm:
            diffs = [(a, b) for a, b in zip(s_norm, d_norm) if a != b]
            extra = abs(len(s_norm) - len(d_norm))
            print(f"VALUES   {name}: rows spark={len(s_norm)} duck={len(d_norm)}; "
                  f"first diffs: {diffs[:3]}{' +sizediff' if extra else ''}")
            n_fail += 1
        else:
            print(f"OK       {name} ({len(s_norm)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
