#!/usr/bin/env python3
"""Local differential harness (SURVEY.md §5.2.1) — pre-driver t2.

Usage: python3 tools/diff.py <sfDir> <outDir> [query_name ...]

Mimics the driver's compare: for each entry in <outDir>/oracle_sql.json,
run the SQL in DuckDB against views over <sfDir>/*.parquet, load the
Spark parquet result from <outDir>/<name>/, sort columns by name, and
compare stringified values cell-by-cell in row order.
"""
import sys, os, json, glob, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Stringify a cell the strict way: exact repr, no float fuzz."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rows_of(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [cols[i] for i in order], [[canon(r[i]) for i in order] for r in rows]


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        t0 = time.time()
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output (query crashed in Verify?)")
            n_fail += 1
            continue
        try:
            scols, srows = rows_of(
                con, f"SELECT * FROM read_parquet({files!r})")
            ocols, orows = rows_of(con, oracle[name])
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns differ\n  spark : {scols}\n  oracle: {ocols}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: row count {len(srows)} vs oracle {len(orows)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, orows)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            i, a, b = bad
            diffs = [(c, x, y) for c, x, y in zip(scols, a, b) if x != y]
            print(f"FAIL {name}: first diff at row {i}: {diffs[:4]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
