#!/usr/bin/env python3
"""Disk-frugal DuckDB oracle for the affinity-graph queries at big SFs.

Round 7 recorded q_graph_hits / q_graph_closeness3 as "DuckDB comparator
capacity limits" at sf1.0: the inline `edgesSql` CTE (ps -> w -> wd -> e)
made DuckDB spill its entire temp disk on the ~35M-row pair-weight frame
and die. The fix is to PARTITION the pair aggregation by part id — the
pair weight w(s1,s2) = sum over parts of within-part pairs, and parts are
disjoint, so chunking `a.p % NCHUNKS = i` is exactly additive — write
each chunk's aggregate to parquet, merge with one small group-by, and run
the rest of the oracle off the materialized top-k edge list. Identical
result by construction; ~10 s wall instead of a disk-kill.

Usage: oracle_affinity.py <sfDir> <verifyOutDir> [nchunks]
  <verifyOutDir> must hold oracle_sql.json + q_graph_hits/ +
  q_graph_closeness3/ parquet dumps from `graft.Verify <sfDir> <out> ...`.
Exit 0 iff both queries match, diff.py-strict compare.
"""
import sys, os, json, glob, time
import duckdb


def canon(v):
    if v is None: return "NULL"
    if isinstance(v, float): return repr(v)
    if isinstance(v, bytes): return v.hex()
    if isinstance(v, list): return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rows_of(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [cols[i] for i in order], [[canon(r[i]) for i in order] for r in rows]


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    nchunks = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    wdir, epath = "/tmp/oracle_w", "/tmp/oracle_e.parquet"
    os.makedirs(wdir, exist_ok=True)
    for f in glob.glob(f"{wdir}/*.parquet"):
        os.remove(f)
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/ducktmp'; "
                "SET memory_limit='24GB'; "
                "SET preserve_insertion_order=false;")
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{sfdir}/lineitem.parquet')")
    t0 = time.time()
    for i in range(nchunks):
        con.execute(f"""
          COPY (SELECT a.sv s1, b.sv s2, COUNT(*) c
                FROM (SELECT DISTINCT l_partkey p, l_suppkey sv FROM lineitem) a
                JOIN (SELECT DISTINCT l_partkey p, l_suppkey sv FROM lineitem) b
                  ON a.p = b.p AND a.sv < b.sv
                WHERE a.p % {nchunks} = {i} GROUP BY 1, 2)
          TO '{wdir}/w_{i}.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
      COPY (
        WITH w AS (SELECT s1, s2, CAST(SUM(c) AS BIGINT) c
                   FROM read_parquet('{wdir}/w_*.parquet') GROUP BY 1, 2),
        wd AS (SELECT s1, s2, c FROM w UNION ALL SELECT s2, s1, c FROM w),
        e AS (SELECT DISTINCT least(s1, s2) a, greatest(s1, s2) b
              FROM (SELECT s1, s2,
                      row_number() OVER (PARTITION BY s1 ORDER BY c DESC, s2) rn
                    FROM wd)
              WHERE rn <= 3)
        SELECT a, b FROM e)
      TO '{epath}' (FORMAT PARQUET)""")
    n_edges = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{epath}')").fetchone()[0]
    print(f"edges materialized in {time.time() - t0:.1f}s ({n_edges} edges)")

    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_fail = 0
    for name in ["q_graph_hits", "q_graph_closeness3"]:
        sql = oracle[name]
        i = sql.index("ed AS")  # everything before is the edgesSql prefix
        sql2 = (f"WITH e AS (SELECT a, b FROM read_parquet('{epath}')),\n"
                + sql[i:])
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        ocols, orows = rows_of(con, sql2)
        scols, srows = rows_of(con, f"SELECT * FROM read_parquet({files!r})")
        ok = scols == ocols and srows == orows
        print(f"{'PASS' if ok else 'FAIL'} {name} "
              f"({len(srows)} vs {len(orows)} rows)")
        if not ok:
            n_fail += 1
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
