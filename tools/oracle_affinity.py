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
import sys, os, json, glob, time, re
import duckdb


def split_edges_prefix(sql):
    """Locate the shared edge-list CTE prefix in a stored oracle SQL and
    return (top_k, rest_sql): the top-k parsed from the `rn <= K` filter
    inside the `e AS (...)` CTE (tracking the Scala TopK constant via the
    stored string instead of a hardcoded 3), and everything after that
    CTE's closing paren + comma (the query-specific CTEs, whatever they
    are named — no literal 'ed AS' assumption). Raises ValueError with a
    diagnostic if the stored SQL no longer has the expected shape, so a
    refactor of edgesSql fails LOUDLY here instead of producing spurious
    FAIL rows."""
    m = re.search(r"\be AS \(", sql)
    if not m:
        raise ValueError("stored oracle SQL has no 'e AS (' CTE; "
                         "edgesSql was refactored — update oracle_affinity.py")
    depth, i = 0, m.end() - 1
    while i < len(sql):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                break
        i += 1
    if depth != 0:
        raise ValueError("unbalanced parens scanning the e AS (...) CTE")
    km = re.search(r"rn <= (\d+)", sql[m.end():i])
    if not km:
        raise ValueError("no 'rn <= K' top-k filter inside the e CTE; "
                         "edge ranking changed — update oracle_affinity.py")
    rest = sql[i + 1:].lstrip()
    if not rest.startswith(","):
        raise ValueError("expected ',<next CTE>' after the e CTE, got: "
                         + rest[:40])
    return int(km.group(1)), rest.lstrip(",").lstrip()


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


QUERIES = ["q_graph_hits", "q_graph_closeness3"]


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    nchunks = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    wdir, epath = "/tmp/oracle_w", "/tmp/oracle_e.parquet"
    os.makedirs(wdir, exist_ok=True)
    for f in glob.glob(f"{wdir}/*.parquet"):
        os.remove(f)
    # Parse top-k + the query-specific CTE tail out of each STORED SQL
    # before any materialization: the chunked edge build must use the
    # same k the Scala TopK constant produced, not a hardcoded 3.
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    parsed = {name: split_edges_prefix(oracle[name]) for name in QUERIES}
    ks = {k for k, _ in parsed.values()}
    if len(ks) != 1:
        raise ValueError(f"queries disagree on edge top-k: {ks}")
    topk = ks.pop()
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
              WHERE rn <= {topk})
        SELECT a, b FROM e)
      TO '{epath}' (FORMAT PARQUET)""")
    n_edges = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{epath}')").fetchone()[0]
    print(f"edges materialized in {time.time() - t0:.1f}s ({n_edges} edges)")

    n_fail = 0
    for name in QUERIES:
        _, rest = parsed[name]
        sql2 = (f"WITH e AS (SELECT a, b FROM read_parquet('{epath}')),\n"
                + rest)
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
