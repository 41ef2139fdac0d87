#!/usr/bin/env python3
"""Driver-faithful comparator experiment: load Spark result via
pandas.read_parquet, oracle via duckdb .df(), sort columns by name,
sort rows by all columns, then compare values AND dtypes.

Usage: python3 tools/diff_pandas.py <sfDir> <outDir> [query ...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_spark(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def norm(df):
    # Canonicalize datetimes the way the driver evidently does (r01:
    # date-object vs datetime64[us] and ns-vs-us pairings hash-matched):
    # any datetime64 column or all-date object column -> datetime64[ns].
    df = df.copy()
    for c in df.columns:
        col = df[c]
        if str(col.dtype).startswith("datetime64"):
            df[c] = col.astype("datetime64[ns]")
        elif col.dtype == object and len(col) and all(
                v is None or str(type(v).__name__) in ("date", "datetime", "Timestamp")
                for v in col):
            import datetime
            if any(isinstance(v, (datetime.date, datetime.datetime)) for v in col):
                df[c] = pd.to_datetime(col).astype("datetime64[ns]")
    df = df[sorted(df.columns)]
    try:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    except TypeError as e:
        return None, f"sort error: {e}"
    return df.reset_index(drop=True), None


def cmp_frames(s, o):
    """Return list of mismatch descriptions (driver-style strictness)."""
    probs = []
    if list(s.columns) != list(o.columns):
        return [f"columns {list(s.columns)} vs {list(o.columns)}"]
    if len(s) != len(o):
        return [f"rows {len(s)} vs {len(o)}"]
    for c in s.columns:
        a, b = s[c], o[c]
        if str(a.dtype) != str(b.dtype):
            probs.append(f"dtype[{c}]: spark={a.dtype} oracle={b.dtype} "
                         f"(ex: {a.iloc[0]!r} vs {b.iloc[0]!r})")
            continue
        if a.dtype == object:
            neq = [(i, x, y) for i, (x, y) in enumerate(zip(a, b))
                   if (x is None) != (y is None)
                   or (x is not None and str(x) != str(y))]
        else:
            av, bv = a.values, b.values
            if np.issubdtype(a.dtype, np.floating):
                neq = [(i, av[i], bv[i]) for i in range(len(av))
                       if not (av[i] == bv[i]
                               or (np.isnan(av[i]) and np.isnan(bv[i])))]
            elif str(a.dtype).startswith("datetime64"):
                neq = [(i, av[i], bv[i]) for i in range(len(av))
                       if not (av[i] == bv[i]
                               or (np.isnat(av[i]) and np.isnat(bv[i])))]
            else:
                neq = [(i, av[i], bv[i]) for i in range(len(av))
                       if av[i] != bv[i]]
        if neq:
            probs.append(f"value[{c}]: {len(neq)} diffs, first {neq[0]}")
    return probs


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
        sdf = load_spark(outdir, name)
        if sdf is None:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        s, serr = norm(sdf)
        o, oerr = norm(odf)
        if serr or oerr:
            print(f"FAIL {name}: {serr or oerr}")
            n_fail += 1
            continue
        probs = cmp_frames(s, o)
        if probs:
            print(f"FAIL {name}:")
            for p in probs[:6]:
                print(f"    {p}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
