#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [--json <path>]
       [--timeout <sec>] [--threads <n>]

Reads each <verifyOutDir>/<name>/ parquet result produced by graft.Verify,
runs the matching SQL from oracle_sql.json in DuckDB over the same sfDir
parquet tables, and reports row-count / schema / value mismatches.
--json additionally writes a driver-format correctness artifact
(name -> {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err}) — used for the committed multi-SF gates (CORRECTNESS_sf1.json).
--timeout interrupts any single oracle query after N seconds (recorded
as an oracle-timeout FAIL; the run continues) — the per-query watchdog
the sf10 gate needs where one DuckDB leg is resource-bound.
--threads caps DuckDB's thread pool (co-scheduling with a Spark run).
"""
import sys, json, glob, os, re
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    import datetime, decimal, math
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v

def main(sf_dir, out_dir, json_out=None, timeout=None, threads=None):
    import threading
    report = {}
    con = duckdb.connect()
    if threads:
        con.execute(f"SET threads={int(threads)}")
    # env-sourced config goes through validation before touching SQL
    # (round-9 ADVICE: a quote in a value would inject into the SET)
    def env_checked(name, default, pattern):
        v = os.environ.get(name, default)
        if not re.fullmatch(pattern, v):
            raise ValueError(f"{name}={v!r} fails shape check {pattern}")
        return v
    # heavy oracles (the sf1 LSH/triangle CTEs) spill; keep the spill on
    # the big /tmp volume and under a cap instead of cwd/.tmp
    con.execute("SET temp_directory='%s'" % env_checked(
        "DUCK_TMP", "/tmp/duckcmp_tmp", r"[A-Za-z0-9_./-]+"))
    # override when co-scheduling with a Spark run (no swap on this box —
    # two 48GB pools + one JVM heap overcommit physical RAM and thrash)
    con.execute("SET memory_limit='%s'" % env_checked(
        "DUCK_MEM", "48GB", r"\d+(\.\d+)?\s*[KMGT]i?B"))
    # cap the spill so one runaway oracle leg fails ITS row instead of
    # filling the volume and IO-poisoning every later query (and any
    # concurrent Spark shuffle) — the round-9 q416 lesson
    con.execute("SET max_temp_directory_size='%s'" % env_checked(
        "DUCK_TMP_CAP", "50GB", r"\d+(\.\d+)?\s*[KMGT]i?B"))
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # GenData SFs write directory-shaped tables
            p = f"{p}/*.parquet"
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    # Cached-CTE prelude (optional, written by graft.Verify): the
    # LSH-family oracles share one multi-CTE prefix that DuckDB would
    # otherwise re-derive per query (minutes each at sf1). Materialize
    # each prefix stage ONCE as a temp table on first use and strip the
    # prefix from matching oracles; non-matching queries are untouched,
    # and a missing prelude file degrades to the self-contained path.
    preludes = []
    ppath = f"{out_dir}/oracle_prelude.json"
    if os.path.exists(ppath):
        preludes = json.load(open(ppath))  # longest prefix first
    made = set()
    def rewrite(sql):
        for p in preludes:
            pre = p["prefix"]
            if not sql.startswith(pre):
                continue
            for tname, tsql in p["stages"]:
                if tname not in made:
                    con.execute(f"CREATE TEMP TABLE {tname} AS {tsql}")
                    made.add(tname)
            rest = sql[len(pre):].lstrip()
            if rest.startswith(","):
                return "WITH " + rest[1:].lstrip()
            return rest
        return sql

    n_ok = n_bad = 0
    def rec(name, rows_m, schema_m, hash_m, s_rows=None, o_rows=None, err=None):
        report[name] = {"rows_match": rows_m, "schema_match": schema_m,
                        "hash_match": hash_m, "spark_rows": s_rows,
                        "oracle_rows": o_rows, "err": err}
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result");  n_bad += 1
            rec(name, False, False, False, err="no spark result");  continue
        spark_tbl = pq.read_table(files[0])
        # prelude materialization (inside rewrite) runs DuckDB work too —
        # keep it under the SAME timer/try as the query so a chain prefix
        # that exceeds the box fails ITS rows, not the whole run
        try:
            if timeout:
                timer = threading.Timer(timeout, con.interrupt)
                timer.start()
                try:
                    duck = con.execute(rewrite(sql)).fetch_arrow_table()
                finally:
                    timer.cancel()
            else:
                duck = con.execute(rewrite(sql)).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}");  n_bad += 1
            rec(name, False, False, False, err=f"oracle error: {e}");  continue
        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck.column_names)
        if s_cols != d_cols:
            print(f"FAIL {name}: cols spark={s_cols} duck={d_cols}");  n_bad += 1
            rec(name, False, False, False, err="column sets differ");  continue
        # Arrow-TYPE parity: the driver's hash is type-tagged, so a value-
        # identical decimal128 vs int64 (DuckDB silently widens SUM-derived
        # projections to HUGEINT/DECIMAL) still hash-mismatches there even
        # though canon() hides it here. Normalize benign representation
        # differences only (tz tag, string width).
        def ntype(t):
            s = str(t)
            s = s.replace("large_string", "string").replace("large_binary", "binary")
            if s.startswith("timestamp"):
                s = "timestamp"
            return s
        s_types = {f.name: ntype(f.type) for f in spark_tbl.schema}
        d_types = {f.name: ntype(f.type) for f in duck.schema}
        mism = {c: (s_types[c], d_types[c]) for c in s_cols if s_types[c] != d_types[c]}
        if mism:
            print(f"FAIL {name}: arrow types differ {mism}");  n_bad += 1
            rec(name, False, False, False, err=f"arrow types differ {mism}");  continue
        if spark_tbl.num_rows != duck.num_rows:
            print(f"FAIL {name}: rows spark={spark_tbl.num_rows} duck={duck.num_rows}")
            n_bad += 1
            rec(name, False, True, False, spark_tbl.num_rows, duck.num_rows,
                "row counts differ");  continue
        s_rows = [tuple(canon(r[c]) for c in s_cols) for r in spark_tbl.to_pylist()]
        d_rows = [tuple(canon(r[c]) for c in d_cols) for r in duck.to_pylist()]

        # DOUBLE columns: allow <= 2 ulp. Java's BigDecimal.doubleValue is
        # correctly rounded (one rounding); DuckDB converts decimal ->
        # double as (double)unscaled / (double)10^scale (two roundings).
        # On values with >= 17 significant digits (sf >= 1 money sums) the
        # two legal conversions differ by 1 ulp — representation noise,
        # not a computation difference. Everything non-float stays exact.
        def ulps_eq(a, b):
            import math, struct
            if a == b:
                return True
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) or math.isnan(b):
                    return False
                ia = struct.unpack("<q", struct.pack("<d", a))[0]
                ib = struct.unpack("<q", struct.pack("<d", b))[0]
                if ia < 0: ia = -(1 << 63) - ia
                if ib < 0: ib = -(1 << 63) - ib
                return abs(ia - ib) <= 2
            if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
                return all(ulps_eq(x, y) for x, y in zip(a, b))
            return False
        def rows_eq(ra, rb):
            return all(ulps_eq(x, y) for x, y in zip(ra, rb))
        if s_rows != d_rows and not all(rows_eq(a, b) for a, b in zip(s_rows, d_rows)):
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows))
                     if not rows_eq(a, b)]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: {diffs[0]}")
            n_bad += 1
            rec(name, True, True, False, spark_tbl.num_rows, duck.num_rows,
                f"{len(diffs)} differing rows");  continue
        print(f"OK   {name}: {duck.num_rows} rows")
        rec(name, True, True, True, spark_tbl.num_rows, duck.num_rows)
        n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
    return 1 if n_bad else 0

if __name__ == "__main__":
    jpath = tmo = thr = None
    args = sys.argv[1:]
    if "--json" in args:
        i = args.index("--json");  jpath = args[i + 1];  del args[i:i + 2]
    if "--timeout" in args:
        i = args.index("--timeout");  tmo = float(args[i + 1]);  del args[i:i + 2]
    if "--threads" in args:
        i = args.index("--threads");  thr = int(args[i + 1]);  del args[i:i + 2]
    sys.exit(main(args[0], args[1], jpath, tmo, thr))
