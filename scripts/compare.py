#!/usr/bin/env python3
"""Local dev harness approximating the driver's correctness gate:
run each oracle SQL in DuckDB over the sf parquet tables and compare with
the Spark result parquet (row count + sorted-multiset of values, columns
sorted by name). Usage: compare.py SF_DIR OUT_DIR [QUERY...]

With GRAFT_TIMING=1, appends per-query oracle wall seconds to each result
line and prints a sorted timing table at the end (slowest first), so the
suite's DuckDB cost can be profiled and the worst oracles cheapened."""
import sys, json, glob, os, time
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    # sliced tables (micro-batch fuzz leg) are DIRECTORIES of part files
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
timing = os.environ.get("GRAFT_TIMING") == "1"
times = {}
fail = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    spark_glob = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not spark_glob:
        print(f"{name}: NO SPARK OUTPUT"); fail += 1; continue
    t0 = time.time()
    try:
        o = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}"); fail += 1; continue
    finally:
        times[name] = time.time() - t0
    s = con.execute(
        f"SELECT * FROM read_parquet({spark_glob!r})").fetch_arrow_table()
    ocols, scols = sorted(o.column_names), sorted(s.column_names)
    if ocols != scols:
        print(f"{name}: SCHEMA MISMATCH spark={scols} oracle={ocols}"); fail += 1; continue
    otypes = [str(o.column(c).type) for c in ocols]
    stypes = [str(s.column(c).type) for c in ocols]
    orows = sorted(map(str, zip(*[o.column(c).to_pylist() for c in ocols])))
    srows = sorted(map(str, zip(*[s.column(c).to_pylist() for c in ocols])))
    if orows != srows:
        diff = [(a, b) for a, b in zip(orows, srows) if a != b][:3]
        print(f"{name}: VALUE MISMATCH rows spark={len(srows)} oracle={len(orows)} first_diffs={diff}")
        fail += 1
    elif otypes != stypes:
        print(f"{name}: TYPE MISMATCH (values equal) spark={stypes} oracle={otypes}")
        fail += 1
    else:
        suffix = f" [oracle {times[name]:.2f}s]" if timing else ""
        print(f"{name}: MATCH ({len(srows)} rows){suffix}")
if timing and times:
    total = sum(times.values())
    print(f"-- oracle timing: total {total:.1f}s over {len(times)} queries --")
    for name, t in sorted(times.items(), key=lambda kv: -kv[1])[:40]:
        print(f"--   {t:7.2f}s  {name}")
sys.exit(1 if fail else 0)
