#!/usr/bin/env python3
"""Differential fuzz orchestrator (r15): after `runMain graft.FuzzCheck
OUT_ROOT seeds...` has written per-seed hostile corpora + Spark results,
replay every oracle in DuckDB over the SAME corpus and diff — the identical
compare contract as scripts/compare.py (row count + sorted value multiset +
arrow types, columns sorted by name), looped over seeds, aggregated into
FUZZCHECK.json.

Usage: fuzzcheck.py OUT_ROOT [--write-json REPO_JSON] [QUERY...]

Exit 0 = every (seed, query) MATCHed (spark-side errors recorded in
fuzz_meta.json also fail the run unless listed in EXPECTED_SKIP with a
documented reason)."""
import sys, json, glob, os, subprocess

out_root = sys.argv[1]
args = sys.argv[2:]
write_json = None
if args and args[0] == "--write-json":
    write_json = args[1]
    args = args[2:]
only = args

# Queries excluded from the fuzz surface, each with the documented reason —
# printed in FUZZCHECK.json so the omission is visible, never silent.
EXPECTED_SKIP = {}

# Loud, spec'd CONTRACT REJECTIONS (r16 degenerate profile): on a corpus
# that violates an operator's documented minimum-input contract, the
# operator must fail with its own require() message — which the harness
# counts as a pass-by-rejection, recorded per seed in FUZZCHECK.json.
# The (query, message-substring) pair must BOTH match: an unexpected error
# on these queries still fails the run.
EXPECTED_REJECT = {
    # PQ training needs codebookSize seed vectors (Similarity.pqCodebooks)
    "ann_pq": "vectors, need",
    "ann_ivfpq": "vectors, need",
    "ann_pq_trained": "vectors, need",
    # k-means training needs nCells distinct seeds (Similarity.trainIvf)
    "ann_ivf_trained": "seeds",
    # an IVF index over an EMPTY historical corpus has no centroids
    "ann_index_probe": "corpus is empty",
    # personalized PageRank requires >=1 seed node present in the graph
    "graph_ppr": "no seed is present in the graph",
}

here = os.path.dirname(os.path.abspath(__file__))
seed_dirs = sorted(glob.glob(os.path.join(out_root, "seed_*")))
if not seed_dirs:
    print(f"no seed_* dirs under {out_root}"); sys.exit(2)

summary = {"seeds": {}, "skipped": EXPECTED_SKIP, "total_fail": 0}
for sd in seed_dirs:
    seed = os.path.basename(sd)[len("seed_"):]
    data_dir, out_dir = os.path.join(sd, "data"), os.path.join(sd, "out")
    meta = json.load(open(os.path.join(out_dir, "fuzz_meta.json")))
    spark_errs = {k: v for k, v in meta.get("failed", {}).items()
                  if k not in EXPECTED_SKIP and (not only or k in only)}
    # split spark-side errors into documented contract rejections vs real
    # failures: a rejection must match its registered message substring AND
    # occur on a DEGENERATE corpus (negative seed) — only those corpora
    # violate minimum-input contracts by design; the same error on a
    # hostile/sliced seed means an operator wrongly rejected valid input
    # and must fail the gate
    degenerate = int(seed) < 0
    rejects = {k: v[:180] for k, v in spark_errs.items()
               if degenerate and k in EXPECTED_REJECT
               and EXPECTED_REJECT[k] in v}
    spark_errs = {k: v for k, v in spark_errs.items() if k not in rejects}
    cmd = [sys.executable, os.path.join(here, "compare.py"), data_dir,
           out_dir] + only
    p = subprocess.run(cmd, capture_output=True, text=True)
    # integrity gate (r17, ADVICE): compare.py exits 0 (all match) or 1
    # (fails counted) — anything else is a CRASH mid-run (e.g. a corrupt
    # Spark result parquet read outside its try), and parsing the truncated
    # stdout would count zero FAILs and green-light an incomplete run.
    # selfcheck.py's main leg guards this; the fuzz leg gets parity here.
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    gated = {q for q in oracle
             if (not only or q in only) and q not in EXPECTED_SKIP}
    match, fails = 0, {}
    verdicts = {}
    for line in p.stdout.splitlines():
        if ": " not in line or line.startswith("--"):
            continue
        name, status = line.split(": ", 1)
        if name in oracle:
            verdicts[name] = status
    if p.returncode not in (0, 1):
        fails["__harness__"] = (f"compare.py crashed rc={p.returncode}: "
                                + p.stderr.strip()[-300:])
    # every gated query must print exactly one verdict line (rejected
    # queries print NO SPARK OUTPUT) — a missing line means a truncated run
    missing = sorted(gated - set(verdicts))
    if missing:
        fails["__coverage__"] = (f"{len(missing)} gated queries have no "
                                 f"verdict line (truncated compare run?): "
                                 + ", ".join(missing[:10]))
    for name, status in verdicts.items():
        if name not in gated or name in rejects:
            continue
        if status.startswith("MATCH"):
            match += 1
        else:
            fails[name] = status[:200]
    for k, v in spark_errs.items():
        fails.setdefault(k, f"SPARK ERROR {v[:180]}")
    assert match + len([f for f in fails if f in gated]) + len(rejects) \
        + len(missing) >= len(gated), "verdict accounting lost a query"
    summary["seeds"][seed] = {
        "match": match, "fail": len(fails), "failures": fails,
        "contract_rejects": rejects}
    summary["total_fail"] += len(fails)
    print(f"seed {seed}: {match} MATCH, {len(rejects)} contract-reject, "
          f"{len(fails)} FAIL")
    for k, v in sorted(fails.items()):
        print(f"  FAIL {k}: {v}")

if write_json:
    with open(write_json, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"wrote {write_json}")
sys.exit(1 if summary["total_fail"] else 0)
