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
#
# Each entry also declares WHICH degenerate variant triggers it
# (|seed| % 3, or None = every degenerate seed) — the r17 staleness gate:
# on a full-surface run whose seeds COVER an entry's variant, the entry
# must be observed to fire at least once, else it is STALE (the operator
# was changed and the registry would silently mask a future wrong
# rejection) and the run fails.
EXPECTED_REJECT = {
    # PQ training needs codebookSize seed vectors (Similarity.pqCodebooks);
    # fires on the single-vector embeddings variant (|seed| % 3 == 1)
    "ann_pq": ("vectors, need", 1),
    "ann_ivfpq": ("vectors, need", 1),
    "ann_pq_trained": ("vectors, need", 1),
    # k-means training needs nCells distinct seeds (Similarity.trainIvf)
    "ann_ivf_trained": ("seeds", 1),
    # an IVF index over an EMPTY historical corpus has no centroids
    "ann_index_probe": ("corpus is empty", 1),
    # personalized PageRank requires >=1 seed node present in the graph
    "graph_ppr": ("no seed is present in the graph", None),
}

# Loud contract rejections on the BAD-KEY ingest profile (r17, seeds
# ≤ -100: NULL / duplicate primary keys): operators whose semantics are
# UNDEFINED under a broken key contract — dedup tie-breaks, pair
# enumeration, pack/shard order, id-hash splits, ANN ids, arrival-ordered
# stream folds — must detect the violation (graft.sources.KeyContract,
# strict mode) and fail with its registered message; silent nondeterminism
# is the failure class this family exists to catch. Queries NOT listed
# here must produce defined, oracle-matched output over the corrupted
# corpus. Same matching rule as EXPECTED_REJECT: query AND message
# substring, scoped to badkey seeds.
KEY_MSG = "primary-key contract violated"  # KeyContract.MSG
BADKEY_REJECT = {
    "ann_index_probe": KEY_MSG, "ann_ivf": KEY_MSG, "ann_ivf_trained": KEY_MSG,
    "ann_ivfpq": KEY_MSG, "ann_pq": KEY_MSG, "ann_pq_trained": KEY_MSG,
    "asof_join_forward": KEY_MSG, "batch_by_length": KEY_MSG, "boilerplate_strip": KEY_MSG,
    "cdc_apply": KEY_MSG, "decontaminate_fuzzy": KEY_MSG,
    "corpus_interleave": KEY_MSG, "corpus_shuffle": KEY_MSG, "decontaminate": KEY_MSG,
    "decontaminate_semantic": KEY_MSG, "dedup_apply": KEY_MSG, "dedup_apply_cc": KEY_MSG,
    "dedup_apply_priority": KEY_MSG, "dedup_apply_unbiased": KEY_MSG, "dedup_cluster_quality": KEY_MSG,
    "dedup_cluster_sizes": KEY_MSG, "dedup_containment": KEY_MSG, "dedup_cross_source": KEY_MSG,
    "dedup_edit_apply": KEY_MSG, "dedup_exact": KEY_MSG, "dedup_groups": KEY_MSG,
    "dedup_groups_incremental": KEY_MSG, "dedup_index_probe": KEY_MSG, "dedup_jaccard_exact": KEY_MSG,
    "dedup_minhash": KEY_MSG, "dedup_ngram": KEY_MSG, "dedup_paragraphs": KEY_MSG,
    "dedup_quality_bias": KEY_MSG, "dedup_substring_apply": KEY_MSG, "dedup_threshold_sweep": KEY_MSG,
    "dup_rate_by_source": KEY_MSG, "eval_ann_recall": KEY_MSG, "eval_mrr": KEY_MSG,
    "eval_rouge": KEY_MSG, "events_throttle": KEY_MSG,
    "events_attribution": KEY_MSG, "events_grouped_topk": KEY_MSG, "graph_assortativity": KEY_MSG,
    "graph_clustering_coeff": KEY_MSG, "graph_degree_dist": KEY_MSG, "graph_seed_distance": KEY_MSG,
    "hybrid_rrf": KEY_MSG, "image_dedup_apply": KEY_MSG, "image_neardup": KEY_MSG,
    "multimodal_audio": KEY_MSG, "multimodal_bmp": KEY_MSG, "multimodal_decode": KEY_MSG,
    "multimodal_features": KEY_MSG, "multimodal_gzip": KEY_MSG, "multimodal_jpeg": KEY_MSG,
    "multimodal_pgm": KEY_MSG, "multimodal_tiff": KEY_MSG, "multimodal_video": KEY_MSG,
    "multimodal_zip": KEY_MSG, "pack_sequences": KEY_MSG, "quality_pct_rank": KEY_MSG,
    "range_join": KEY_MSG, "sample_cap_per_group": KEY_MSG, "sample_temperature": KEY_MSG,
    "semdedup": KEY_MSG, "shard_by_tokens": KEY_MSG, "split_leakage_safe": KEY_MSG,
    "stream_lateness": KEY_MSG, "stream_throttle": KEY_MSG, "watermark_audit": KEY_MSG,
    "winnow_neardup": KEY_MSG,
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
    # occur on the corpus family that violates the contract by design —
    # degenerate seeds ([-99,-1]) violate minimum-input contracts, badkey
    # seeds (≤ -100) violate the primary-key contract. The same error on a
    # hostile/sliced seed means an operator wrongly rejected valid input
    # and must fail the gate.
    degenerate = -99 <= int(seed) < 0
    badkey = int(seed) <= -100
    registry = ({k: m for k, (m, _) in EXPECTED_REJECT.items()}
                if degenerate else BADKEY_REJECT if badkey else {})
    rejects = {k: v[:180] for k, v in spark_errs.items()
               if k in registry and registry[k] in v}
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

# ——— registry staleness gate (r17, VERDICT task 6): on a full-surface
# run, every registry entry whose trigger family/variant is covered by
# this run's seeds must be observed to FIRE at least once — an entry that
# never fires is STALE (its operator changed underneath it) and would
# silently mask a future wrong rejection on that query. Entries whose
# variant no seed in this run exercises are left unchecked here (the
# multi-seed witness run covers them).
if not only:
    seeds_run = {int(s): v for s, v in summary["seeds"].items()}
    deg_variants = {-s % 3 for s in seeds_run if -99 <= s < 0}
    has_badkey = any(s <= -100 for s in seeds_run)
    obs_deg = {q for s, v in seeds_run.items() if -99 <= s < 0
               for q in v["contract_rejects"]}
    obs_bad = {q for s, v in seeds_run.items() if s <= -100
               for q in v["contract_rejects"]}
    stale = sorted(
        [q for q, (_, var) in EXPECTED_REJECT.items()
         if ((var is None and deg_variants) or var in deg_variants)
         and q not in obs_deg] +
        [q for q in BADKEY_REJECT if has_badkey and q not in obs_bad])
    summary["stale_registry_entries"] = stale
    if stale:
        summary["total_fail"] += len(stale)
        print(f"STALE registry entries ({len(stale)}): registered rejection "
              "never observed on a covering seed — " + ", ".join(stale))

if write_json:
    with open(write_json, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"wrote {write_json}")
sys.exit(1 if summary["total_fail"] else 0)
