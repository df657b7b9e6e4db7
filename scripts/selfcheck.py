#!/usr/bin/env python3
"""Self-recorded correctness witness (VERDICT r11 task 2): run the full
Verify dump at sf0.01, cross-check every query against the DuckDB oracle
with compare.py, and write a one-line SELFCHECK_r{N}.json summary
(git SHA, counts, wall time) so the repo itself records the round's
correctness even if the driver's channel zeroes.

r16 (VERDICT task 8): the close now also runs a ROTATED FUZZ LEG — one
hostile-value seed (= ROUND), one degenerate-cardinality seed
(= -(ROUND mod 3 + 1)), one micro-batch-sliced seed (= 100 + ROUND), and
(r17) one bad-key ingest seed (= -(100 + ROUND): NULL / duplicate
primary keys; keyed operators must reject loudly via the strict
KeyContract gate, everything else must still oracle-match), each over
the full query surface, refreshing FUZZCHECK.json at the close SHA — so
convention regressions can't land between evidence rounds. Skip (dev
loops only) with GRAFT_SKIP_FUZZ=1; the witness records the skip so it
can't masquerade as a fuzz-clean close.

Usage: selfcheck.py ROUND [SF_DIR] [OUT_DIR]
"""
import json
import os
import re
import subprocess
import sys
import time

round_no = int(sys.argv[1])
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
out_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/graft_selfcheck"
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

t0 = time.time()
sha = subprocess.check_output(
    ["git", "rev-parse", "HEAD"], cwd=repo).decode().strip()

verify = subprocess.run(
    ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out_dir}"],
    cwd=repo, env={**os.environ, "SPARK_GRAFT_CPUS":
                   os.environ.get("SPARK_GRAFT_CPUS", "16")},
    capture_output=True, text=True)
verify_s = time.time() - t0
if verify.returncode != 0:
    print(verify.stdout[-4000:], verify.stderr[-4000:])
    sys.exit(f"verify failed rc={verify.returncode}")

t1 = time.time()
cmp = subprocess.run(
    [sys.executable, os.path.join(repo, "scripts", "compare.py"),
     sf_dir, out_dir],
    env={**os.environ, "GRAFT_TIMING": "1"},
    capture_output=True, text=True)
compare_s = time.time() - t1

# Strict result-line format: "<query>: MATCH (N rows)..." or a mismatch
# verdict. A substring match on ": " would mis-tally future diagnostic
# lines (e.g. compare.py's timing table) as failed queries.
result_re = re.compile(
    r"^(\S+): (MATCH \(\d+ rows\)|NO SPARK OUTPUT|ORACLE ERROR"
    r"|SCHEMA MISMATCH|VALUE MISMATCH|TYPE MISMATCH)")
lines = [m for l in cmp.stdout.splitlines()
         if (m := result_re.match(l)) is not None]
match = [m.group(1) for m in lines if m.group(2).startswith("MATCH")]
fail = [m.group(1) for m in lines if not m.group(2).startswith("MATCH")]

# Guard against doc drift: the query counts written in README.md and
# SURVEY.md must equal the gated surface (oracle_sql.json size).
n_oracle = len(json.load(open(os.path.join(out_dir, "oracle_sql.json"))))

# A crashed/truncated compare run must NEVER yield a green witness: every
# gated query needs a parsed verdict line, and compare.py's own exit code
# must be a verdict (0/1), not a crash.
if cmp.returncode not in (0, 1):
    print(cmp.stdout[-4000:], cmp.stderr[-4000:])
    sys.exit(f"compare.py crashed rc={cmp.returncode}")
if len(lines) != n_oracle:
    print(cmp.stdout[-4000:], cmp.stderr[-4000:])
    sys.exit(f"compare.py reported {len(lines)} verdicts for a "
             f"{n_oracle}-query surface — truncated run, refusing to "
             "write a witness")
# Oracle-cost budget (VERDICT r13 task 5): r12 proved a 890 s compare leg
# kills the driver's correctness channel (rounds 10-12 zeroed); the r13
# rewrite brought it to ~30 s. Permanently gate the budget so a future
# expensive oracle fails THIS witness before it can zero the driver's:
# whole compare leg <= 120 s, any single oracle <= 5 s (timing table is
# slowest-first top-40, so the worst offender is always visible to it).
COMPARE_BUDGET_S, ORACLE_BUDGET_S = 120.0, 5.0
slow = [(n, float(t)) for t, n in
        re.findall(r"^--\s+([0-9.]+)s\s+(\S+)$", cmp.stdout, re.M)
        if float(t) > ORACLE_BUDGET_S]
if compare_s > COMPARE_BUDGET_S:
    sys.exit(f"oracle-cost budget blown: compare leg {compare_s:.1f}s > "
             f"{COMPARE_BUDGET_S:.0f}s — cheapen the worst oracles "
             "(GRAFT_TIMING table above) before the driver channel zeroes")
if slow:
    sys.exit("oracle-cost budget blown: single-oracle cap "
             f"{ORACLE_BUDGET_S:.0f}s exceeded by " +
             ", ".join(f"{n} ({t:.1f}s)" for n, t in slow))

for doc, pat in [("README.md", r"exposes (\d+) named queries"),
                 ("SURVEY.md", r"(\d+) oracle-gated queries total")]:
    text = open(os.path.join(repo, doc)).read()
    m = re.search(pat, text)
    if not m or int(m.group(1)) != n_oracle:
        sys.exit(f"{doc} query count {m.group(1) if m else '<missing>'} "
                 f"!= gated surface {n_oracle}; update the doc")
# ——————————— rotated fuzz leg (r16, VERDICT task 8) ———————————
fuzz = {"skipped": True}
if not fail and os.environ.get("GRAFT_SKIP_FUZZ") != "1":
    fuzz_root = "/tmp/graft_close_fuzz"
    subprocess.run(["rm", "-rf", fuzz_root])
    hostile, degen, sliced = round_no, -(round_no % 3 + 1), 100 + round_no
    badkey = -(100 + round_no)
    t2 = time.time()
    env = {**os.environ,
           "SPARK_GRAFT_CPUS": os.environ.get("SPARK_GRAFT_CPUS", "16")}
    # the hostile/degenerate legs must run in their attested UNSLICED
    # shape even if a dev loop left GRAFT_FUZZ_SLICE exported
    env.pop("GRAFT_FUZZ_SLICE", None)
    r1 = subprocess.run(
        ["sbt", "-batch", f"runMain graft.FuzzCheck {fuzz_root} "
         f"{hostile},{degen},{badkey}"],
        cwd=repo, env=env, capture_output=True, text=True)
    r2 = subprocess.run(
        ["sbt", "-batch", f"runMain graft.FuzzCheck {fuzz_root} {sliced}"],
        cwd=repo, env={**env, "GRAFT_FUZZ_SLICE": "8"},
        capture_output=True, text=True)
    if r1.returncode != 0 or r2.returncode != 0:
        print(r1.stdout[-3000:], r1.stderr[-2000:],
              r2.stdout[-3000:], r2.stderr[-2000:])
        sys.exit("fuzz leg: FuzzCheck run failed")
    fz = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "fuzzcheck.py"),
         fuzz_root, "--write-json", os.path.join(repo, "FUZZCHECK.json")],
        capture_output=True, text=True)
    print(fz.stdout)
    fuzz = {"skipped": False,
            "seeds": [hostile, degen, badkey, sliced],
            "rc": fz.returncode,
            "fuzz_s": round(time.time() - t2, 1)}
    if fz.returncode != 0:
        fail.append(f"fuzz_leg(seeds={hostile},{degen},{badkey},{sliced})")

summary = {
    "round": round_no,
    "git_sha": sha,
    "fuzz": fuzz,
    "sf_dir": sf_dir,
    "n_queries": len(lines),
    "n_match": len(match),
    "n_fail": len(fail),
    "failures": sorted(fail),
    "compare_rc": cmp.returncode,
    "verify_s": round(verify_s, 1),
    "compare_s": round(compare_s, 1),
    "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
}
out = os.path.join(repo, f"SELFCHECK_r{round_no:02d}.json")
with open(out, "w") as f:
    json.dump(summary, f, indent=1, sort_keys=True)
    f.write("\n")
print(json.dumps(summary, sort_keys=True))
if fail:
    print(cmp.stdout)
sys.exit(1 if fail else 0)
