#!/usr/bin/env python3
"""Self-recorded correctness witness (VERDICT r11 task 2): run the full
Verify dump at sf0.01, cross-check every query against the DuckDB oracle
with compare.py, and write a one-line SELFCHECK_r{N}.json summary
(git SHA, counts, wall time) so the repo itself records the round's
correctness even if the driver's channel zeroes.

Usage: selfcheck.py ROUND [SF_DIR] [OUT_DIR]
"""
import json
import os
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
    capture_output=True, text=True)
compare_s = time.time() - t1

lines = [l for l in cmp.stdout.splitlines() if ": " in l]
match = [l.split(":")[0] for l in lines if ": MATCH" in l]
fail = [l.split(":")[0] for l in lines if ": MATCH" not in l]
summary = {
    "round": round_no,
    "git_sha": sha,
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
