#!/usr/bin/env python
"""One bigger-scale build leg (VERDICT r2 #7): build the full index over a
1M-file corpus (5x the per-round bench volume, sf~0.5 of the 2M-file/sf=1
corpus) so the hot-term salting and the single-pass salted shuffle are
exercised well past the per-round volume. Reports files/sec plus the per-stage
split and appends the evidence to BENCH/BASELINE.md.

Same protocol as tools/bench_scaling.py (same JOB: spark-submit --py-files,
warm-up build first, per-batch checkpoint stage timings); single leg, so this
measures volume-scaling (files/s vs the 200k-file run), not core-scaling.

Usage: TMPDIR=/dev/shm python tools/bench_big.py [--files 1000000] [--cores 32]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import shutil
import subprocess
import sys
import tempfile

TOOLS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TOOLS)
sys.path.insert(0, TOOLS)

from bench_scaling import GEN, JOB, run_submit  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=1_000_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "BASELINE.md"))
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="bench_big_")
    zip_path = os.path.join(work, "engine.zip")
    subprocess.run(["zip", "-qr", zip_path, "es_indexer_spark"], cwd=REPO, check=True)
    env = {"ENGINE_ZIP": zip_path}

    corpus = os.path.join(work, "code_files")
    print(f"generating {args.files} files -> {corpus}", flush=True)
    run_submit(GEN, "local[32]", [corpus, str(args.files)], env)

    best = None
    for rep in range(args.reps):
        idx = os.path.join(work, f"idx_{rep}")
        print(f"[rep {rep}] build+query at local[{args.cores}] ...", flush=True)
        out = run_submit(
            JOB, f"local[{args.cores}]", [corpus, idx, str(args.cores)], env
        )
        line = [l for l in out.splitlines() if l.startswith("BENCHJSON:")][-1]
        r = json.loads(line[len("BENCHJSON:"):])
        print(r, flush=True)
        if best is None or r["build_sec"] < best["build_sec"]:
            best = r
        shutil.rmtree(idx, ignore_errors=True)

    today = datetime.date.today().isoformat()
    stage_rows = "".join(
        f"| {s} | {best['stages'][s]} |\n" for s in sorted(best.get("stages", {}))
    )
    section = f"""

## Large-volume leg ({today}): {best['n_files']:,} files at local[{args.cores}]

Same JOB/protocol as the scaling legs above, 5x the per-round bench volume —
exercises df-proportional hot-term salting and the single-pass salted shuffle
at sf~0.5. One leg (volume scaling, not core scaling):

| metric | value |
|---|---|
| build sec | {best['build_sec']} |
| build files/sec | {best['files_per_sec']} |
| query sec (5 seq) | {best['query_sec']} |
| conc q/s (15 conc) | {best.get('conc_queries_per_sec', '-')} |

Per-stage split (sec):

| stage | local[{args.cores}] |
|---|---|
{stage_rows}
Reproduce: `TMPDIR=/dev/shm python tools/bench_big.py --files {best['n_files']} --cores {args.cores}`.
"""
    with open(args.out, "a") as f:
        f.write(section)
    print(json.dumps({"files_per_sec": best["files_per_sec"], "out": args.out}))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
