#!/usr/bin/env python
"""End-to-end resume check under a REAL induced failure (VERDICT r3 #6).

    python scripts/resume_check.py [--sf /root/testdata/sf0.1]

1. launches ``run_job.py --sf <sf> --shards 32 --wave-size 4`` as a child
   process and SIGKILLs it once >=1 wave of lineage manifests has been
   committed (a genuine mid-run crash: no atexit, no cleanup);
2. resubmits the identical command and asserts the completed waves were
   SKIPPED (their manifests survive, their output untouched) while only
   the unfinished tail reprocessed;
3. runs the same job uninterrupted into a fresh output dir and asserts the
   per-sink (row_count, tok_sum) aggregates are identical.

Prints one JSON line {"skipped_after_kill": N, "processed_after_kill": M,
"sinks_match": true, ...}; exit code 1 on any violation. The result is
recorded in BASELINE.md ("Resume under induced failure").
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUN_JOB = os.path.join(REPO, "scripts", "run_job.py")


def launch(args: list[str]) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, RUN_JOB] + args,
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True,
    )


def manifests(out_dir: str) -> set[str]:
    d = os.path.join(out_dir, "_lineage")
    if not os.path.isdir(d):
        return set()
    return {f[:-5] for f in os.listdir(d) if f.endswith(".json")}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--workdir", default="/tmp/resume_check")
    ap.add_argument("--shards", type=int, default=32)
    ap.add_argument("--wave-size", type=int, default=4)
    ap.add_argument("--kill-after-manifests", type=int, default=4,
                    help="SIGKILL the job once this many shard manifests "
                    "have been committed")
    a = ap.parse_args()

    shutil.rmtree(a.workdir, ignore_errors=True)
    os.makedirs(a.workdir)
    corpus = os.path.join(a.workdir, "corpus")
    out = os.path.join(a.workdir, "out")
    ref = os.path.join(a.workdir, "ref")
    job_args = ["--sf", a.sf, "--corpus-cache", corpus,
                "--shards", str(a.shards), "--wave-size", str(a.wave_size)]

    # run 1: kill mid-run, after >= kill_after_manifests manifests commit
    proc = launch(job_args + ["--out", out])
    deadline = time.time() + 600
    killed = False
    while time.time() < deadline:
        if proc.poll() is not None:
            break  # finished before we could kill it — still a valid check
        if len(manifests(out)) >= a.kill_after_manifests:
            os.kill(proc.pid, signal.SIGKILL)
            proc.wait()
            killed = True
            break
        time.sleep(0.05)
    else:
        proc.kill()
        print(json.dumps({"error": "timeout waiting for first wave"}))
        return 1
    committed_at_kill = manifests(out)

    # run 2: resubmit — completed waves must be skipped, tail reprocessed
    proc2 = launch(job_args + ["--out", out])
    out2, _ = proc2.communicate(timeout=600)
    if proc2.returncode != 0:
        print(json.dumps({"error": "resubmission failed"}))
        return 1
    r2 = json.loads(out2.strip().splitlines()[-1])

    # run 3: uninterrupted reference (same corpus cache -> same inputs)
    proc3 = launch(job_args + ["--out", ref])
    out3, _ = proc3.communicate(timeout=600)
    r3 = json.loads(out3.strip().splitlines()[-1])

    ok = True
    errs: list[str] = []
    if killed:
        if set(r2["skipped"]) != committed_at_kill:
            ok = False
            errs.append(
                f"skipped {sorted(r2['skipped'])} != committed-at-kill "
                f"{sorted(committed_at_kill)}")
        if set(r2["processed"]) & committed_at_kill:
            ok = False
            errs.append("a committed shard was reprocessed")
        if len(r2["processed"]) + len(r2["skipped"]) != a.shards:
            ok = False
            errs.append("shard accounting does not cover all inputs")
    if r2["sinks"] != r3["sinks"]:
        ok = False
        errs.append(f"aggregate mismatch: {r2['sinks']} != {r3['sinks']}")

    print(json.dumps({
        "killed_mid_run": killed,
        "manifests_at_kill": len(committed_at_kill),
        "skipped_after_kill": len(r2["skipped"]),
        "processed_after_kill": len(r2["processed"]),
        "sinks_match": r2["sinks"] == r3["sinks"],
        "sinks": r2["sinks"],
        "errors": errs,
    }, default=str))
    shutil.rmtree(a.workdir, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
