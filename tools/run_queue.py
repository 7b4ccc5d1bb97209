"""Minimal sequential experiment queue with retry.

The reference delegates job scheduling and crash recovery to an external
`pueue` daemon (every script wraps its command in `pueue add -g <group>`,
e.g. scripts/pretrain/*.sh; README.md:44-45). This is the in-repo
equivalent: feed it script paths (or any commands), it runs them in order,
captures per-job logs, retries failures, and records a resumable journal —
so a long experiment matrix survives interruptions.

Usage:
  python tools/run_queue.py scripts/pretrain/pt-*.sh --retries 1
  python tools/run_queue.py --resume queue_state.json
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import shlex
import subprocess
import sys


def run_job(cmd: str, log_path: str) -> int:
    with open(log_path, "a") as log:
        log.write(f"\n==== {datetime.datetime.now().isoformat()} :: {cmd}\n")
        log.flush()
        proc = subprocess.run(
            cmd if isinstance(cmd, list) else shlex.split(cmd)
            if not cmd.endswith(".sh") else ["sh", cmd],
            stdout=log,
            stderr=subprocess.STDOUT,
        )
        return proc.returncode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("jobs", nargs="*", help="scripts/commands to run in order")
    ap.add_argument(
        "--jobs_file",
        help="read jobs from a file, one command per line (# comments and "
        "blank lines skipped) — e.g. scripts/validate/queue.jobs, the "
        "real-data validation recipe (VALIDATE.md)",
    )
    ap.add_argument("--retries", type=int, default=1)
    ap.add_argument("--state", default="queue_state.json")
    ap.add_argument("--log_dir", default="queue_logs")
    ap.add_argument("--resume", action="store_true",
                    help="continue a previous queue from --state")
    ap.add_argument("--retry_failed", action="store_true",
                    help="with --resume: reset failed jobs' attempt "
                    "counters so they run again (otherwise a job that "
                    "exhausted its retries stays failed forever)")
    args = ap.parse_args()

    os.makedirs(args.log_dir, exist_ok=True)
    if args.jobs_file:
        with open(args.jobs_file) as f:
            args.jobs += [
                ln.strip()
                for ln in f
                if ln.strip() and not ln.lstrip().startswith("#")
            ]
    if args.resume and os.path.exists(args.state):
        state = json.load(open(args.state))
        for job in state["jobs"]:
            # a job left 'running' by a killed queue never finished; run it
            if job["status"] == "running":
                job["status"] = "pending"
                job["attempts"] = max(0, job["attempts"] - 1)
            if args.retry_failed and job["status"] == "failed":
                job["status"] = "pending"
                job["attempts"] = 0
    else:
        if not args.jobs:
            ap.error("no jobs given")
        state = {
            "jobs": [
                {"cmd": j, "status": "pending", "attempts": 0}
                for j in args.jobs
            ]
        }

    def save():
        with open(args.state, "w") as f:
            json.dump(state, f, indent=2)

    failed = 0
    for i, job in enumerate(state["jobs"]):
        if job["status"] == "done":
            continue
        name = os.path.basename(str(job["cmd"])).replace("/", "_")[:80]
        log_path = os.path.join(args.log_dir, f"{i:03d}-{name}.log")
        while job["attempts"] <= args.retries:
            job["attempts"] += 1
            job["status"] = "running"
            save()
            print(f"[queue] ({i+1}/{len(state['jobs'])}) attempt "
                  f"{job['attempts']}: {job['cmd']}")
            rc = run_job(job["cmd"], log_path)
            if rc == 0:
                job["status"] = "done"
                save()
                break
            print(f"[queue] FAILED rc={rc}; log: {log_path}")
            job["status"] = "failed"
            save()
        failed += job["status"] != "done"
    print(f"[queue] finished: "
          f"{sum(j['status'] == 'done' for j in state['jobs'])} done, "
          f"{failed} failed")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
