"""Check real-data validation runs against the reference's published
numbers (the final job of scripts/validate/queue.jobs — see VALIDATE.md).

The reference repo has no equivalent: its published accuracies live in
README table images (`/root/reference/assets/tab1-4.png`) and run-log
comments inside scripts (`/root/reference/scripts/fewshot/
eval_fewshot-MN.sh:3-40`), checked by eye. Here every gate is a JSON
record naming the run directory, the metric, the target, the tolerance,
and the source table, so a queue pass/fail is mechanical.

Gate kinds:
  jsonl_max  — max of `key` over the run's metrics.jsonl rows
               (best-so-far metrics like best_acc already carry their
               own max; taking max is a no-op for those)
  log_regex  — last match of `pattern` group 1 across the run's *.log
               files (evals like fewshot/zeroshot report to the log)

Exit 0 iff every hard gate measured >= target - tol. Soft gates print
but never fail. A missing run fails its hard gates (the queue did not
produce it).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys


def _jsonl_max(run_dir: str, key: str):
    path = os.path.join(run_dir, "metrics.jsonl")
    if not os.path.exists(path):
        return None
    best = None
    with open(path) as f:
        for ln in f:
            try:
                row = json.loads(ln)
            except json.JSONDecodeError:
                continue
            v = row.get(key)
            if v is not None and (best is None or v > best):
                best = v
    return best


def _log_regex(run_dir: str, pattern: str):
    rx = re.compile(pattern)
    last = None
    for path in sorted(glob.glob(os.path.join(run_dir, "*.log"))):
        with open(path, errors="replace") as f:
            for ln in f:
                m = rx.search(ln)
                if m:
                    last = float(m.group(1))
    return last


def check(gates_path: str, root: str) -> int:
    spec = json.load(open(gates_path))
    failed = 0
    wname = max(len(g["name"]) for g in spec["gates"])
    for g in spec["gates"]:
        run_dir = os.path.join(root, g["run"])
        if g["kind"] == "jsonl_max":
            value = _jsonl_max(run_dir, g["key"])
        elif g["kind"] == "log_regex":
            value = _log_regex(run_dir, g["pattern"])
        else:
            raise ValueError(f"unknown gate kind {g['kind']!r}")
        floor = g["target"] - g["tol"]
        if value is None:
            status, bad = "MISSING", g["hard"]
        elif value >= floor:
            status, bad = "ok", False
        else:
            status, bad = "FAIL", g["hard"]
        failed += bad
        shown = "—" if value is None else f"{value:.4f}"
        print(
            f"{g['name']:<{wname}}  {shown:>8}  vs >= {floor:.4f} "
            f"(target {g['target']} tol {g['tol']}"
            f"{'' if g['hard'] else ', soft'})  {status}"
        )
        if status != "ok":
            print(f"{'':<{wname}}  source: {g['source']}")
    print(f"validation gates: {len(spec['gates']) - failed}"
          f"/{len(spec['gates'])} passed")
    return 1 if failed else 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gates", default="scripts/validate/gates.json")
    ap.add_argument("--root", default="runs_validate",
                    help="run_dir the queue wrote to; gate 'run' paths "
                    "are <proj>/<exp> under it")
    args = ap.parse_args()
    sys.exit(check(args.gates, args.root))


if __name__ == "__main__":
    main()
