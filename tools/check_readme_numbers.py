"""Guard: README's headline performance table must match the latest
measured BENCH_r*.json (r2 and r3 verdicts both flagged stale docs).

Compares the README performance table's numbers against the newest
driver-recorded bench JSON within a tolerance that absorbs tunnel
run-to-run variance (±10% per ROADMAP) but catches real staleness
(e.g. 116 ms in the README vs 103.7 ms measured).

Run directly (`python tools/check_readme_numbers.py`), via
`make check-docs`, or through tests/test_aux.py.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOL = 0.12  # relative; must exceed the tunnel's ±10% run-to-run variance
# (ROADMAP) or a re-bench of IDENTICAL code can flip the guard red — the
# r4 round shipped red exactly that way. 12% still catches real
# staleness (the guard exists for 26-52% drifts like r4's unsynced
# seg-decode rewrite); refresh the README whenever a measured number
# moves past it


def latest_bench() -> dict | None:
    """Newest bench record by round: the driver's BENCH_r{N}.json, or a
    builder-measured BENCH_LOCAL_r{N}.json (written by running bench.py
    by hand right after perf-affecting commits, so the README can be
    synced to the code that will be driver-benched rather than to the
    previous round's binaries). Within a round the driver's record wins."""
    recs = []
    for path in glob.glob(os.path.join(REPO, "BENCH_*r*.json")):
        m = re.search(r"BENCH_(LOCAL_)?r(\d+)\.json$", path)
        if not m:
            continue
        recs.append((int(m.group(2)), 0 if m.group(1) else 1, path))
    if not recs:
        return None
    _, _, best = max(recs)
    with open(best) as f:
        rec = json.load(f)
    return rec.get("parsed")


def readme_numbers(text: str) -> dict:
    """Extract the headline numbers from the README performance table."""
    out = {}
    m = re.search(
        r"Classification inference.*?\*\*([\d,]+) clouds/s\*\*", text
    )
    if m:
        out["cls_clouds_per_sec"] = float(m.group(1).replace(",", ""))
    m = re.search(r"Classification inference.*?\*\*(\d+)×\*\*", text)
    if m:
        out["cls_vs_baseline"] = float(m.group(1))
    m = re.search(r"Part-seg inference.*?\*\*([\d,]+) clouds/s\*\*", text)
    if m:
        out["partseg_clouds_per_sec"] = float(m.group(1).replace(",", ""))
    m = re.search(r"(\d+(?:\.\d+)?) ms/step at B=192", text)
    if m:
        out["pretrain_step_ms"] = float(m.group(1))
    m = re.search(r"\*\*(\d+\.\d+)× the whole node", text)
    if m:
        out["pretrain_vs_node"] = float(m.group(1))
    return out


def check() -> list[str]:
    parsed = latest_bench()
    if parsed is None:
        return []  # nothing measured yet (fresh clone)
    detail = parsed.get("detail", {})
    with open(os.path.join(REPO, "README.md")) as f:
        text = f.read()
    doc = readme_numbers(text)
    measured = {
        "cls_clouds_per_sec": parsed.get("value"),
        "cls_vs_baseline": parsed.get("vs_baseline"),
        "partseg_clouds_per_sec": detail.get("partseg_clouds_per_sec"),
        "pretrain_step_ms": detail.get("pretrain_step_ms_b192"),
        "pretrain_vs_node": detail.get("pretrain_vs_baseline_node"),
    }
    errors = []
    for key, want in measured.items():
        if want is None:
            continue
        got = doc.get(key)
        if got is None:
            errors.append(f"README is missing the {key} headline number")
            continue
        rel = abs(got - want) / max(abs(want), 1e-9)
        if rel > TOL:
            errors.append(
                f"README {key} = {got} but latest bench measured {want} "
                f"({rel:.0%} off; refresh the performance table)"
            )
    # hardcoded test counts drift every round; the README must not have one
    if re.search(r"\d+ tests", text):
        errors.append(
            "README hardcodes a test count; say 'the test suite' instead"
        )
    return errors


def main() -> int:
    errors = check()
    for e in errors:
        print(f"STALE-DOCS: {e}", file=sys.stderr)
    if not errors:
        print("README performance numbers match the latest bench JSON")
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
