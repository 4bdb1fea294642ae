"""Aggregate eval work-dir logs into the README-style results table.

Rebuild of dvt/utils/collect_results.py: scan work dirs for jsonl metric
logs, pick the best validation entry per task, print one row per
(model, variant) with VOC/ADE mIoU+mAcc and NYU RMSE/abs_rel/a1.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, Optional


def best_entry(log_path: str, key: str, maximize: bool = True) -> Optional[dict]:
    best = None
    with open(log_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                entry = json.loads(line)
            except json.JSONDecodeError:
                continue
            if key not in entry:
                continue
            if best is None or (
                entry[key] > best[key] if maximize else entry[key] < best[key]
            ):
                best = entry
    return best


def collect(work_root: str) -> Dict[str, dict]:
    """Scan <work_root>/<task_dir>/eval_metrics.json logs."""
    results = {}
    for log in glob.glob(
        os.path.join(work_root, "**", "eval_metrics.json"), recursive=True
    ):
        task_dir = os.path.relpath(os.path.dirname(log), work_root)
        # route by what the log actually contains (dir names are
        # user-chosen and e.g. "vitdet" in a seg dir would misroute);
        # ONE parse pass, keyed on the first metric the log carries
        entries = []
        with open(log) as f:
            for ln in f:
                ln = ln.strip()
                if ln:
                    try:
                        entries.append(json.loads(ln))
                    except json.JSONDecodeError:
                        continue
        key = next((k for k in ("mAP50", "mIoU", "a1")
                    if entries and k in entries[0]), None)
        if key:
            results[task_dir] = max(entries, key=lambda e: e.get(
                key, float("-inf")))
    return results


def print_table(results: Dict[str, dict]) -> str:
    lines = ["| task | metrics |", "|---|---|"]
    for task, entry in sorted(results.items()):
        metrics = ", ".join(
            f"{k}={v:.4g}" for k, v in entry.items()
            if isinstance(v, (int, float)) and k != "iteration"
        )
        lines.append(f"| {task} | {metrics} |")
    table = "\n".join(lines)
    print(table)
    return table


if __name__ == "__main__":
    import sys

    root = sys.argv[1] if len(sys.argv) > 1 else "./work_dirs"
    print_table(collect(root))
