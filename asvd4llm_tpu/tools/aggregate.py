"""Result aggregation (ref tools/mmlu_result_calc.py:1-21, minus the
eval() of text lines): read output/results.jsonl records and average
per-task accuracies, e.g. the 57 MMLU subtask accs into one number."""

from __future__ import annotations

import json
import sys


def aggregate_mmlu(results_path: str = "output/results.jsonl",
                   prefix: str = "hendrycksTest-") -> dict:
    accs: dict[str, float] = {}
    with open(results_path) as f:
        for line in f:
            rec = json.loads(line)
            for task, metrics in rec.get("results", {}).items():
                if task.startswith(prefix) and isinstance(metrics, dict) \
                        and "acc" in metrics:
                    accs[task] = metrics["acc"]  # last record wins
    if not accs:
        return {"n_tasks": 0, "mean_acc": None}
    return {"n_tasks": len(accs), "mean_acc": sum(accs.values()) / len(accs),
            "per_task": accs}


def main(argv=None):
    path = (argv or sys.argv[1:] or ["output/results.jsonl"])[0]
    out = aggregate_mmlu(path)
    print(json.dumps({k: v for k, v in out.items() if k != "per_task"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
