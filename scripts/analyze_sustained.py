#!/usr/bin/env python
"""Summarize a training run's metrics.jsonl (loop.py logging windows).

    python scripts/analyze_sustained.py outputs/sustained_r4/metrics.jsonl

Separates steady-state logging windows from compile/eval/checkpoint-
polluted ones by a simple robust rule: a window is "steady" when its
steps_per_sec is within 40% of the run's 75th-percentile steps_per_sec
(compile and eval stalls depress steps_per_sec by integer factors;
honest jitter does not). Prints one JSON line with steady-state
samples/s + MFU — the numbers BASELINE's "sustained product loop"
section quotes against bench_train's fold predictions."""

from __future__ import annotations

import json
import sys


def main(argv=None):
    path = (argv or sys.argv[1:])[0]
    rows = [json.loads(l) for l in open(path) if l.strip()]
    train = [r for r in rows if "samples_per_sec" in r]
    if not train:
        print(json.dumps({"error": "no training windows"}))
        return 1
    sps = sorted(r["steps_per_sec"] for r in train)
    p75 = sps[int(0.75 * (len(sps) - 1))]
    steady = [r for r in train if r["steps_per_sec"] >= 0.6 * p75]
    stalled = [r for r in train if r not in steady]

    def agg(key, rs):
        vals = [r[key] for r in rs if key in r]
        return (round(sum(vals) / len(vals), 2) if vals else None)

    out = {
        "windows_total": len(train),
        "windows_steady": len(steady),
        "steps": max(r["step"] for r in rows),
        "steady_samples_per_sec": agg("samples_per_sec", steady),
        "steady_steps_per_sec": agg("steps_per_sec", steady),
        "steady_mfu_pct": agg("mfu_pct", steady),
        "all_samples_per_sec": agg("samples_per_sec", train),
        "stalled_windows_samples_per_sec": agg("samples_per_sec", stalled),
        "final_loss": train[-1].get("loss"),
        "eval_losses": [round(r["eval_loss"], 4) for r in rows
                        if "eval_loss" in r],
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
