"""Aggregate expr_r3 protocol-sweep results into one table (stdout +
expr_r3/RESULTS_TABLE.md). Sequences whose child was killed before
writing summary.json are recovered from their sweep_log*.txt run lines."""
import glob
import json
import os
import re
import sys

import numpy as np

out_dir = sys.argv[1] if len(sys.argv) > 1 else "expr_r3"
per_seq = {}

for path in sorted(glob.glob(os.path.join(out_dir, "*", "summary.json"))):
    with open(path) as f:
        data = json.load(f)
    for seq, r in data.items():
        runs = r["runs"]
        per_seq[seq] = {
            "runs": len(runs),
            "frames": runs[0]["target"] if runs else 0,
            "rmse": [x["rmse"] for x in runs],
            "completion": r["completion"],
            "fps": [x["fps"] for x in runs],
            "src": "summary",
        }

pat = re.compile(
    r"(\S+) run(\d+): rmse=([\d.]+)cm mean=[\d.]+cm "
    r"frames=(\d+)/(\d+) lost=\d+ fps=([\d.]+)"
)
for path in sorted(glob.glob(os.path.join(out_dir, "*", "sweep_log*.txt"))):
    for line in open(path, errors="ignore"):
        m = pat.match(line.strip())
        if not m:
            continue
        seq = m.group(1)
        if seq in per_seq and per_seq[seq]["src"] == "summary":
            continue
        e = per_seq.setdefault(seq, {
            "runs": 0, "frames": int(m.group(5)), "rmse": [],
            "completion": 0.0, "fps": [], "src": "log", "_done": [],
        })
        e["runs"] += 1
        e["rmse"].append(float(m.group(3)) / 100.0)
        e["fps"].append(float(m.group(6)))
        e["_done"].append(int(m.group(4)) == int(m.group(5)))
for e in per_seq.values():
    if e["src"] == "log":
        e["completion"] = float(np.mean(e["_done"])) if e["_done"] else 0.0

lines = ["| sequence | frames | runs | ATE RMSE | completion | fps | src |",
         "|---|---|---|---|---|---|---|"]
for seq in sorted(per_seq):
    e = per_seq[seq]
    lines.append(
        f"| {seq} | {e['frames']} | {e['runs']} | "
        f"{np.mean(e['rmse'])*100:.2f} ± {np.std(e['rmse'])*100:.2f} cm | "
        f"{e['completion']*100:.0f}% | {np.mean(e['fps']):.1f} | {e['src']} |"
    )
table = "\n".join(lines)
print(table)
with open(os.path.join(out_dir, "RESULTS_TABLE.md"), "w") as f:
    f.write(table + "\n")
