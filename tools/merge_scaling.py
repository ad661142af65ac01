"""Combine stage-interleaved scaling artifacts into one min-of-all
reading.

Host memory bandwidth swings 2-4x minute-to-minute (BASELINE.md), so
the scaling gate is a noise-floor estimate: per (stage, cores) cell,
the minimum over every draw ever taken on the same code + same frozen
workload size. This tool merges the ``all_sec``/``all_cold_sec``
arrays of N ``BENCH_SCALING*.json`` files (produced by
``bench.py --scaling-stages``) and recomputes the efficiency with the
same formula the harness uses, so evidence from multiple sessions
accumulates instead of being thrown away per run.

Usage: python tools/merge_scaling.py OUT.json IN1.json IN2.json ...
"""

from __future__ import annotations

import json
import sys

STAGES = ("compact", "merge", "zorder", "hilbert")


def merge(paths: list[str]) -> dict:
    runs = [json.load(open(p)) for p in paths]
    n_clips = {r["n_clips"] for r in runs}
    if len(n_clips) != 1:
        raise SystemExit(f"mixed n_clips {sorted(n_clips)}: not comparable")
    n = n_clips.pop()
    cores = sorted(
        {int(k.split("[")[1].rstrip("]")) for r in runs for k in r["runs"]}
    )
    lo, hi = cores[0], cores[-1]

    def gather(c: int, key: str) -> dict[str, list[float]]:
        return {
            s: [
                v
                for r in runs
                for v in r["runs"].get(f"local[{c}]", {}).get(key, {}).get(s, [])
                if v
            ]
            for s in STAGES
        }

    # carry the unioned draw arrays in the output so a merged artifact
    # can itself be merged again — evidence accumulates across sessions
    hot = {c: gather(c, "all_sec") for c in (lo, hi)}
    cold = {c: gather(c, "all_cold_sec") for c in (lo, hi)}

    def mins(c: int) -> dict[str, float]:
        out = {}
        for s in STAGES:
            vals = hot[c][s] + cold[c][s]
            if not vals:
                raise SystemExit(f"no samples for {s} at {c} cores")
            out[s] = min(vals)
        return out

    m_lo, m_hi = mins(lo), mins(hi)
    sum_lo, sum_hi = sum(m_lo.values()), sum(m_hi.values())
    thr_lo, thr_hi = 4 * n / sum_lo, 4 * n / sum_hi
    ratio = hi / lo
    return {
        "metric": "scaling_efficiency",
        "mode": "stage-interleaved (merged min over "
        f"{len(paths)} artifacts)",
        "value": round(thr_hi / (ratio * thr_lo), 3),
        "unit": "ratio",
        "n_clips": n,
        "sources": paths,
        "runs": {
            f"local[{c}]": {
                "maintenance_clips_per_sec": round(4 * n / s, 1),
                "maintenance_sec": round(s, 3),
                "stages_sec": {k: round(v, 3) for k, v in m.items()},
                "all_sec": hot[c],
                "all_cold_sec": cold[c],
            }
            for c, m, s in ((lo, m_lo, sum_lo), (hi, m_hi, sum_hi))
        },
        "speedup": round(thr_hi / thr_lo, 3),
        "cores_ratio": ratio,
    }


if __name__ == "__main__":
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    out = merge(sys.argv[2:])
    with open(sys.argv[1], "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
