"""Calibration-normalized bench comparison (round-7 verdict item 1).

Bench totals from different rounds were measured on differently-loaded
hosts — the r6 official artifact read 1.5x of r5 with ZERO code changes
in the regressing queries, purely because the driver window's
calibration shuffle ran 0.187s vs 0.156s (and 2.055s on the SCALE
re-run). Every bench JSON records ``cal_shuffle_sec`` for exactly this;
this script does the division so a reader never compares raw seconds
across windows.

Usage:
    python scripts/bench_compare.py NEW.json BASE.json [--fence 2.0]

Prints per-query raw ratio AND calibration-normalized ratio
(ratio / (cal_new / cal_base)), the geomean of each over the common
query set, and the queries breaching the fence after normalization.
Exits 1 if any normalized ratio breaches the fence (so it can gate).
"""

from __future__ import annotations

import ast
import json
import math
import sys


def load(path: str) -> tuple[dict[str, float], float, dict]:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and "queries" not in d:
        # driver wrapper format (BENCH_r01.json): the bench line lives
        # under "parsed", as a python-repr string in old rounds —
        # literal_eval parses the repr'd dict without executing anything
        p = d["parsed"]
        d = ast.literal_eval(p) if isinstance(p, str) else p
    qs = {
        k: float(v)
        for k, v in d.get("queries", {}).items()
        if isinstance(v, (int, float)) and v > 0
    }
    # estimator fields default to None (= unknown), NOT to 1: pre-r8
    # printed-line artifacts omit them even though they were measured
    # with min-of-2 iteratives — defaulting to 1 made a like-for-like
    # comparison against such a base emit a spurious mismatch WARN
    meta = {
        "minof_iterative": d.get("minof_iterative"),
        "minof_threshold_sec": d.get("minof_threshold_sec"),
        "repeated": set(d.get("repeats", {})),
    }
    return qs, float(d.get("cal_shuffle_sec") or 0.0), meta


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    fence = 2.0
    for a in sys.argv[1:]:
        if a.startswith("--fence"):
            fence = float(a.split("=", 1)[1]) if "=" in a else fence
    if len(args) != 2:
        print(__doc__)
        return 2
    new_q, new_cal, new_meta = load(args[0])
    base_q, base_cal, base_meta = load(args[1])
    cal_factor = (new_cal / base_cal) if new_cal and base_cal else 1.0
    common = sorted(set(new_q) & set(base_q))
    if not common:
        print("no common queries")
        return 2
    # estimator parity: min-of-N totals are systematically lower than
    # single-run totals — flag apples-to-oranges comparisons instead of
    # letting calibration normalization imply they're like-for-like.
    # Warn only when BOTH sides carry an explicit, differing value: a
    # side with None simply predates the descriptor fields (its
    # estimator is unknown, not single-run), so a mismatch cannot be
    # asserted.
    def _differs(a, b):
        return a is not None and b is not None and a != b

    def _any_none(*vals):
        return any(v is None for v in vals)

    if _any_none(
        new_meta["minof_iterative"],
        base_meta["minof_iterative"],
        new_meta["minof_threshold_sec"],
        base_meta["minof_threshold_sec"],
    ):
        # pre-r8 artifacts carry no estimator descriptor: parity can
        # neither be asserted nor refuted — say so instead of staying
        # silent (r9 ADVICE: silence reads as "parity established")
        print(
            "# NOTE estimator unknown on one side (descriptor fields "
            "absent) — min-of-N parity with the other side is NOT "
            "established; treat cross-artifact ratios as approximate"
        )
    if _differs(new_meta["minof_iterative"], base_meta["minof_iterative"]) or _differs(
        new_meta["minof_threshold_sec"], base_meta["minof_threshold_sec"]
    ):
        print(
            "# WARN estimator mismatch: new minof="
            f"{new_meta['minof_iterative']}/thr={new_meta['minof_threshold_sec']} "
            f"vs base minof={base_meta['minof_iterative']}/thr="
            f"{base_meta['minof_threshold_sec']} — min-of-N biases totals "
            "low vs single-run; per-query ratios where only one side "
            "repeated are marked *"
        )
    one_sided = new_meta["repeated"] ^ base_meta["repeated"]
    rows = []
    for q in common:
        raw = new_q[q] / base_q[q]
        rows.append((q, base_q[q], new_q[q], raw, raw / cal_factor))
    rows.sort(key=lambda r: -r[4])
    geo = lambda i: math.exp(sum(math.log(r[i]) for r in rows) / len(rows))  # noqa: E731
    print(
        f"# {len(common)} common queries; cal {base_cal:.3f} -> {new_cal:.3f} "
        f"(factor {cal_factor:.3f}); fence {fence}x (normalized)"
    )
    print(f"{'query':34} {'base_s':>8} {'new_s':>8} {'raw':>6} {'norm':>6}")
    breaches = []
    for q, b, n, raw, norm in rows:
        flag = " <-- BREACH" if norm > fence else ""
        if norm > fence:
            breaches.append(q)
        star = "*" if q in one_sided else " "
        print(f"{q:34} {b:8.2f} {n:8.2f} {raw:6.2f} {norm:6.2f}{star}{flag}")
    print(
        f"# geomean raw {geo(3):.3f}x | normalized {geo(4):.3f}x | "
        f"total {sum(r[1] for r in rows):.1f}s -> {sum(r[2] for r in rows):.1f}s"
    )
    if breaches:
        print(f"# {len(breaches)} normalized breach(es): {', '.join(breaches)}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
