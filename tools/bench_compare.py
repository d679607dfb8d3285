"""Cross-round bench comparison, normalized by the calibration probe.

    python tools/bench_compare.py BENCH_r09.json BENCH_local.json

For every query present in both payloads, prints old/new medians, the
raw ratio, and — when BOTH payloads carry a `calibration` field (round
10 onward) — the NORMALIZED ratio raw / (cal_new / cal_old), which
cancels the sandbox compute envelope (VERDICT r9 task 2: rounds 8 and 9
both burned forensic effort proving uniform shifts environmental; the
calibration ratio answers it by construction). A normalized ratio near
1.0 means the query's cost moved with the environment; far from 1.0
means the code (or plan) changed — check plans_audit/ diffs next.

Calibration medians use min(first, last) of each session: the probe
job is fixed, so its best observation is the least-noisy estimate of
the envelope.
"""

from __future__ import annotations

import json
import sys


def _cal(payload: dict) -> float | None:
    c = payload.get("calibration")
    if not c:
        return None
    return min(c["first"], c["last"])


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    def load(path: str) -> dict:
        payload = json.load(open(path))
        # the driver's BENCH_r{N}.json wraps (and may truncate) the
        # bench line; prefer its parsed field, else require the repo's
        # durable BENCH_local.json shape
        if "queries" not in payload and isinstance(payload.get("parsed"), dict):
            payload = payload["parsed"]
        if "queries" not in payload:
            raise SystemExit(
                f"{path}: no queries field (driver tail truncated?) — "
                "use the round's committed BENCH_local.json "
                "(git show <round-commit>:BENCH_local.json)"
            )
        return payload

    old = load(sys.argv[1])
    new = load(sys.argv[2])
    co, cn = _cal(old), _cal(new)
    env = (cn / co) if (co and cn) else None
    if env is not None:
        print(f"calibration: old={co}s new={cn}s env ratio={env:.3f}")
    else:
        print(
            "calibration: absent in one side — raw ratios only "
            "(first calibrated round is the anchor for the next)"
        )
    common = sorted(set(old["queries"]) & set(new["queries"]))
    rows = []
    for name in common:
        o, n = old["queries"][name], new["queries"][name]
        raw = n / o if o else float("inf")
        norm = raw / env if env else None
        rows.append((name, o, n, raw, norm))
    rows.sort(key=lambda r: -(r[4] if r[4] is not None else r[3]))
    hdr = f"{'query':34s} {'old':>8s} {'new':>8s} {'raw':>6s}"
    if env is not None:
        hdr += f" {'norm':>6s}"
    print(hdr)
    for name, o, n, raw, norm in rows:
        line = f"{name:34s} {o:8.3f} {n:8.3f} {raw:6.2f}"
        if norm is not None:
            line += f" {norm:6.2f}"
        print(line)
    tot_o = sum(old["queries"][n] for n in common)
    tot_n = sum(new["queries"][n] for n in common)
    raw_t = tot_n / tot_o
    line = (
        f"{'TOTAL (common subset)':34s} {tot_o:8.2f} {tot_n:8.2f} {raw_t:6.2f}"
    )
    if env is not None:
        line += f" {raw_t / env:6.2f}"
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
