"""Compare two bench runs with canary normalization.

Usage: python tools/compare_bench.py OLD_DETAIL.json NEW_DETAIL.json

Why: round-over-round walls on this box drift up to ~2x with host load
on IDENTICAL code (NOTES_r10/NOTES_r11 receipts). BENCH_DETAIL.json
carries `canary_pre_sec`/`canary_post_sec` (a fixed data-independent
JVM job) since r11; this tool reports per-query ratios both RAW and
normalized by the mean canary, so a real regression separates from
machine noise. Older detail files without a canary fall back to raw.
"""

from __future__ import annotations

import json
import sys


def _canary(d: dict) -> float | None:
    pre, post = d.get("canary_pre_sec"), d.get("canary_post_sec")
    if pre is not None and post is not None:
        return (pre + post) / 2
    return d.get("canary_sec")


def main() -> int:
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    oq, nq = old["queries"], new["queries"]
    co, cn = _canary(old), _canary(new)
    scale = (co and cn) and (cn / co) or None
    common = sorted(k for k in oq if k in nq and oq[k] > 0)
    print(f"overlap: {len(common)} queries")
    print(f"old total {sum(oq[k] for k in common):.1f}s  "
          f"new total {sum(nq[k] for k in common):.1f}s")
    if scale:
        print(f"canary old {co:.3f}s new {cn:.3f}s -> machine scale "
              f"{scale:.2f}x (normalized ratios divide by this)")
        if (new.get("canary_pre_sec") or 0) > 0 and (
            new.get("canary_post_sec") or 0
        ) > 0:
            swing = new["canary_pre_sec"] / new["canary_post_sec"]
            if max(swing, 1 / swing) > 1.5:
                print(f"WARNING: new run's canary swung "
                      f"{max(swing, 1 / swing):.1f}x pre->post — "
                      "mid-run host noise; treat per-query deltas "
                      "with suspicion")
    rows = []
    for k in common:
        raw = nq[k] / oq[k]
        rows.append((raw / scale if scale else raw, raw, k))
    rows.sort(reverse=True)
    label = "norm" if scale else "raw"
    print(f"\nworst 10 by {label} ratio:")
    for adj, raw, k in rows[:10]:
        print(f"  {k}: raw {raw:.2f}x"
              + (f"  norm {adj:.2f}x" if scale else ""))
    print(f"\nbest 5 by {label} ratio:")
    for adj, raw, k in rows[-5:]:
        print(f"  {k}: raw {raw:.2f}x"
              + (f"  norm {adj:.2f}x" if scale else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
