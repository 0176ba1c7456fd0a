#!/usr/bin/env python
"""Merge N scale_audit.py JSON outputs by per-(probe, sf) minimum —
multiple audit sessions approximate steady state better than one
(Python-worker pool churn and GC make single-session numbers noisy for
the codec-heavy probes). Emits the merged JSON and a markdown table
ready for SCALE.md.

    python tools/merge_audits.py merged.json a.json b.json [...]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out_path, *ins = sys.argv[1:]
    merged: dict[str, dict[str, dict]] = {}
    for path in ins:
        d = json.load(open(path))
        for probe, sfs in d.items():
            for sf, cell in sfs.items():
                cur = merged.setdefault(probe, {}).setdefault(sf, {})
                if "sec" in cell:
                    cur["sec"] = min(cur.get("sec", float("inf")), cell["sec"])
                if "shuffle_read" in cell and "shuffle_read" not in cur:
                    cur["shuffle_read"] = cell["shuffle_read"]
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)

    print("| probe | sf0.001 | sf0.01 | sf0.1 | sf1 | t-growth | sh-growth |")
    print("|---|---|---|---|---|---|---|")
    for probe, sfs in merged.items():
        def sec(sf):
            v = sfs.get(sf, {}).get("sec")
            return f"{v:.3f}" if v is not None else "skipped"

        t01 = sfs.get("0.1", {}).get("sec")
        t1 = sfs.get("1", {}).get("sec")
        s01 = sfs.get("0.1", {}).get("shuffle_read")
        s1 = sfs.get("1", {}).get("shuffle_read")
        tg = f"{t1 / t01:.2f}" if t01 and t1 else "—"
        if s01 and s1:
            sg = f"{s1 / s01:.1f}"
        elif t1 is not None and (s01 in (0, None) or s1 in (0, None)):
            sg = "0"
        else:
            sg = "—"
        print(
            f"| {probe} | {sec('0.001')} | {sec('0.01')} | {sec('0.1')} "
            f"| {sec('1')} | {tg} | {sg} |"
        )


if __name__ == "__main__":
    main()
