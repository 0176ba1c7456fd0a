#!/usr/bin/env python
"""Render SCALE_AUDIT.json (probe → sf → {sec, shuffle_read}) as the
SCALE.md wall-time/growth markdown table. Growth columns are
t(sf1)/t(sf0.1) and shuffle(sf1)/shuffle(sf0.1); zero-shuffle probes
print sh-growth "0". Usage: python tools/render_scale_table.py
[SCALE_AUDIT.json]"""

from __future__ import annotations

import json
import sys


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "SCALE_AUDIT.json"
    d = json.load(open(path))
    print("| probe | sf0.001 | sf0.01 | sf0.1 | sf1 | t-growth | sh-growth |")
    print("|---|---|---|---|---|---|---|")
    for probe, by_sf in d.items():
        cells = []
        for sf in ("0.001", "0.01", "0.1", "1"):
            e = by_sf.get(sf)
            cells.append(f"{e['sec']:.3f}" if e else "—")
        lo, hi = by_sf.get("0.1"), by_sf.get("1")
        if lo and hi:
            tg = f"{hi['sec'] / lo['sec']:.2f}"
            if lo["shuffle_read"] == 0 and hi["shuffle_read"] == 0:
                sg = "0"
            elif lo["shuffle_read"] == 0:
                sg = "n/a"
            else:
                sg = f"{hi['shuffle_read'] / lo['shuffle_read']:.1f}"
        else:
            tg = sg = "—"
        print(f"| {probe} | {' | '.join(cells)} | {tg} | {sg} |")


if __name__ == "__main__":
    main()
