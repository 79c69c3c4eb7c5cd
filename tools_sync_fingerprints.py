"""Sync QUERY_FPS.json — the retire-from-rotation fingerprint baseline.

Run at ROUND START, before any code edits: the driver's CORRECTNESS
artifacts land on exactly the previous round's final commit, so the live
fingerprints at that moment are the fingerprints of driver-verified code.
For every query with an ever-green driver row, record its current
fingerprint; ``_driver_checked`` then retires a query only while its live
fingerprint still matches, so any later edit to the query, its module, or
its oracle re-fronts it for external re-verification (the r5 advice:
name-only retirement never re-verified changed queries).

Usage: python tools_sync_fingerprints.py
"""

from __future__ import annotations

import json
import os

import __spark_entry__ as entry


def main() -> int:
    oracles = entry.oracle_sql()
    fps = entry.query_fingerprints(entry.queries(), oracles)
    green = entry._ever_green(set(oracles))
    out = {name: fps[name] for name in sorted(green) if name in fps}
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "QUERY_FPS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {len(out)} fingerprints to {path}")
    return 0


if __name__ == "__main__":
    main()
