"""Sync QUERY_FPS.json — the retire-from-rotation fingerprint baseline.

Run at ROUND START, before any code edits: the driver's CORRECTNESS
artifacts land on exactly the previous round's final commit, so the live
fingerprints at that moment are the fingerprints of driver-verified code.

Refresh rule (tightened after a harness review): only queries with a GREEN
row in the LATEST round artifact get their baseline refreshed to the
current fingerprint — they are the ones the driver actually just verified
at this commit. Previously-recorded baselines for everything else are
PRESERVED as-is: re-baselining every ever-green query silently retired
code the 50-slot sample never re-verified (its edited fingerprint became
the "verified" baseline). A query with a NON-green row in the latest
artifact (hash mismatch / error) has its baseline DELETED so it re-fronts
even if its code did not change since an older green round.

Usage: python tools_sync_fingerprints.py
"""

from __future__ import annotations

import glob
import json
import os

import __spark_entry__ as entry


def _latest_rows() -> dict:
    here = os.path.dirname(os.path.abspath(__file__))
    paths = sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")))
    if not paths:
        return {}
    with open(paths[-1]) as f:
        return json.load(f)


def main() -> int:
    oracles = entry.oracle_sql()
    base = entry._base_queries()
    fps = entry.query_fingerprints(base, oracles)
    latest = _latest_rows()
    latest_green = {
        name
        for name, rec in latest.items()
        if rec.get("hash_match")
        or (rec.get("err") == "no_oracle" and name not in oracles)
    }
    latest_red = set(latest) - latest_green

    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "QUERY_FPS.json")
    try:
        with open(path) as f:
            recorded = json.load(f)
    except Exception:
        recorded = {}

    out = {
        name: fp
        for name, fp in recorded.items()
        if name not in latest_red and name in fps
    }
    for name in sorted(latest_green):
        if name in fps:
            out[name] = fps[name]
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    refreshed = len(latest_green)
    print(
        f"wrote {len(out)} baselines to {path} "
        f"({refreshed} refreshed from the latest green rows, "
        f"{len(latest_red)} red entries evicted, rest preserved)"
    )
    return 0


if __name__ == "__main__":
    main()
