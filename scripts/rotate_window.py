"""Regenerate registry._WINDOW_PRIORITY for the next round's rotation.

The external driver hash-checks only the FIRST 50 keys in
``__spark_entry__.queries()`` order per round (CORRECTNESS_r{N}.json).
The standing freshness rule (tests/test_registry_order.py) orders keys:

  1. never externally checked (new ops that landed behind a sealed
     window, or keys that somehow never got a row),
  2. ops CHANGED this round (pass via --changed),
  3. ops NEW this round (pass via --new; they are already tier 1 if
     they have no external row, so this tier mostly orders them),
  4. everything else by STALENESS ascending (round of latest external
     evidence, oldest first) with the current relative order as the
     tiebreak.

Prints the full priority list as python source ready to paste into
registry._WINDOW_PRIORITY, plus the window/tier arithmetic the
registry-order test pins. Purely a planning tool: it writes nothing.

Usage:
    python scripts/rotate_window.py --changed op1,op2 --new op3
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from connor_fun_streamproducer_spark import registry  # noqa: E402

WINDOW = 50


def latest_external_round() -> dict[str, int]:
    """key -> newest round whose CORRECTNESS file carries ANY result row
    for it (hash or rows-only; an err row still counts as evidence the
    driver ran the key — staleness is about coverage recency)."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.load(open(path))
        except Exception:
            continue
        for key in data:
            latest[key] = max(latest.get(key, 0), rnd)
    return latest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--changed", default="", help="comma-separated keys changed this round")
    ap.add_argument("--new", dest="new_ops", default="", help="comma-separated keys new this round")
    args = ap.parse_args()
    changed = [k for k in args.changed.split(",") if k]
    new_ops = [k for k in args.new_ops.split(",") if k]

    keys = list(registry.queries())
    pos = {k: i for i, k in enumerate(keys)}
    latest = latest_external_round()
    unknown = [k for k in changed + new_ops if k not in pos]
    if unknown:
        sys.exit(f"not registered: {unknown}")

    never = [k for k in keys if k not in latest and k not in changed and k not in new_ops]
    tier2 = [k for k in changed if k not in never]
    tier3 = [k for k in new_ops if k not in never and k not in tier2]
    head = never + tier2 + tier3
    rest = [k for k in keys if k not in head]
    rest.sort(key=lambda k: (latest.get(k, 0), pos[k]))
    order = head + rest

    print(f"# window = first {WINDOW}; tiers: {len(never)} never-checked"
          f" + {len(tier2)} changed + {len(tier3)} new"
          f" + {max(0, WINDOW - len(head))} stalest (oldest evidence"
          f" r{latest.get(rest[0], 0) if rest else '-'})")
    print("_WINDOW_PRIORITY = [")
    for k in order:
        print(f'    "{k}",')
    print("]")
    behind = order[WINDOW:]
    print("\n# next round's stale-front input (first 14 behind the window):")
    for k in behind[:14]:
        print(f"#   {k}  (r{latest.get(k, 0)})")


if __name__ == "__main__":
    main()
