"""Compute the next driver-window rotation: which registered queries have
never received a driver verdict (no key in any CORRECTNESS_r*.json), and
which have their latest verdict red.

Usage: python scripts/next_window.py
Prints three lists to paste into registry._DRIVER_WINDOW for the next
round: latest-red (re-land first), never-checked, and the current window
for reference.
"""

from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, ".")


def main() -> int:
    from ai_powered_data_pipeline_assistant_spark import registry

    all_q = list(registry.all_queries())
    window = list(registry._DRIVER_WINDOW)

    latest: dict[str, dict] = {}
    for path in sorted(
        glob.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    ):
        with open(path) as fh:
            for name, verdict in json.load(fh).items():
                latest[name] = verdict

    never = [q for q in all_q if q not in latest]
    red = [
        name
        for name, v in latest.items()
        if v.get("err") or v.get("hash_match") is False or v.get("rows_match") is False
    ]
    green = [n for n in latest if n not in red]

    print(f"registry: {len(all_q)} queries; driver verdicts: {len(latest)} "
          f"({len(green)} green, {len(red)} red); never-checked: {len(never)}")
    print("\nlatest-red (re-land these first):")
    for n in red:
        print(f"  {n}")
    print("\nnever-checked:")
    for n in never:
        print(f"  {n}")
    print("\ncurrent window (50):")
    oracles = registry.all_oracles()
    bad = []
    for n in window[:50]:
        mark = "red" if n in red else ("new" if n in never else "green")
        oracle_mark = "" if n in oracles else " NO-ORACLE"
        if n not in oracles:
            bad.append(n)
        print(f"  {n} [{mark}]{oracle_mark}")
    if bad:
        # A rows-only entry in the window burns a slot on a guaranteed-red
        # `no_oracle` verdict (round 5 burned two on array-returning
        # queries). Schema representability additionally needs
        # `driver_sim.py --window`, which builds the frames.
        print(f"\nERROR: window entries without oracles: {bad}")
        print("Run `python scripts/driver_sim.py --window` for the full schema gate.")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
