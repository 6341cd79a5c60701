"""Regenerate tests/fixtures_registry_pin.json after a DELIBERATE
registry change (a gate-window rotation, a new in-window query, an
oracle-SQL edit). The pin exists to catch ACCIDENTAL reorders and SQL
drift — regenerate it in the SAME commit as the deliberate change so
the diff shows exactly which keys moved and which oracle hashes
changed.

Run: python tools/regen_registry_pin.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as entrymod

    qs = list(entrymod.queries())
    osql = entrymod.oracle_sql()
    fix = {
        "key_order": qs,
        "window": qs[:50],
        "oracle_sha256": {
            k: hashlib.sha256(v.encode()).hexdigest()
            for k, v in sorted(osql.items())
        },
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "fixtures_registry_pin.json",
    )
    with open(path, "w") as f:
        json.dump(fix, f, indent=1, sort_keys=True)
    print(f"pinned {len(qs)} keys ({len(osql)} oracle-backed) -> {path}")


if __name__ == "__main__":
    main()
