"""Registry-order invariants: the driver's correctness gate samples a
registration-order PREFIX, so ordering is a correctness-visibility
contract, not cosmetics."""

from __future__ import annotations


def test_queries_and_oracles_align_exactly():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert list(q) == list(o), "registry order must match between dicts"
    assert set(q) == set(o)


def test_never_driver_checked_entries_lead():
    from bunsen_spark.queries import _DRIVER_ORDER, _NEVER_DRIVER_CHECKED

    import __spark_entry__ as e

    names = list(e.queries())
    waiting = _DRIVER_ORDER[:_NEVER_DRIVER_CHECKED]
    # the 15 entries that have never had a driver row occupy the very
    # first positions, in their listed order
    assert names[: len(waiting)] == waiting


def test_new_entries_precede_already_checked_ones():
    from bunsen_spark.queries import _DRIVER_ORDER, _NEVER_DRIVER_CHECKED

    import __spark_entry__ as e

    names = list(e.queries())
    known = set(_DRIVER_ORDER)
    first_checked = next(
        i
        for i, n in enumerate(names)
        if n in known
        and _DRIVER_ORDER.index(n) >= _NEVER_DRIVER_CHECKED
    )
    # every brand-new (unknown-to-_DRIVER_ORDER) entry sorts before the
    # first already-driver-checked entry
    for i, n in enumerate(names):
        if n not in known:
            assert i < first_checked, f"{n} registered after checked entries"


def test_every_query_has_an_oracle():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    missing = [n for n in q if n not in o]
    assert missing == [], f"rows-only entries present: {missing}"
