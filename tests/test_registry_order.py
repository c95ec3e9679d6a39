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


def test_changed_this_round_entries_lead():
    from bunsen_spark.queries import _CHANGED_THIS_ROUND

    import __spark_entry__ as e

    names = list(e.queries())
    # code-touched queries occupy the very first positions, in their
    # listed order — their existing driver rows predate the code
    assert names[: len(_CHANGED_THIS_ROUND)] == _CHANGED_THIS_ROUND


def test_new_entries_precede_already_checked_ones():
    from bunsen_spark.queries import _CHANGED_THIS_ROUND, _DRIVER_ORDER

    import __spark_entry__ as e

    names = list(e.queries())
    known = set(_DRIVER_ORDER) | set(_CHANGED_THIS_ROUND)
    first_checked = next(
        i for i, n in enumerate(names)
        if n in set(_DRIVER_ORDER) and n not in set(_CHANGED_THIS_ROUND)
    )
    # every brand-new (unknown) entry sorts before the first merely-
    # stale already-driver-checked entry
    for i, n in enumerate(names):
        if n not in known:
            assert i < first_checked, f"{n} registered after checked entries"


def test_stalest_first_within_checked_group():
    from bunsen_spark.queries import _CHANGED_THIS_ROUND, _DRIVER_ORDER

    import __spark_entry__ as e

    names = list(e.queries())
    checked = [
        n for n in names
        if n in set(_DRIVER_ORDER) and n not in set(_CHANGED_THIS_ROUND)
    ]
    ranks = [_DRIVER_ORDER.index(n) for n in checked]
    assert ranks == sorted(ranks), "checked group must stay stalest-first"


def test_every_query_has_an_oracle():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    missing = [n for n in q if n not in o]
    assert missing == [], f"rows-only entries present: {missing}"
