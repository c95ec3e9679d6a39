"""Skew-mitigation join: salting for hot keys.

AQE's skew-join handles moderate skew by splitting oversized partitions,
but a single pathological key (one user with 10⁸ events joining a dim
row) still lands every matching probe row on one task pair. Salting
splits THAT key's rows across ``salt`` sub-partitions deterministically:
the big side gets a salt derived from its full row hash, the small side
is replicated once per salt value, and the join key becomes
(key, salt). Cost: small side × salt replication — use for
big ⋈ small joins where broadcast is too large but skew is fatal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Join with the hot-key fan-out spread over ``salt`` sub-keys.
    Result is row-identical to ``big.join(small, on, how)``."""
    big_salted = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt)).cast("int"),
    )
    small_salted = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return big_salted.join(small_salted, [*on, "__salt"], how).drop("__salt")
