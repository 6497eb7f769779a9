"""Skew mitigation for hot-key equi-joins: salting.

AQE's skew-join splitting (on in our session factory) handles most skew at
runtime by splitting oversized partitions, but it only applies to
sort-merge joins; a *structurally* hot key (one key = 30% of a 100 TB fact
table) is better handled by salting: the fact side scatters each hot key
across ``n_salt`` sub-keys, the dimension side replicates ``n_salt``-fold,
and the join key becomes (key, salt) — no single reducer sees the whole
hot key.

``salted_join`` is deterministic: the salt comes from hashing caller-named
fact columns (e.g. a row id), never ``rand()`` (re-computation under task
retry must land every row in the same bucket, or the join drops/dupes
rows — xxhash64 is stable across retries, executors, and Spark versions).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SALT = "_salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    salt_from: Sequence[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``on`` with an ``n_salt``-way scatter.

    ``salt_from``: fact columns whose hash distributes rows (use a unique
    or near-unique id). ``how`` supports inner / left joins (the dim side
    is the replicated one; right/full joins would multiply dim rows).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_fact = fact.withColumn(
        SALT, F.pmod(F.xxhash64(*[F.col(c) for c in salt_from]), F.lit(n_salt))
    )
    replicated_dim = dim.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return salted_fact.join(
        replicated_dim, [*on, SALT], how
    ).drop(SALT)
