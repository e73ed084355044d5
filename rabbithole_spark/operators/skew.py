"""Skew mitigation for shuffle joins: key salting.

AQE's skew-join splitting (on by default, session.py) handles most
skew by splitting oversized *partitions*; salting handles the harder
case — a single join KEY too hot for any partition split, e.g. the
null-ish tenant or a celebrity id in a 100 TB fact table.

The pattern: the large side appends a salt in [0, salt_factor) derived
from a uniqueness column (deterministic across task retries — never
rand()); the small side is exploded to every salt value (salt_factor x
replication of the SMALL side only). The join key becomes
(key, salt), so the hot key's rows spread over salt_factor reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str | list[str],
    salt_from: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the large side's hot keys spread across ``salt_factor``
    reducers.

    ``salt_from`` is a column of the large side whose values vary
    within a key group (an id, a timestamp) — the salt is
    ``xxhash64(salt_from) mod salt_factor``, deterministic on retry.
    Result equals ``large.join(small, on, how)`` ONLY for join types
    that never emit unmatched SMALL-side rows — the explode replicates
    the small side salt_factor times, so a right/full/outer join would
    emit every unmatched small row once PER SALT (round-9 review:
    silently wrong row counts); such types are rejected loudly.
    """
    normalized = how.lower().replace("_", "")
    if normalized not in (
        "inner", "left", "leftouter", "semi", "leftsemi", "anti", "leftanti"
    ):
        raise ValueError(
            f"salted_join cannot express {how!r}: the exploded small "
            "side would emit unmatched rows once per salt — use a "
            "plain join (AQE skew splitting) for right/full outer"
        )
    keys = [on] if isinstance(on, str) else list(on)
    for df_, side in ((large, "large"), (small, "small")):
        if "__salt" in df_.columns:
            raise ValueError(
                f"the {side} side already carries a __salt column — "
                "salted_join would clobber and then drop it"
            )
    salt = F.pmod(F.xxhash64(F.col(salt_from)), F.lit(salt_factor)).cast("int")
    l_salted = large.withColumn("__salt", salt)
    # sequence(int, int) already yields array<int> — no re-cast needed
    s_salted = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    joined = l_salted.join(s_salted, [*keys, "__salt"], how)
    return joined.drop("__salt")
