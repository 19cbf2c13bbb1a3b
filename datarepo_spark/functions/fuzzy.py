"""Fuzzy string matching: edit-distance self-join via deletion-
neighborhood blocking (FastSS; Bocek et al. 2007 — the standard exact
blocking for small edit distances).

The completeness fact: if ``ed(a, b) <= k`` then the sets of strings
obtainable from ``a`` and from ``b`` by deleting **up to** ``k``
characters intersect (delete the edited positions from each side).
So candidate pairs come from an EQUI-join on deletion variants — never
a cross join — and an exact ``levenshtein`` verify on the carried
originals filters false candidates. Sound and complete: the output
equals the brute-force all-pairs edit-distance filter.

Scale shape (same skeleton as the LSH dedups):
- variants explode JVM-side (one codegen stage over the key column
  only — document payloads never enter);
- :func:`~datarepo_spark.functions.dedup.bucket_pairs` turns variant
  buckets into a streamed pair list with the degenerate-bucket cap,
  carrying both original strings as payload;
- verification is an inline ``levenshtein`` projection, no join back.

Neighborhood size is C(len, k)-ish: k=1 costs len+1 variants per row,
k=2 ~len²/2 — use on KEY-like columns (names, codes, titles), not
documents. The per-variant substring lambdas are higher-order
functions (interpreted, not codegen) — fine at key volume, which is
why this lives beside, not inside, the corpus-scale gram pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import bucket_pairs


def deletion_variants(s: Column, k: int = 1) -> Column:
    """Distinct strings obtainable from ``s`` by deleting 0..k chars."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    arr = F.array(s)
    for _ in range(k):
        deleted = F.flatten(
            F.transform(
                arr,
                lambda v: F.transform(
                    F.sequence(
                        F.lit(1), F.greatest(F.length(v), F.lit(1))
                    ),
                    lambda i: F.concat(
                        v.substr(F.lit(1), i - 1),
                        v.substr(i + 1, F.length(v)),
                    ),
                ),
            )
        )
        arr = F.array_distinct(F.concat(arr, deleted))
    return arr


def fuzzy_join_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    max_distance: int = 1,
    max_bucket_size: int = 2_000,
) -> DataFrame:
    """All pairs (id_a < id_b) whose ``key_col`` values are within
    ``max_distance`` edits — exactly the brute-force result, via
    deletion-variant blocking. Returns (id_a, id_b, key_a, key_b,
    distance)."""
    if max_distance < 1:
        raise ValueError(
            f"max_distance must be >= 1, got {max_distance}"
        )
    variants = df.select(
        F.col(id_col),
        F.col(key_col).alias("__key"),
        F.explode(
            deletion_variants(F.col(key_col), max_distance)
        ).alias("__var"),
    )
    cands = bucket_pairs(
        variants,
        ["__var"],
        id_col,
        max_bucket_size=max_bucket_size,
        payload_cols=["__key"],
    )
    return (
        cands.select(
            "id_a",
            "id_b",
            F.col("__key_a").alias("key_a"),
            F.col("__key_b").alias("key_b"),
            F.levenshtein(F.col("__key_a"), F.col("__key_b")).alias(
                "distance"
            ),
        )
        .filter(F.col("distance") <= max_distance)
    )


def fuzzy_link(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_id: str,
    right_id: str,
    max_distance: int = 1,
    max_bucket_size: int = 2_000,
) -> DataFrame:
    """Cross-FRAME record linkage: all (left row, right row) pairs whose
    ``key_col`` values are within ``max_distance`` edits — the A×B form
    of :func:`fuzzy_join_pairs` (entity resolution across two tables).
    Candidates come from an equi-join of the two sides' deletion
    neighborhoods (never a cross join); verification is an inline
    levenshtein; the multi-variant duplicate collapse is one distinct
    over the (small) candidate pair stream. Variants appearing on more
    than ``max_bucket_size`` rows of EITHER side are dropped (the same
    degenerate-bucket cap fuzzy_join_pairs inherits from bucket_pairs —
    e.g. the empty-string variant every 1-char key produces would
    otherwise cross |L|x|R|). Returns
    (left_id, right_id, key_left, key_right, distance)."""
    if max_distance < 1:
        raise ValueError(f"max_distance must be >= 1, got {max_distance}")

    def side(df: DataFrame, id_c: str, tag: str) -> DataFrame:
        return df.select(
            F.col(id_c).alias(f"{tag}_id"),
            F.col(key_col).alias(f"key_{tag}"),
            F.explode(
                deletion_variants(F.col(key_col), max_distance)
            ).alias("__var"),
        )

    lhs = side(left, left_id, "left")
    rhs = side(right, right_id, "right")

    def capped(df: DataFrame) -> DataFrame:
        counts = (
            df.groupBy("__var")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_bucket_size)
            .select("__var")
        )
        return df.join(counts, "__var", "left_semi")

    return (
        capped(lhs).join(capped(rhs), "__var")
        .select(
            "left_id",
            "right_id",
            "key_left",
            "key_right",
            F.levenshtein(F.col("key_left"), F.col("key_right")).alias(
                "distance"
            ),
        )
        .filter(F.col("distance") <= max_distance)
        .distinct()
    )
