"""The Python-UDF surface, one example per tier (SURVEY.md §2B UDF rows).

These are *pattern references* for where the engine allows Python in the
plan — every production operator in this repo prefers built-in column
expressions (JVM, codegen), and each docstring says when the tier is
justified. Tiers, fastest first:

  1. pandas_udf scalar      Arrow-vectorized column fn (numpy per batch)
  2. pandas_udf GROUPED_AGG vectorized custom aggregate
  3. applyInPandas          whole-group DataFrame in/out (grouped map)
  4. udtf                   one row in → N typed rows out (table function)

Row-at-a-time ``F.udf`` is intentionally absent: it serializes per row and
is strictly dominated by tier 1.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def log1p_vec(values: pd.Series) -> pd.Series:
    """Tier 1: Arrow-batched scalar transform. Justified when the math
    exists in numpy/scipy but not in pyspark.sql.functions (here log1p is
    illustrative — F.log1p exists and would be preferred)."""
    import numpy as np

    return pd.Series(np.log1p(values.to_numpy()))


@F.pandas_udf(T.DoubleType())
def weighted_mean(values: pd.Series, weights: pd.Series) -> float:
    """Tier 2: GROUPED_AGG — a custom aggregate over Arrow batches.
    math.fsum keeps the result independent of row order (exactly-rounded
    sum), so distributed shuffling can't change the answer."""
    num = math.fsum((values * weights).tolist())
    den = math.fsum(weights.tolist())
    return num / den if den else 0.0


def zscore_per_group(
    df: DataFrame,
    value_col: str,
    keys: list[str],
    out_col: str = "zscore",
) -> DataFrame:
    """Tier 3: applyInPandas grouped map — the whole group as one pandas
    DataFrame. Justified for algorithms that genuinely need the full group
    in memory (rank transforms, per-group model fits); memory bound =
    largest single group, so key skew matters at scale."""
    # NB: StructType.add mutates in place (it would corrupt df's cached
    # schema) — build a fresh StructType.
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = pdf[value_col].mean()
        std = pdf[value_col].std(ddof=1)
        pdf[out_col] = (
            (pdf[value_col] - mean) / std if std and std > 0 else 0.0
        )
        return pdf

    return df.groupBy(*keys).applyInPandas(per_group, schema=schema)


def sentence_split_udtf():
    """Tier 4: a Python UDTF (Spark 3.5+) — one row in, N typed rows out.
    Returns the UDTF class registered-ready; lazily defined so importing
    this module never requires the UDTF runtime."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence: string, n_words: int")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            for raw in text.replace("!", ".").replace("?", ".").split("."):
                sentence = raw.strip()
                if sentence:
                    yield sentence, len(sentence.split())

    return SentenceSplit
