"""Product quantization (PQ) for embedding compression + ANN search.

The 100 TB vector story: raw float32 embeddings are 4·d bytes/row (256 B
at d=64); PQ stores ``m`` one-byte codes (8 B at m=8) — a 32× reduction
that turns a 25 TB embedding column into sub-TB, scannable in full, while
asymmetric-distance computation (ADC) against a per-query lookup table
preserves ranking quality (Jégou/Douze/Schmid, PAMI 2011 — the
construction FAISS ships as IVF-PQ). int8 scalar quantization
(:func:`datarepo_spark.functions.similarity.quantize_int8`) is the 4×
sibling; PQ is what you use when the corpus, not the query rate, is the
problem.

Distributed shape (mirrors :mod:`datarepo_spark.functions.ivf`):
  - fit: ONE bounded sample collect (deterministic hash order), then m
    independent ksub-means in numpy on the driver — codebooks are
    m × ksub × dsub floats (~128 KB at defaults), broadcast by closure.
  - encode: Arrow-batched ``mapInPandas`` argmin per subspace — the
    legitimate Pandas-UDF tier (d×ksub flops/row of real math); output
    is (id, codes array<int>), the thing a production table persists.
  - search: ADC is a vectorized per-batch table lookup over the CODES
    only (vectors are never touched), then an exact re-rank of the top
    ``k × refine`` candidates against the raw vectors — the standard
    refine step that recovers exact-metric ordering among survivors.

Cosine note: vectors are L2-normalized before subspace split, so the sum
of per-subspace inner products IS the cosine; the ADC score is a direct
cosine approximation and the refine step re-ranks by exact cosine.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .similarity import knn_brute_force


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _kmeans(mat: np.ndarray, k: int, iterations: int) -> np.ndarray:
    """Plain Lloyd k-means (L2) on a small in-memory matrix; init = first
    k rows of the (hash-ordered, hence deterministic) sample."""
    centroids = np.array(mat[:k], dtype=np.float64)
    for _ in range(iterations):
        # (n, k) distances via the expanded form; n and k are sample-sized
        d2 = (
            (mat * mat).sum(axis=1)[:, None]
            - 2.0 * (mat @ centroids.T)
            + (centroids * centroids).sum(axis=1)[None, :]
        )
        cells = np.argmin(d2, axis=1)
        for c in range(k):
            members = mat[cells == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


class ProductQuantizer:
    """``m`` subspace codebooks of ``ksub`` centroids each; codes are the
    per-subspace argmin indices."""

    def __init__(self, codebooks: np.ndarray) -> None:
        self.codebooks = np.asarray(codebooks, dtype=np.float64)
        if self.codebooks.ndim != 3:
            raise ValueError("codebooks must be (m, ksub, dsub)")

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def ksub(self) -> int:
        return self.codebooks.shape[1]

    @property
    def dsub(self) -> int:
        return self.codebooks.shape[2]

    @property
    def dim(self) -> int:
        return self.m * self.dsub

    # -- fitting -----------------------------------------------------------

    @classmethod
    def fit(
        cls,
        df: DataFrame,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        m: int = 8,
        ksub: int = 256,
        iterations: int = 8,
        seed: int = 42,
        sample_size: Optional[int] = 4096,
    ) -> "ProductQuantizer":
        """Train on a deterministic hash-ordered sample (FAISS-style: a
        PQ codebook at ksub ≪ sample_size is statistically saturated by
        a few thousand vectors; the corpus-sized work — encoding — stays
        distributed)."""
        rows = (
            df.select(vec_col)
            .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
            .limit(sample_size or 4096)
            .collect()
        )
        mat = _normalize(
            np.array([np.asarray(r[0], dtype=np.float64) for r in rows])
        )
        dim = mat.shape[1]
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m {m}")
        dsub = dim // m
        k = min(ksub, len(mat))
        books = np.stack(
            [
                _kmeans(
                    np.ascontiguousarray(mat[:, j * dsub : (j + 1) * dsub]),
                    k,
                    iterations,
                )
                for j in range(m)
            ]
        )
        return cls(books)

    # -- encoding ----------------------------------------------------------

    def encode(
        self,
        df: DataFrame,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> DataFrame:
        """(id, codes array<int>) — the compressed representation a
        production pipeline persists next to (or instead of) the raw
        vectors. Arrow-batched argmin per subspace."""
        books = self.codebooks
        m, dsub = self.m, self.dsub

        def per_batch(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                mat = _normalize(
                    np.array(
                        [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                    )
                )
                codes = np.empty((len(mat), m), dtype=np.int32)
                for j in range(m):
                    sub = mat[:, j * dsub : (j + 1) * dsub]
                    book = books[j]
                    d2 = (
                        (sub * sub).sum(axis=1)[:, None]
                        - 2.0 * (sub @ book.T)
                        + (book * book).sum(axis=1)[None, :]
                    )
                    codes[:, j] = np.argmin(d2, axis=1)
                yield pd.DataFrame(
                    {id_col: pdf[id_col], "codes": list(codes)}
                )

        out_schema = T.StructType(
            [
                df.select(id_col).schema.fields[0],
                T.StructField(
                    "codes", T.ArrayType(T.IntegerType(), False), False
                ),
            ]
        )
        return df.select(id_col, vec_col).mapInPandas(
            per_batch, schema=out_schema
        )

    # -- search ------------------------------------------------------------

    def adc_table(self, query_vec: list[float]) -> np.ndarray:
        """(m, ksub) lookup table of per-subspace inner products with the
        normalized query; sum of m lookups ≈ cosine(query, vector)."""
        q = np.asarray(query_vec, dtype=np.float64)
        q = q / (np.linalg.norm(q) or 1.0)
        dsub = self.dsub
        return np.stack(
            [
                self.codebooks[j] @ q[j * dsub : (j + 1) * dsub]
                for j in range(self.m)
            ]
        )

    def adc_scores(
        self, codes_df: DataFrame, query_vec: list[float]
    ) -> DataFrame:
        """Append ``approx_cosine`` computed from the codes alone — the
        full-corpus scan that touches 8 B/row instead of 256 B/row."""
        table = self.adc_table(query_vec)
        m = self.m

        @F.pandas_udf(T.DoubleType())
        def adc(codes: pd.Series) -> pd.Series:
            mat = np.stack(codes.to_numpy())
            return pd.Series(table[np.arange(m), mat].sum(axis=1))

        return codes_df.withColumn("approx_cosine", adc(F.col("codes")))

    def search(
        self,
        df: DataFrame,
        query_vec: list[float],
        k: int = 10,
        refine: int = 4,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        codes: Optional[DataFrame] = None,
    ) -> DataFrame:
        """ANN top-k: ADC scan over codes → top ``k × refine`` candidates
        (TakeOrderedAndProject — never a full sort) → exact cosine
        re-rank of the survivors against the raw vectors. Pass ``codes``
        (a persisted :meth:`encode` output — the production layout) to
        skip re-encoding."""
        scored = self.adc_scores(
            codes if codes is not None else self.encode(df, vec_col, id_col),
            query_vec,
        )
        cand_ids = (
            scored.orderBy(F.desc("approx_cosine"), F.asc(id_col))
            .limit(k * refine)
            .select(id_col)
        )
        # candidate set is ≤ k·refine rows — always broadcast the semi join
        survivors = df.join(F.broadcast(cand_ids), id_col, "left_semi")
        return knn_brute_force(survivors, query_vec, k, vec_col, id_col)


def ivfpq_search(
    ivf_index,
    pq: ProductQuantizer,
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    refine: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    assigned_codes: Optional[DataFrame] = None,
) -> DataFrame:
    """IVF-PQ: the FAISS production composition. The coarse quantizer
    prunes the corpus to ``nprobe`` cells (partition-prunable when the
    table is laid out by cell), PQ's ADC scores the survivors from their
    8-byte codes, and the top ``k × refine`` re-rank by exact cosine.

    At 100 TB: the scan reads nprobe/k_cells of the corpus AND only the
    code column within it — the two reductions compose multiplicatively.
    ``assigned_codes``: a persisted (id, vector, cell, codes) table — the
    production layout; without it both assignments run inline."""
    if assigned_codes is None:
        assigned = ivf_index.assign(df, vec_col, id_col)
        codes = pq.encode(df, vec_col, id_col)
        assigned_codes = assigned.join(codes, id_col)
    cells = ivf_index.probe_cells(query_vec, nprobe)
    survivors = assigned_codes.filter(F.col("cell").isin(cells))
    scored = pq.adc_scores(survivors.select(id_col, "codes"), query_vec)
    cand_ids = (
        scored.orderBy(F.desc("approx_cosine"), F.asc(id_col))
        .limit(k * refine)
        .select(id_col)
    )
    return knn_brute_force(
        df.join(cand_ids, id_col, "left_semi"), query_vec, k, vec_col, id_col
    )
