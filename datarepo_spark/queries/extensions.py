"""LLM-pipeline extension queries: dedup, similarity, text, multimodal,
splits/sampling, contamination.

Registered into the shared REGISTRY next to the relational surface. EVERY
query carries a hard DuckDB oracle. Engine-portable arithmetic (sha256,
regexp counts, sequential double folds) is recomputed directly; pipelines
with engine-specific internals are gated through their output contract
instead — brute-force ground truth where recall is provably or
empirically 100% (SimHash pigeonhole banding, MinHash on the cleanly
separated gate corpus), or exact-payload + accuracy-contract-boolean
where the estimate itself is engine-specific (ANN recall, HLL rsd).
Brute-force recall guarantees additionally live in
tests/test_functions.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dedup as D
from ..functions import multimodal as M
from ..functions import similarity as S
from ..functions import text as X
from .registry import SQL_DSUM, dsum, load, register

# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "text_token_stats",
    oracle=rf"""
    SELECT doc_id,
           CAST(LEN(text) AS INT) AS n_chars_actual,
           CAST({X.sql_token_count('text', X.WS_TOKEN_RE)} AS INT) AS n_tokens_ws,
           CAST({X.sql_token_count('text', X.BPE_TOKEN_RE)} AS INT) AS n_tokens_bpe,
           CAST({X.sql_token_count('text', X.PUNCT_RE)} AS INT) AS n_punct
    FROM documents
    """,
    description="token counting: whitespace + BPE-ish regex + punctuation",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return X.text_stats(docs).select(
        "doc_id", "n_chars_actual", "n_tokens_ws", "n_tokens_bpe", "n_punct"
    )


@register(
    "text_quality_score",
    oracle=rf"""
    WITH m AS (
      SELECT doc_id,
             {X.sql_quality_inputs('text')}
      FROM documents
    )
    SELECT doc_id,
           {X.SQL_QUALITY_FORMULA} AS quality
    FROM m
    """,
    description="heuristic quality score (Gopher/C4-style ratio filters)",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", X.quality_score(F.col("text")).alias("quality"))


def _lang_oracle() -> str:
    profiles = {
        lang: X.sql_token_count("lower(text)", pat)
        for lang, pat in X.LANG_PROFILES
    }
    cjk = X.sql_token_count("text", X.CJK_RE)
    return rf"""
    WITH s AS (
      SELECT doc_id,
             {profiles['en']} AS s_en, {profiles['es']} AS s_es,
             {profiles['de']} AS s_de, {profiles['fr']} AS s_fr,
             {cjk} AS c_cjk
      FROM documents
    )
    SELECT doc_id,
           CASE
             WHEN c_cjk > 0 THEN 'zh'
             WHEN s_en > 0 AND s_es <= s_en AND s_de <= s_en AND s_fr <= s_en
               THEN 'en'
             WHEN s_es > 0 AND s_en < s_es AND s_de <= s_es AND s_fr <= s_es
               THEN 'es'
             WHEN s_de > 0 AND s_en < s_de AND s_es < s_de AND s_fr <= s_de
               THEN 'de'
             WHEN s_fr > 0 AND s_en < s_fr AND s_es < s_fr AND s_de < s_fr
               THEN 'fr'
             ELSE 'unknown'
           END AS lang_detected
    FROM s
    """


@register(
    "text_language_id",
    oracle=_lang_oracle(),
    description="language-ID via stopword-profile heuristic (CJK trump)",
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", X.detect_language(F.col("text")).alias("lang_detected")
    )


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id, {X.sql_fingerprint('text')} AS fingerprint
    FROM documents
    """,
    description="document fingerprint: polynomial rolling hash over tokens",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", X.fingerprint(F.col("text")).alias("fingerprint")
    )


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@register(
    "dedup_exact_sha256",
    oracle="""
    SELECT MIN(doc_id) AS doc_id
    FROM documents
    GROUP BY sha256(lower(trim(text)))
    """,
    description="exact dedup on sha256(normalized text), min-id survivor",
)
def dedup_exact_sha256(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.exact_dedup(docs).select("doc_id")


@register(
    "dedup_ngram_jaccard",
    oracle=r"""
    WITH sh AS (
      SELECT doc_id,
             LIST_DISTINCT(LIST_TRANSFORM(
               RANGE(1, GREATEST(LEN(toks) - 2, 0) + 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             )) AS grams
      FROM (
        SELECT doc_id,
               LIST_FILTER(regexp_split_to_array(lower(text), '\s+'),
                           t -> LEN(t) > 0) AS toks
        FROM documents WHERE doc_id < 40
      )
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(LEN(LIST_INTERSECT(a.grams, b.grams)) AS DOUBLE)
                 / LEN(LIST_DISTINCT(LIST_CONCAT(a.grams, b.grams))),
                 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(LEN(LIST_INTERSECT(a.grams, b.grams)) AS DOUBLE)
          / LEN(LIST_DISTINCT(LIST_CONCAT(a.grams, b.grams))) >= 0.1
    """,
    description="exact 3-gram Jaccard similarity over candidate pairs",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    sh = docs.select(
        "doc_id", D.shingles(F.col("text"), 3).alias("grams")
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("grams").alias("ga"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("grams").alias("gb"))
    sim = D.jaccard(F.col("ga"), F.col("gb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(sim >= 0.1)
        .select("id_a", "id_b", F.round(sim, 6).alias("jaccard"))
    )


@register(
    "dedup_minhash_lsh",
    # The output contract is "all pairs with exact 3-gram Jaccard ≥ t
    # among LSH candidates"; on the gate corpus LSH recall at t=0.5 is
    # 100% (pairs cluster at ≥0.9 or ≤0.2 — no borderline pairs for the
    # banding to miss), so brute-force Jaccard in DuckDB reproduces the
    # result exactly. The general recall guarantee lives in
    # tests/test_functions.py::test_verified_pairs_match_bruteforce.
    # Scale note (r3 verdict item 4): the naive all-pairs form is O(n²)
    # LIST_INTERSECTs and cannot run at bench scale. This form is EXACT,
    # not sampled: jaccard > 0 requires ≥1 shared gram, so the inverted-
    # index join enumerates every pair that can pass the threshold, and
    # |A∩B| = the shared-gram COUNT (s is LIST_DISTINCT), so
    # jaccard = c/(la+lb-c) with no per-pair list ops. sf0.1: 120 s → 1 s.
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             LIST_FILTER(regexp_split_to_array(lower(text), '\s+'),
                         t -> LEN(t) > 0) AS tk
      FROM documents
    ), sh AS (
      SELECT doc_id,
             LIST_DISTINCT(
               CASE WHEN LEN(tk) >= 3
                 THEN LIST_TRANSFORM(RANGE(1, LEN(tk) - 1),
                      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                 ELSE [COALESCE(LIST_AGGREGATE(tk, 'string_agg', ' '), '')]
               END) AS s
      FROM toks
    ), gr AS (
      SELECT doc_id, LEN(s) AS ln, UNNEST(s) AS g FROM sh
    ), cnts AS (
      SELECT x.doc_id AS id_a, y.doc_id AS id_b,
             ANY_VALUE(x.ln) AS la, ANY_VALUE(y.ln) AS lb,
             COUNT(*) AS c
      FROM gr x JOIN gr y ON x.g = y.g AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(CAST(c AS DOUBLE) / (la + lb - c), 6) AS jaccard
    FROM cnts
    WHERE ROUND(CAST(c AS DOUBLE) / (la + lb - c), 6) >= 0.5
    """,
    description="MinHash-LSH near-dup pairs (shingle→sig→band→bucket-join)",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.minhash_lsh_dedup_pairs(docs, threshold=0.5)


@register(
    "dedup_simhash",
    # portable=True derives the 60-bit signature from sha256 (identical in
    # every engine) instead of xxhash64, and banding recall for
    # hamming ≤ k is EXACTLY 100% by pigeonhole — so DuckDB can recompute
    # the whole pipeline (shingles → gram hash → per-bit votes → signature
    # → brute-force hamming) and must match bit for bit.
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             LIST_FILTER(regexp_split_to_array(lower(text), '\s+'),
                         t -> LEN(t) > 0) AS tk
      FROM documents
    ), grams AS (
      SELECT doc_id,
             UNNEST(LIST_DISTINCT(
               CASE WHEN LEN(tk) >= 2
                 THEN LIST_TRANSFORM(RANGE(1, LEN(tk)),
                      i -> tk[i] || ' ' || tk[i+1])
                 ELSE [COALESCE(LIST_AGGREGATE(tk, 'string_agg', ' '), '')]
               END)) AS g
      FROM toks
    ), hx AS (
      SELECT DISTINCT doc_id, SUBSTR(SHA256(g), 1, 15) AS h FROM grams
    ), bits AS (
      SELECT doc_id, i.bit,
             ((INSTR('0123456789abcdef',
                     SUBSTR(h, CAST(15 - (i.bit // 4) AS INT), 1)) - 1)
              >> (i.bit % 4)) & 1 AS b
      FROM hx, (SELECT UNNEST(RANGE(0, 60)) AS bit) i
    ), votes AS (
      SELECT doc_id, bit,
             SUM(CASE WHEN b = 1 THEN 1 ELSE -1 END) AS v
      FROM bits GROUP BY doc_id, bit
    ), sim AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN v > 0
                           THEN (CAST(1 AS BIGINT) << CAST(bit AS INT))
                           ELSE 0 END) AS BIGINT) AS sh
      FROM votes GROUP BY doc_id
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(BIT_COUNT(XOR(a.sh, b.sh)) AS INT) AS hamming
    FROM sim a JOIN sim b ON a.doc_id < b.doc_id
    WHERE BIT_COUNT(XOR(a.sh, b.sh)) <= 3
    """,
    description="SimHash near-dup pairs via banded hamming join "
    "(sha256-portable 60-bit signature)",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.simhash_dedup_pairs(docs, max_hamming=3, portable=True)


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH v AS (
      SELECT vec_id, label,
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), n AS (
      SELECT vec_id, label, e,
             SQRT(LIST_REDUCE(LIST_TRANSFORM(e, x -> x * x),
                              (a, x) -> a + x)) AS nrm
      FROM v
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(
             LIST_REDUCE(LIST_TRANSFORM(RANGE(1, 65),
                                        i -> a.e[i] * b.e[i]),
                         (acc, x) -> acc + x) / (a.nrm * b.nrm),
             6) AS cosine
    FROM n a JOIN n b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND(LIST_REDUCE(LIST_TRANSFORM(RANGE(1, 65),
                                           i -> a.e[i] * b.e[i]),
                            (acc, x) -> acc + x) / (a.nrm * b.nrm), 6) >= 0.9
    """,
    description="embedding cosine near-dup pairs, label-blocked join",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return D.embedding_near_dup_pairs(
        emb, threshold=0.9, block_col="label"
    )


@register(
    "dedup_semantic",
    # SemDeDup end to end: k-means cells block the cosine join, pairs
    # close transitively, min-id survives. The oracle is the UNBLOCKED
    # brute-force ground truth — parity therefore also certifies that
    # the cell blocking (with nprobe=2 multi-probe) lost no pair on
    # this corpus. Synthetic engineered-cluster semantics live in
    # tests/test_semantic_dedup.py.
    oracle="""
    WITH RECURSIVE v AS (
      SELECT vec_id,
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), n AS (
      SELECT vec_id, e,
             SQRT(LIST_REDUCE(LIST_TRANSFORM(e, x -> x * x),
                              (a, x) -> a + x)) AS nrm
      FROM v
    ), pairs AS MATERIALIZED (
      SELECT a.vec_id AS ia, b.vec_id AS ib
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      WHERE ROUND(LIST_REDUCE(LIST_TRANSFORM(RANGE(1, 65),
                                             i -> a.e[i] * b.e[i]),
                              (acc, x) -> acc + x) / (a.nrm * b.nrm),
                  6) >= 0.9
    ), edges AS (
      SELECT ia AS a, ib AS b FROM pairs
      UNION SELECT ib, ia FROM pairs
    ), reach AS (
      SELECT a AS id, a AS r FROM edges
      UNION
      SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id
    ), comp AS (
      SELECT id, MIN(r) AS component FROM reach GROUP BY id
    )
    SELECT emb.vec_id,
           COALESCE(c.component, emb.vec_id) AS component,
           (c.component IS NULL OR c.component = emb.vec_id) AS kept
    FROM embeddings emb LEFT JOIN comp c ON c.id = emb.vec_id
    """,
    description="SemDeDup semantic dedup: spherical k-means cells -> "
    "blocked cosine pairs -> components -> min-id survivor per cluster; "
    "oracle is unblocked brute force (blocking recall certified)",
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return D.semantic_dedup(emb, threshold=0.9, k=8, nprobe=2)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@register(
    "similarity_knn_brute_force",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), q AS (
      SELECT e AS qe,
             SQRT(LIST_REDUCE(LIST_TRANSFORM(e, x -> x * x),
                              (a, x) -> a + x)) AS qn
      FROM v WHERE vec_id = 0
    )
    SELECT vec_id,
           ROUND(
             LIST_REDUCE(LIST_TRANSFORM(RANGE(1, 65), i -> e[i] * qe[i]),
                         (acc, x) -> acc + x)
             / (SQRT(LIST_REDUCE(LIST_TRANSFORM(e, x -> x * x),
                                 (a, x) -> a + x)) * qn),
             6) AS cosine
    FROM v, q
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
    description="exact cosine top-k ANN baseline (TakeOrdered plan)",
)
def similarity_knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).head()["embedding"]
    return S.knn_brute_force(emb, [float(x) for x in query], k=10)


# Shared oracle for the ANN gate queries: the hard-checkable payload is
# the EXACT top-3 neighbors (id + cosine, DuckDB-recomputed); the ANN
# contract — its top-10 must recover ≥3 of the exact top-10 — rides along
# as a boolean, TRUE on both sides (the agg_approx_distinct pattern: the
# estimate itself is engine-specific, its accuracy contract is not).
# Random 64-d embeddings are the ANN worst case; measured recall@10 is
# 0.4–0.7 here vs ~0.02 for chance, so ≥3 is a meaningful bound with
# headroom against parameter drift.
_ANN_ORACLE = """
    WITH v AS (
      SELECT vec_id,
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), q AS (
      SELECT e AS qe,
             SQRT(LIST_REDUCE(LIST_TRANSFORM(e, x -> x * x),
                              (a, x) -> a + x)) AS qn
      FROM v WHERE vec_id = 0
    )
    SELECT vec_id,
           ROUND(
             LIST_REDUCE(LIST_TRANSFORM(RANGE(1, 65), i -> e[i] * qe[i]),
                         (acc, x) -> acc + x)
             / (SQRT(LIST_REDUCE(LIST_TRANSFORM(e, x -> x * x),
                                 (a, x) -> a + x)) * qn),
             6) AS cosine,
           TRUE AS recall_ok
    FROM v, q
    WHERE vec_id != 0
    ORDER BY cosine DESC, vec_id
    LIMIT 3
"""


def _ann_gate(
    ann_topk: DataFrame, exact_topk: DataFrame, min_hits: int = 3
) -> DataFrame:
    """exact top-3 rows + the ANN recall-contract boolean (distributed:
    the overlap count is a 1-row broadcast, never a collect)."""
    hits = ann_topk.select("vec_id").join(
        exact_topk.select("vec_id"), "vec_id", "left_semi"
    ).agg(F.count("*").alias("__hits"))
    top3 = exact_topk.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(3)
    return top3.crossJoin(F.broadcast(hits)).select(
        "vec_id",
        "cosine",
        (F.col("__hits") >= min_hits).alias("recall_ok"),
    )


@register(
    "similarity_ann_lsh",
    oracle=_ANN_ORACLE,
    description="LSH-bucketed ANN top-k (random hyperplanes, multi-probe) "
    "gated by exact top-3 + recall contract",
)
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).head()["embedding"]
    qv = [float(x) for x in query]
    base = emb.filter(F.col("vec_id") != 0)
    # 6 planes → 64 cells; home cell + 14 best 1/2-bit-flip probes scans
    # ~23% of the space. Plane count scales with corpus size (log n).
    lsh = S.RandomHyperplaneLSH(dim=64, n_planes=6, seed=7)
    ann = lsh.knn(base, qv, k=10, multi_probe=14)
    exact = S.knn_brute_force(base, qv, k=10)
    return _ann_gate(ann, exact)


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------


@register(
    "multimodal_features",
    # REAL codec path: each gate doc becomes a valid binary PPM (P6)
    # whose 8×8 RGB raster is the doc's bytes repeated to 192; the
    # engine PARSES the container (decode_ppm: magic, header fields,
    # raster) executor-side and emits per-channel means. The oracle
    # rebuilds the raster from the text (ASCII gate docs: chars ==
    # bytes) and recomputes the means — integer sums / 64, exact both
    # engines. Header "P6\n8 8\n255\n" is 11 bytes → n_bytes 203.
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             CASE WHEN text IS NULL OR text = '' THEN ' ' ELSE text END AS t
      FROM documents WHERE doc_id < 100
    ), p AS (
      SELECT media_id,
             SUBSTR(REPEAT(t, CAST(CEIL(192.0 / LEN(t)) AS INT)), 1, 192)
               AS px
      FROM m
    )
    SELECT media_id,
           CAST(203 AS BIGINT) AS n_bytes,
           ROUND(LIST_SUM(LIST_TRANSFORM(RANGE(0, 64),
             j -> ORD(SUBSTR(px, CAST(1 + j*3 AS INT), 1)))) / 64.0, 6)
             AS mean_r,
           ROUND(LIST_SUM(LIST_TRANSFORM(RANGE(0, 64),
             j -> ORD(SUBSTR(px, CAST(2 + j*3 AS INT), 1)))) / 64.0, 6)
             AS mean_g,
           ROUND(LIST_SUM(LIST_TRANSFORM(RANGE(0, 64),
             j -> ORD(SUBSTR(px, CAST(3 + j*3 AS INT), 1)))) / 64.0, 6)
             AS mean_b,
           CAST(8 AS INT) AS width,
           CAST(8 AS INT) AS height
    FROM p
    """,
    description="real PPM decode → image features via Arrow-batched "
    "mapInPandas",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    media = M.documents_as_ppm(docs)
    feats = M.extract_features(media, decoder=M.ppm_feature_decoder)
    return feats.select(
        "media_id",
        "n_bytes",
        F.round(F.element_at("features", 1), 6).alias("mean_r"),
        F.round(F.element_at("features", 2), 6).alias("mean_g"),
        F.round(F.element_at("features", 3), 6).alias("mean_b"),
        F.element_at("features", 4).cast("int").alias("width"),
        F.element_at("features", 5).cast("int").alias("height"),
    )


@register(
    "multimodal_video_frame_hashes",
    # REAL multi-frame path: a PVID container (magic + LE-u32 frame
    # count/size) of 4 binary PPMs, frame f's raster = the document
    # rotated by f chars; the engine WALKS the container and hashes
    # every frame; the oracle rebuilds each rotated raster and
    # recomputes the per-frame average-hash bit-for-bit.
    oracle=r"""
    WITH m AS (
      SELECT doc_id AS media_id, text AS t
      FROM documents WHERE doc_id < 40 AND LEN(text) >= 64
    ), fr AS (
      SELECT media_id, t, CAST(UNNEST(RANGE(0, 4)) AS INT) AS frame_no
      FROM m
    ), r AS (
      SELECT media_id, frame_no,
             SUBSTR(t, frame_no + 1) || SUBSTR(t, 1, frame_no) AS rot
      FROM fr
    ), p AS (
      SELECT media_id, frame_no,
             SUBSTR(REPEAT(rot, CAST(CEIL(192.0 / LEN(rot)) AS INT)),
                    1, 192) AS px
      FROM r
    ), l AS (
      SELECT media_id, frame_no,
             LIST_TRANSFORM(RANGE(0, 64), j ->
               (ORD(SUBSTR(px, CAST(1 + j*3 AS INT), 1))
                + ORD(SUBSTR(px, CAST(2 + j*3 AS INT), 1))
                + ORD(SUBSTR(px, CAST(3 + j*3 AS INT), 1))) // 3)
               AS luma
      FROM p
    )
    SELECT media_id, frame_no,
           LIST_AGGREGATE(
             LIST_TRANSFORM(luma, x ->
               CASE WHEN x > LIST_SUM(luma) // 64 THEN '1' ELSE '0' END),
             'string_agg', '') AS ahash
    FROM l
    """,
    description="video path: PVID container walk (magic, frame "
    "count/size, N binary PPM frames) → per-frame average-hash — the "
    "video dedup primitive; only 8-byte hashes leave the decode task",
)
def multimodal_video_frame_hashes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 40) & (F.length("text") >= 64)
    )
    media = M.documents_as_video(docs, n_frames=4)
    return M.video_frame_hashes(media).select(
        "media_id", "frame_no", "ahash"
    )


_AHASH_GATE_SQL = r"""
    WITH m AS (
      SELECT doc_id AS media_id, text AS t
      FROM documents WHERE doc_id < 50 AND LEN(text) >= 64
      UNION ALL
      SELECT doc_id + 1000 AS media_id,
             '~~~~~~' || SUBSTR(text, 7) AS t
      FROM documents WHERE doc_id < 50 AND LEN(text) >= 64
    ), p AS (
      SELECT media_id,
             SUBSTR(REPEAT(t, CAST(CEIL(192.0 / LEN(t)) AS INT)), 1, 192)
               AS px
      FROM m
    ), l AS (
      SELECT media_id,
             LIST_TRANSFORM(RANGE(0, 64), j ->
               (ORD(SUBSTR(px, CAST(1 + j*3 AS INT), 1))
                + ORD(SUBSTR(px, CAST(2 + j*3 AS INT), 1))
                + ORD(SUBSTR(px, CAST(3 + j*3 AS INT), 1))) // 3) AS luma
      FROM p
    )
"""


def _ahash_gate_corpus(spark: SparkSession, sf_dir: str):
    """Gate corpus: each document (doc_id < 50, ≥64 chars so one raster
    repetition ≤ 3 pixels) paired with a deterministic perturbed twin
    (first six bytes → '~'), so image-level near-duplicates EXIST by
    construction and both engines can rebuild the exact rasters. The
    ONE definition behind every _AHASH_GATE_SQL consumer — keep it in
    lockstep with that SQL."""
    docs = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 50) & (F.length("text") >= 64)
    )
    orig = docs.select("doc_id", "text")
    pert = docs.select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat(F.lit("~~~~~~"), F.expr("substring(text, 7)")).alias(
            "text"
        ),
    )
    return orig.unionByName(pert)


def _ahash_gate_media(spark: SparkSession, sf_dir: str):
    return M.documents_as_ppm(_ahash_gate_corpus(spark, sf_dir))


@register(
    "multimodal_video_near_dup",
    # Video-level dedup over the frame hashes: twin videos (the same
    # perturbed-prefix construction as the image gate) must match on
    # >= 2 distinct frames within hamming 3; distinct documents match
    # nothing (probed: 38/38 twins at 4/4 frames, zero cross matches).
    # The oracle recomputes every frame's bits and brute-forces the
    # frame-pair -> distinct-frame-count aggregation.
    oracle=r"""
    WITH m AS (
      SELECT doc_id AS media_id, text AS t
      FROM documents WHERE doc_id < 40 AND LEN(text) >= 64
      UNION ALL
      SELECT doc_id + 1000 AS media_id,
             '~~~~~~' || SUBSTR(text, 7) AS t
      FROM documents WHERE doc_id < 40 AND LEN(text) >= 64
    ), fr AS (
      SELECT media_id, t, CAST(UNNEST(RANGE(0, 4)) AS INT) AS frame_no
      FROM m
    ), r AS (
      SELECT media_id, frame_no,
             SUBSTR(t, frame_no + 1) || SUBSTR(t, 1, frame_no) AS rot
      FROM fr
    ), p AS (
      SELECT media_id, frame_no,
             SUBSTR(REPEAT(rot, CAST(CEIL(192.0 / LEN(rot)) AS INT)),
                    1, 192) AS px
      FROM r
    ), l AS (
      SELECT media_id, frame_no,
             LIST_TRANSFORM(RANGE(0, 64), j ->
               (ORD(SUBSTR(px, CAST(1 + j*3 AS INT), 1))
                + ORD(SUBSTR(px, CAST(2 + j*3 AS INT), 1))
                + ORD(SUBSTR(px, CAST(3 + j*3 AS INT), 1))) // 3)
               AS luma
      FROM p
    ), b AS (
      SELECT media_id, frame_no,
             LIST_TRANSFORM(luma, x ->
               CASE WHEN x > LIST_SUM(luma) // 64 THEN 1 ELSE 0 END)
               AS bits
      FROM l
    ), fp AS (
      SELECT x.media_id AS id_a, y.media_id AS id_b,
             x.frame_no AS fa
      FROM b x JOIN b y ON x.media_id < y.media_id
      WHERE LEN(LIST_FILTER(RANGE(1, 65),
            i -> x.bits[i] != y.bits[i])) <= 3
    )
    SELECT id_a, id_b,
           CAST(COUNT(DISTINCT fa) AS BIGINT) AS matched_frames
    FROM fp GROUP BY 1, 2
    HAVING COUNT(DISTINCT fa) >= 2
    """,
    description="video-level near-duplicate pairs: per-frame "
    "average-hashes -> banded hamming frame pairs on a packed "
    "(video, frame) key -> distinct-matched-frame count per video "
    "pair; frames never leave the decode task",
)
def multimodal_video_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 40) & (F.length("text") >= 64)
    )
    orig = docs.select("doc_id", "text")
    pert = docs.select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat(F.lit("~~~~~~"), F.expr("substring(text, 7)")).alias(
            "text"
        ),
    )
    media = M.documents_as_video(orig.unionByName(pert), n_frames=4)
    return M.video_near_dup_pairs(
        media, max_hamming=3, min_matched_frames=2
    )


@register(
    "pipeline_curate_multimodal",
    # Capstone composite: the multimodal dedup + text-quality families
    # chained the way a media-corpus curation job runs them — image
    # near-dup pairs (real decode + banded hamming) drop every
    # higher-id member of a pair, then the survivors' TEXT quality
    # gates admission. The oracle composes the same CTEs.
    oracle=_AHASH_GATE_SQL
    + rf"""
    , b AS (
      SELECT media_id,
             LIST_TRANSFORM(luma, x ->
               CASE WHEN x > LIST_SUM(luma) // 64 THEN 1 ELSE 0 END)
               AS bits
      FROM l
    ), dropped AS (
      SELECT DISTINCT y.media_id AS media_id
      FROM b x JOIN b y ON x.media_id < y.media_id
      WHERE LEN(LIST_FILTER(RANGE(1, 65),
            i -> x.bits[i] != y.bits[i])) <= 3
    ), survivors AS (
      SELECT m.media_id, m.t FROM m
      WHERE m.media_id NOT IN (SELECT media_id FROM dropped)
    ), q AS (
      SELECT media_id,
             {X.sql_quality_inputs('t')}
      FROM survivors
    )
    SELECT media_id, {X.SQL_QUALITY_FORMULA} AS quality
    FROM q
    WHERE {X.SQL_QUALITY_FORMULA} >= 0.45
    """,
    description="multimodal curation composite: image near-dup drop "
    "(keep the lower id of every pair) -> text-quality admission on "
    "the survivors — the dedup and quality families composed the way "
    "a media-corpus curation job chains them",
)
def pipeline_curate_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _ahash_gate_corpus(spark, sf_dir)
    media = M.documents_as_ppm(corpus)
    # drop the HIGHER id of every image near-dup pair (the single-pass
    # canonical-keep rule; full pair-graph clustering is
    # dedup_cluster_components' job)
    dropped = (
        M.image_near_dup_pairs(media, max_hamming=3)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    survivors = corpus.join(dropped, "doc_id", "left_anti")
    return (
        survivors.select(
            F.col("doc_id").alias("media_id"),
            X.quality_score(F.col("text")).alias("quality"),
        )
        .filter(F.col("quality") >= 0.45)
    )


@register(
    "multimodal_audio_features",
    # REAL audio path: text chars → PCM16 samples ((ord-110)·256) in a
    # valid RIFF/WAVE container (python writer), decoded by the
    # chunk-walking parser executor-side; the oracle recomputes
    # duration / RMS / peak / zero-crossings from the text directly —
    # integer sums + IEEE-exact sqrt, round-6 both sides.
    oracle=r"""
    WITH m AS (
      SELECT doc_id AS media_id,
             CASE WHEN text IS NULL OR text = '' THEN ' '
                  ELSE SUBSTR(text, 1, 2000) END AS t
      FROM documents WHERE doc_id < 80
    ), s AS (
      SELECT media_id,
             LIST_TRANSFORM(RANGE(1, LEN(t) + 1),
               i -> GREATEST(-32768, LEAST(32767,
                    (ORD(SUBSTR(t, CAST(i AS INT), 1)) - 110) * 256)))
               AS smp
      FROM m
    )
    SELECT media_id,
           ROUND(LEN(smp) / 16000.0, 6) AS duration,
           ROUND(SQRT(LIST_SUM(LIST_TRANSFORM(smp,
                 x -> CAST(x AS BIGINT) * x))
                 / CAST(LEN(smp) AS DOUBLE)), 6) AS rms,
           CAST(LIST_MAX(LIST_TRANSFORM(smp, x -> ABS(x))) AS BIGINT)
             AS peak,
           CAST(LEN(LIST_FILTER(RANGE(1, LEN(smp)),
                i -> (smp[i] < 0) != (smp[i + 1] < 0))) AS BIGINT)
             AS crossings
    FROM s
    """,
    description="real WAV decode (RIFF chunk walk, PCM16) → duration / "
    "RMS / peak / zero-crossings via Arrow-batched mapInPandas",
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 80)
    media = M.documents_as_wav(docs)
    feats = M.extract_features(media, decoder=M.wav_feature_decoder)
    return feats.select(
        "media_id",
        F.round(F.element_at("features", 1), 6).alias("duration"),
        F.round(F.element_at("features", 2), 6).alias("rms"),
        F.element_at("features", 3).cast("long").alias("peak"),
        F.element_at("features", 4).cast("long").alias("crossings"),
    )


@register(
    "multimodal_audio_near_dup",
    # Energy-delta fingerprints + banded hamming over the same
    # perturbed-twin gate as the audio features: 53/53 twins match
    # within hamming 2, zero cross matches (probed). The oracle
    # recomputes window energies (integer bounds, s^2 sums) and
    # brute-forces the pair filter.
    oracle=r"""
    WITH m AS (
      SELECT doc_id AS media_id, SUBSTR(text, 1, 2000) AS t
      FROM documents WHERE doc_id < 60 AND LEN(text) >= 128
      UNION ALL
      SELECT doc_id + 1000 AS media_id,
             SUBSTR('~~~~~~' || SUBSTR(text, 7), 1, 2000) AS t
      FROM documents WHERE doc_id < 60 AND LEN(text) >= 128
    ), s AS (
      SELECT media_id,
             LIST_TRANSFORM(RANGE(1, LEN(t) + 1),
               i -> GREATEST(-32768, LEAST(32767,
                    (ORD(SUBSTR(t, CAST(i AS INT), 1)) - 110) * 256)))
               AS smp
      FROM m
    ), e AS (
      SELECT media_id,
             LIST_TRANSFORM(RANGE(0, 64), w ->
               COALESCE(LIST_SUM(LIST_TRANSFORM(
                 RANGE(w * LEN(smp) // 64, (w + 1) * LEN(smp) // 64),
                 i -> CAST(smp[CAST(i + 1 AS INT)] AS BIGINT)
                      * smp[CAST(i + 1 AS INT)])), 0)) AS en
      FROM s
    ), b AS (
      SELECT media_id,
             LIST_TRANSFORM(RANGE(1, 64), w ->
               CASE WHEN en[CAST(w + 1 AS INT)] > en[CAST(w AS INT)]
                    THEN 1 ELSE 0 END) AS bits
      FROM e
    )
    SELECT x.media_id AS id_a, y.media_id AS id_b,
           CAST(LEN(LIST_FILTER(RANGE(1, 64),
                i -> x.bits[CAST(i AS INT)] != y.bits[CAST(i AS INT)]))
                AS INT) AS hamming
    FROM b x JOIN b y ON x.media_id < y.media_id
    WHERE LEN(LIST_FILTER(RANGE(1, 64),
          i -> x.bits[CAST(i AS INT)] != y.bits[CAST(i AS INT)])) <= 3
    """,
    description="audio near-duplicate pairs: energy-delta fingerprint "
    "(63 bits of window-energy deltas) + banded hamming — the audio "
    "member of the multimodal dedup family",
)
def multimodal_audio_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 60) & (F.length("text") >= 128)
    )
    orig = docs.select("doc_id", "text")
    pert = docs.select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat(F.lit("~~~~~~"), F.expr("substring(text, 7)")).alias(
            "text"
        ),
    )
    media = M.documents_as_wav(orig.unionByName(pert))
    return M.audio_near_dup_pairs(media, max_hamming=3).select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(UNNEST(RANGE(0, LEAST(8, LEN(text) // 256 + 1))) AS INT)
             AS frame_no
    FROM documents
    WHERE doc_id < 50
    """,
    description="frame sampling plumbing: one media row → N typed slices",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    media = M.documents_as_media(docs)
    return M.frame_sample(media, every_n_bytes=256).select(
        "media_id", "frame_no"
    )


@register(
    "multimodal_ahash",
    # Real decode → all-integer average-hash: luma = (r+g+b)//3 per
    # pixel, bit = luma > floor(mean) — the oracle rebuilds the raster
    # from the text (ASCII gate docs: chars == bytes) and recomputes
    # the 64-bit hash bit-for-bit as a bitstring.
    oracle=_AHASH_GATE_SQL
    + """
    SELECT media_id,
           LIST_AGGREGATE(
             LIST_TRANSFORM(luma, x ->
               CASE WHEN x > LIST_SUM(luma) // 64 THEN '1' ELSE '0' END),
             'string_agg', '') AS ahash
    FROM l
    """,
    description="perceptual average-hash of decoded images (real PPM "
    "parse, integer luma + mean threshold) — bit-exact vs the SQL "
    "raster reconstruction",
)
def multimodal_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _ahash_gate_media(spark, sf_dir)
    return M.image_hashes(media).select("media_id", "ahash")


@register(
    "multimodal_near_dup",
    # Banded hamming (pigeonhole-complete for <= 3) equals the
    # brute-force pair filter — the image twin of dedup_simhash: the
    # perturbed-twin construction guarantees near-dup pairs exist and
    # distinct documents stay far apart.
    oracle=_AHASH_GATE_SQL
    + """
    , b AS (
      SELECT media_id,
             LIST_TRANSFORM(luma, x ->
               CASE WHEN x > LIST_SUM(luma) // 64 THEN 1 ELSE 0 END)
               AS bits
      FROM l
    )
    SELECT x.media_id AS id_a, y.media_id AS id_b,
           CAST(LEN(LIST_FILTER(RANGE(1, 65),
                i -> x.bits[i] != y.bits[i])) AS INT) AS hamming
    FROM b x JOIN b y ON x.media_id < y.media_id
    WHERE LEN(LIST_FILTER(RANGE(1, 65),
          i -> x.bits[i] != y.bits[i])) <= 3
    """,
    description="image near-duplicate pairs: average-hash + banded "
    "hamming join (never a cross join; only 8-byte hashes shuffle, "
    "image bytes stay in their scan tasks)",
)
def multimodal_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _ahash_gate_media(spark, sf_dir)
    return M.image_near_dup_pairs(media, max_hamming=3).select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


# ---------------------------------------------------------------------------
# Composite pipeline: the operators chained the way a curation job uses them
# ---------------------------------------------------------------------------


@register(
    "pipeline_curate_documents",
    oracle=rf"""
    WITH q AS (
      SELECT doc_id, text,
             {X.SQL_QUALITY_FORMULA} AS quality
      FROM (
        SELECT doc_id, text,
               {X.sql_quality_inputs('text')}
        FROM documents
      )
    ), filtered AS (
      SELECT * FROM q WHERE quality >= 0.5
    ), deduped AS (
      SELECT MIN(doc_id) AS doc_id
      FROM filtered
      GROUP BY sha256(lower(trim(text)))
    )
    SELECT f.doc_id, f.quality
    FROM filtered f JOIN deduped d ON f.doc_id = d.doc_id
    """,
    description="curation pipeline: quality filter → exact dedup → survivors",
)
def pipeline_curate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "text", X.quality_score(F.col("text")).alias("quality")
    )
    filtered = scored.filter(F.col("quality") >= 0.5)
    # exact_dedup_project: min-struct aggregation on the content key —
    # ONE scan of documents, one narrow shuffle, no semi-join re-scan
    # re-evaluating the 5-regexp quality projection (r2/r3 verdict item).
    return D.exact_dedup_project(filtered, ["doc_id", "quality"])


@register(
    "similarity_ann_ivf",
    oracle=_ANN_ORACLE,
    description="IVF ANN: spherical k-means cells + nprobe search, "
    "gated by exact top-3 + recall contract",
)
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ivf import IVFIndex

    emb = load(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).head()["embedding"]
    qv = [float(x) for x in query]
    base = emb.filter(F.col("vec_id") != 0)
    index = IVFIndex.fit(emb, k=8, iterations=4)
    ann = index.search(base, qv, k=10, nprobe=3)
    exact = S.knn_brute_force(base, qv, k=10)
    return _ann_gate(ann, exact)


@register(
    "similarity_ann_pq",
    oracle=_ANN_ORACLE,
    description="Product-quantization ANN: 32x-compressed codes, ADC "
    "table-lookup scan + exact refine, gated by exact top-3 + recall "
    "contract",
)
def similarity_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.pq import ProductQuantizer

    emb = load(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).head()["embedding"]
    qv = [float(x) for x in query]
    base = emb.filter(F.col("vec_id") != 0)
    pq = ProductQuantizer.fit(emb, m=8, ksub=256, iterations=6)
    ann = pq.search(base, qv, k=10, refine=4)
    exact = S.knn_brute_force(base, qv, k=10)
    return _ann_gate(ann, exact)


@register(
    "similarity_ann_ivfpq",
    oracle=_ANN_ORACLE,
    description="IVF-PQ ANN (the FAISS production composition): coarse-"
    "cell pruning x 32x-compressed ADC scoring + exact refine, gated by "
    "exact top-3 + recall contract",
)
def similarity_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ivf import IVFIndex
    from ..functions.pq import ProductQuantizer, ivfpq_search

    emb = load(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).head()["embedding"]
    qv = [float(x) for x in query]
    base = emb.filter(F.col("vec_id") != 0)
    ivf = IVFIndex.fit(emb, k=8, iterations=4)
    pq = ProductQuantizer.fit(emb, m=8, ksub=256, iterations=6)
    # nprobe/refine sized for the synthetic corpus's weak cluster
    # structure (uniform-ish embeddings make coarse cells lossy);
    # measured recall@10: 1.0/0.9/0.8 at sf0.001/0.01/0.1
    ann = ivfpq_search(ivf, pq, base, qv, k=10, nprobe=6, refine=8)
    exact = S.knn_brute_force(base, qv, k=10)
    return _ann_gate(ann, exact)


@register(
    "text_sentiment",
    oracle=rf"""
    SELECT doc_id,
           ROUND(CASE WHEN CAST({X.sql_token_count('text', X.WS_TOKEN_RE)} AS DOUBLE) > 0
                 THEN (CAST({X.sql_token_count('lower(text)', X.POSITIVE_RE)} AS DOUBLE)
                       - CAST({X.sql_token_count('lower(text)', X.NEGATIVE_RE)} AS DOUBLE))
                      / CAST({X.sql_token_count('text', X.WS_TOKEN_RE)} AS DOUBLE)
                 ELSE 0.0 END, 6) AS sentiment
    FROM documents
    """,
    description="lexicon sentiment scoring (EDBT'16 Spark pattern)",
)
def text_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", X.sentiment_score(F.col("text")).alias("sentiment")
    )


@register(
    "text_repetition",
    # Gopher-style repetition quality signals; both fractions recomputed
    # by DuckDB from the same line/bigram definitions. 0-line docs get
    # 0.0 dup_line_frac; <2-token docs carry the whole-doc gram and a
    # trivially-1.0 top_bigram_frac (same ELSE [''] convention as every
    # gram oracle).
    oracle=r"""
    WITH lines AS (
      SELECT doc_id,
             LIST_FILTER(regexp_split_to_array(text, CHR(10)),
                         l -> LEN(TRIM(l)) > 0) AS ls
      FROM documents
    ), lf AS (
      SELECT doc_id,
             CASE WHEN LEN(ls) > 0
               THEN ROUND(1 - CAST(LEN(LIST_DISTINCT(ls)) AS DOUBLE)
                              / LEN(ls), 6)
               ELSE 0.0 END AS dup_line_frac
      FROM lines
    ), toks AS (
      SELECT doc_id,
             LIST_FILTER(regexp_split_to_array(lower(text), '\s+'),
                         t -> LEN(t) > 0) AS tk
      FROM documents
    ), grams AS (
      SELECT doc_id,
             UNNEST(CASE WHEN LEN(tk) >= 2
               THEN LIST_TRANSFORM(RANGE(1, LEN(tk)),
                    i -> tk[i] || ' ' || tk[i+1])
               ELSE [COALESCE(LIST_AGGREGATE(tk, 'string_agg', ' '), '')]
             END) AS g
      FROM toks
    ), cnt AS (
      SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g
    ), gf AS (
      SELECT doc_id,
             ROUND(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6)
               AS top_bigram_frac
      FROM cnt GROUP BY doc_id
    )
    SELECT lf.doc_id, lf.dup_line_frac, gf.top_bigram_frac
    FROM lf JOIN gf ON lf.doc_id = gf.doc_id
    """,
    description="Gopher-style repetition metrics: duplicate-line "
    "fraction + top-bigram fraction (explode -> partial-agg, text "
    "never shuffles)",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return X.repetition_stats(docs)


@register(
    "skyline_parts",
    oracle="""
    SELECT p_partkey, p_retailprice, p_size
    FROM part p
    WHERE p_partkey <= 400 AND NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_partkey <= 400
        AND q.p_retailprice <= p.p_retailprice
        AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
    description="skyline (Pareto front): min price, max size — dominance "
    "anti-join (cf. 'Integration of Skyline Queries into Spark SQL')",
)
def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 400)
    q = p.select(
        F.col("p_retailprice").alias("q_price"),
        F.col("p_size").alias("q_size"),
    )
    dominated_by = (
        (F.col("q_price") <= F.col("p_retailprice"))
        & (F.col("q_size") >= F.col("p_size"))
        & (
            (F.col("q_price") < F.col("p_retailprice"))
            | (F.col("q_size") > F.col("p_size"))
        )
    )
    return p.join(q, dominated_by, "left_anti").select(
        "p_partkey", "p_retailprice", "p_size"
    )


# ---------------------------------------------------------------------------
# Dataset splitting / sampling / contamination (functions/sampling.py)
# ---------------------------------------------------------------------------

from ..functions import sampling as SP  # noqa: E402


@register(
    "sample_hash_split",
    # weights 0.75/0.125/0.125: cumulative bounds are exact in binary AND
    # in decimal SQL literals, so the threshold comparisons agree across
    # engines with no float-literal parsing hazards.
    oracle=f"""
    WITH u AS (
      SELECT o_orderkey, o_totalprice,
             {SP.sql_hash_fraction('o_orderkey', salt='split')} AS frac
      FROM orders
    )
    SELECT CASE WHEN frac < 0.75 THEN 'train'
                WHEN frac < 0.875 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_rows,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38, 6)))
                      AS DOUBLE), 2) AS sum_totalprice
    FROM u
    GROUP BY 1
    """,
    description="deterministic sha-hash train/val/test split (zero-shuffle "
    "projection; stable under repartitioning, unlike randomSplit)",
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    split = SP.with_split(
        orders,
        "o_orderkey",
        weights=[("train", 0.75), ("val", 0.125), ("test", 0.125)],
        salt="split",
    )
    return split.groupBy("split").agg(
        F.count("*").alias("n_rows"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast(
                "double"
            ),
            2,
        ).alias("sum_totalprice"),
    )


@register(
    "sample_stratified",
    oracle=f"""
    WITH u AS (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             {SP.sql_hash_fraction('c_custkey', salt='sample')} AS frac
      FROM customer
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_kept,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(38, 6)))
                      AS DOUBLE), 2) AS acctbal_sum
    FROM u
    WHERE frac < CASE c_mktsegment
                   WHEN 'BUILDING' THEN 0.5
                   WHEN 'MACHINERY' THEN 0.25
                   ELSE 0.0625 END
    GROUP BY c_mktsegment
    """,
    description="deterministic stratified sampling: per-stratum keep "
    "rates via hash variate (sampleBy without RNG, zero shuffle)",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    kept = SP.stratified_sample(
        customer,
        "c_mktsegment",
        {"BUILDING": 0.5, "MACHINERY": 0.25},
        key_col="c_custkey",
        default_fraction=0.0625,
        salt="sample",
    )
    return kept.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_kept"),
        F.round(
            F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double"),
            2,
        ).alias("acctbal_sum"),
    )


@register(
    "pipeline_contamination",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             LIST_FILTER(regexp_split_to_array(lower(text), '\s+'),
                         t -> LEN(t) > 0) AS tk
      FROM documents
    ), sh AS (
      SELECT doc_id,
             LIST_DISTINCT(
               CASE WHEN LEN(tk) >= 3
                 THEN LIST_TRANSFORM(RANGE(1, LEN(tk) - 1),
                      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                 ELSE [COALESCE(LIST_AGGREGATE(tk, 'string_agg', ' '), '')]
               END) AS s
      FROM toks
    ), ev AS (
      SELECT doc_id, UNNEST(s) AS gram FROM sh WHERE doc_id < 50
    ), tr AS (
      SELECT DISTINCT UNNEST(s) AS gram FROM sh WHERE doc_id >= 50
    )
    SELECT ev.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS contaminated,
           ROUND(CAST(SUM(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS contamination
    FROM ev LEFT JOIN tr ON ev.gram = tr.gram
    GROUP BY ev.doc_id
    """,
    description="benchmark-contamination check: per eval doc, fraction of "
    "its distinct 3-grams present anywhere in the train corpus",
)
def pipeline_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") < 50)
    train = docs.filter(F.col("doc_id") >= 50)
    return SP.contamination_check(train, eval_df, n=3)


@register(
    "text_pii_redact",
    # output = sha256 of the redacted text: a drifted pattern, a missed
    # replacement, or replace-first-vs-all semantics all flip the hash.
    oracle=f"""
    SELECT doc_id,
           sha256({X.sql_redact_pii('text')}) AS clean_sha
    FROM documents
    """,
    description="PII scrub (email/SSN/phone/IP/card → typed tokens), "
    "gated on sha256 of the redacted text",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.sha2(X.redact_pii(F.col("text")), 256).alias("clean_sha"),
    )


@register(
    "dedup_cluster_components",
    # Clusters over the verified near-dup pairs: component id = min doc
    # id reachable. The oracle recomputes the same pairs (inverted-index
    # + shared-gram-count jaccard — exact, see dedup_minhash_lsh) and
    # closes them transitively with a recursive CTE. pairs is
    # MATERIALIZED: edges references it twice and DuckDB would otherwise
    # inline (re-execute) the whole candidate join per reference.
    oracle=r"""
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             LIST_FILTER(regexp_split_to_array(lower(text), '\s+'),
                         t -> LEN(t) > 0) AS tk
      FROM documents
    ), sh AS (
      SELECT doc_id,
             LIST_DISTINCT(
               CASE WHEN LEN(tk) >= 3
                 THEN LIST_TRANSFORM(RANGE(1, LEN(tk) - 1),
                      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                 ELSE [COALESCE(LIST_AGGREGATE(tk, 'string_agg', ' '), '')]
               END) AS s
      FROM toks
    ), gr AS (
      SELECT doc_id, LEN(s) AS ln, UNNEST(s) AS g FROM sh
    ), cnts AS (
      SELECT x.doc_id AS id_a, y.doc_id AS id_b,
             ANY_VALUE(x.ln) AS la, ANY_VALUE(y.ln) AS lb,
             COUNT(*) AS c
      FROM gr x JOIN gr y ON x.g = y.g AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    ), pairs AS MATERIALIZED (
      SELECT id_a, id_b
      FROM cnts
      WHERE ROUND(CAST(c AS DOUBLE) / (la + lb - c), 6) >= 0.5
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach AS (
      SELECT a AS id, a AS r FROM edges
      UNION
      SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id
    )
    SELECT id AS doc_id, MIN(r) AS component
    FROM reach GROUP BY id
    """,
    description="dedup clustering: connected components (min-label "
    "propagation) over verified near-dup pairs",
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.graph import connected_components

    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_dedup_pairs(docs, threshold=0.5)
    return connected_components(pairs, "id_a", "id_b").select(
        F.col("id").alias("doc_id"), "component"
    )


@register(
    "dedup_cluster_survivors",
    # The step after clustering: one survivor per near-dup cluster
    # (longest text — "most complete version" — ties broken by min id),
    # singleton docs surviving as their own cluster. min(struct(-len,
    # id)) is the deterministic pick; the whole reduction is one
    # aggregate over (component, id, len) rows — never document text.
    oracle=r"""
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             LIST_FILTER(regexp_split_to_array(lower(text), '\s+'),
                         t -> LEN(t) > 0) AS tk
      FROM documents
    ), sh AS (
      SELECT doc_id,
             LIST_DISTINCT(
               CASE WHEN LEN(tk) >= 3
                 THEN LIST_TRANSFORM(RANGE(1, LEN(tk) - 1),
                      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                 ELSE [COALESCE(LIST_AGGREGATE(tk, 'string_agg', ' '), '')]
               END) AS s
      FROM toks
    ), gr AS (
      SELECT doc_id, LEN(s) AS ln, UNNEST(s) AS g FROM sh
    ), cnts AS (
      SELECT x.doc_id AS id_a, y.doc_id AS id_b,
             ANY_VALUE(x.ln) AS la, ANY_VALUE(y.ln) AS lb,
             COUNT(*) AS c
      FROM gr x JOIN gr y ON x.g = y.g AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    ), pairs AS MATERIALIZED (
      SELECT id_a, id_b
      FROM cnts
      WHERE ROUND(CAST(c AS DOUBLE) / (la + lb - c), 6) >= 0.5
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach AS (
      SELECT a AS id, a AS r FROM edges
      UNION
      SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id
    ), comp AS (
      SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id
    ), annotated AS (
      SELECT d.doc_id,
             COALESCE(c.component, d.doc_id) AS component,
             CAST(LEN(d.text) AS BIGINT) AS n_chars
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    ), ranked AS (
      SELECT component, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY component ORDER BY n_chars DESC, doc_id
             ) AS rn
      FROM annotated
    )
    SELECT component, doc_id, n_chars FROM ranked WHERE rn = 1
    """,
    description="near-dup cluster survivor selection: longest text per "
    "component (min-struct aggregate; singletons survive as themselves)",
)
def dedup_cluster_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.graph import connected_components

    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_dedup_pairs(docs, threshold=0.5)
    comp = connected_components(pairs, "id_a", "id_b")
    annotated = (
        docs.join(comp, docs["doc_id"] == comp["id"], "left")
        .select(
            docs["doc_id"],
            F.coalesce(comp["component"], docs["doc_id"]).alias(
                "component"
            ),
            F.length("text").cast("long").alias("n_chars"),
        )
    )
    won = (
        annotated.select(
            "component",
            F.struct(
                (-F.col("n_chars")).alias("__neglen"),
                F.col("doc_id"),
                F.col("n_chars"),
            ).alias("__row"),
        )
        .groupBy("component")
        .agg(F.min("__row").alias("__w"))
    )
    return won.select(
        "component",
        F.col("__w.doc_id").alias("doc_id"),
        F.col("__w.n_chars").alias("n_chars"),
    )


@register(
    "text_top_tokens",
    oracle=r"""
    WITH tok AS (
      SELECT UNNEST(LIST_FILTER(
               regexp_split_to_array(lower(text), '\s+'),
               t -> LEN(t) > 0)) AS token
      FROM documents
    )
    SELECT token, COUNT(*) AS freq
    FROM tok
    GROUP BY token
    ORDER BY freq DESC, token ASC
    LIMIT 20
    """,
    description="corpus vocabulary heavy hitters: token frequency top-k "
    "(explode -> partial-agg count -> TakeOrdered)",
)
def text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(D.tokens_of(F.col("text"))).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(20)
    )


@register(
    "text_chunk_documents",
    # stride = chunk_size - overlap = 12; DuckDB RANGE(0, n, 12) matches
    # the Spark sequence+filter start set, list_slice's inclusive end
    # clips at the list tail exactly like F.slice.
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             LIST_FILTER(regexp_split_to_array(lower(text), '\s+'),
                         t -> LEN(t) > 0) AS tk
      FROM documents
    ), starts AS (
      SELECT doc_id, tk, UNNEST(RANGE(0, LEN(tk), 12)) AS s
      FROM toks WHERE LEN(tk) > 0
    )
    SELECT doc_id,
           CAST(s // 12 AS INT) AS chunk_id,
           ARRAY_TO_STRING(LIST_SLICE(tk, s + 1, s + 16), ' ')
             AS chunk_text,
           CAST(LEN(LIST_SLICE(tk, s + 1, s + 16)) AS INT) AS n_tokens
    FROM starts
    """,
    description="token-window chunking (context packing / RAG prep): "
    "16-token windows, 4-token overlap, zero shuffle",
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return X.chunk_tokens(docs, chunk_size=16, overlap=4)


@register(
    "pipeline_chunk_dedup",
    # Composite RAG-prep: chunk every document into overlapping token
    # windows, then exact-dedup the CHUNKS (overlap and boilerplate make
    # chunk-level dup rates far higher than doc-level). Survivor = min
    # (doc_id, chunk_id) per normalized chunk content — single scan +
    # one narrow shuffle via the min-struct aggregation.
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             LIST_FILTER(regexp_split_to_array(lower(text), '\s+'),
                         t -> LEN(t) > 0) AS tk
      FROM documents
    ), starts AS (
      SELECT doc_id, tk, UNNEST(RANGE(0, LEN(tk), 12)) AS s
      FROM toks WHERE LEN(tk) > 0
    ), chunks AS (
      SELECT doc_id,
             CAST(s // 12 AS INT) AS chunk_id,
             ARRAY_TO_STRING(LIST_SLICE(tk, s + 1, s + 16), ' ')
               AS chunk_text,
             CAST(LEN(LIST_SLICE(tk, s + 1, s + 16)) AS INT) AS n_tokens
      FROM starts
    ), ranked AS (
      SELECT doc_id, chunk_id, n_tokens,
             ROW_NUMBER() OVER (
               PARTITION BY sha256(lower(trim(chunk_text)))
               ORDER BY doc_id, chunk_id
             ) AS rn
      FROM chunks
    )
    SELECT doc_id, chunk_id, n_tokens FROM ranked WHERE rn = 1
    """,
    description="composite RAG prep: overlapping token chunks -> exact "
    "chunk dedup (min-struct survivor, one scan + one narrow shuffle)",
)
def pipeline_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    chunks = X.chunk_tokens(docs, chunk_size=16, overlap=4)
    won = (
        chunks.select(
            D.content_key(F.col("chunk_text")).alias("__ck"),
            F.struct("doc_id", "chunk_id", "n_tokens").alias("__row"),
        )
        .groupBy("__ck")
        .agg(F.min("__row").alias("__w"))
    )
    return won.select(
        F.col("__w.doc_id").alias("doc_id"),
        F.col("__w.chunk_id").alias("chunk_id"),
        F.col("__w.n_tokens").alias("n_tokens"),
    )


@register(
    "similarity_quantize_int8",
    # per-vector checksum gate: scale + sum/min/max of the quantized
    # lanes pin every q_i (a single off-by-one flips q_sum). floor(x+0.5)
    # half-up is engine-identical, unlike bankers'-rounding builtins.
    oracle="""
    WITH v AS (
      SELECT vec_id,
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), s AS (
      SELECT vec_id, e,
             LIST_REDUCE(LIST_TRANSFORM(e, x -> ABS(x)),
                         (a, x) -> GREATEST(a, x)) AS am
      FROM v
    )
    SELECT vec_id,
           ROUND(am / 127.0, 9) AS scale,
           CAST(CASE WHEN am > 0
                THEN LIST_REDUCE(
                       LIST_TRANSFORM(e, x -> FLOOR(x / (am / 127.0) + 0.5)),
                       (a, x) -> a + x)
                ELSE 0 END AS BIGINT) AS q_sum,
           CAST(CASE WHEN am > 0
                THEN LIST_REDUCE(
                       LIST_TRANSFORM(e, x -> FLOOR(x / (am / 127.0) + 0.5)),
                       (a, x) -> LEAST(a, x))
                ELSE 0 END AS INT) AS q_min,
           CAST(CASE WHEN am > 0
                THEN LIST_REDUCE(
                       LIST_TRANSFORM(e, x -> FLOOR(x / (am / 127.0) + 0.5)),
                       (a, x) -> GREATEST(a, x))
                ELSE 0 END AS INT) AS q_max
    FROM s
    """,
    description="int8 embedding quantization (symmetric per-vector scale) "
    "gated on scale + lane checksums",
)
def similarity_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    qz = emb.select(
        "vec_id", S.quantize_int8(F.col("embedding")).alias("qz")
    )
    q = F.col("qz.q")
    return qz.select(
        "vec_id",
        F.round(F.col("qz.scale"), 9).alias("scale"),
        F.aggregate(
            q, F.lit(0).cast("long"), lambda a, x: a + x.cast("long")
        ).alias("q_sum"),
        F.aggregate(
            q,
            F.lit(127).cast("int"),
            lambda a, x: F.least(a, x.cast("int")),
        ).alias("q_min"),
        F.aggregate(
            q,
            F.lit(-127).cast("int"),
            lambda a, x: F.greatest(a, x.cast("int")),
        ).alias("q_max"),
    )


# -- sequence packing (training-data layout) ---------------------------------

from ..functions import packing as PK  # noqa: E402


@register(
    "pipeline_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             {PK.sql_shard_of('doc_id', 8, salt='pack')} AS shard,
             CAST({X.sql_token_count('text', X.WS_TOKEN_RE)} AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    spans AS (
      SELECT doc_id, shard, n_tokens,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tok_end
      FROM toks WHERE n_tokens > 0
    ),
    packs AS (
      SELECT doc_id, shard, n_tokens,
             tok_end - n_tokens AS tok_start, tok_end,
             UNNEST(generate_series(
               CAST(FLOOR((tok_end - n_tokens) / 512.0) AS BIGINT),
               CAST(FLOOR((tok_end - 1) / 512.0) AS BIGINT))) AS pack_id
      FROM spans
    )
    SELECT doc_id, shard, CAST(pack_id AS BIGINT) AS pack_id, n_tokens,
           LEAST(tok_end, (pack_id + 1) * 512)
             - GREATEST(tok_start, pack_id * 512) AS tokens_in_pack,
           GREATEST(tok_start, pack_id * 512) - pack_id * 512
             AS pack_offset
    FROM packs
    """,
    description="GPT-style sequence packing: shard by key hash, "
    "concat-and-split each shard's token stream into 512-token packs "
    "(documents may cross pack boundaries); one shuffle (per-shard "
    "running sum) + zero-shuffle explode",
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return PK.pack_sequences(
        docs, "doc_id", window=512, n_shards=8, salt="pack"
    )


# -- LM perplexity quality filter + column profiler --------------------------

from ..functions import profile as PR  # noqa: E402


@register(
    "text_perplexity",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(LIST_FILTER(
               regexp_split_to_array(lower(text), '\s+'),
               t -> LEN(t) > 0)) AS tok
      FROM documents
    ), vocab AS (
      SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS total, COUNT(*) AS v FROM vocab
    ), scored AS (
      SELECT t.doc_id,
             CAST(ROUND(LN((v2.cnt + 1.0) / (tot.total + 1.0 * tot.v)), 6)
                  AS DECIMAL(38,6)) AS lp
      FROM toks t JOIN vocab v2 USING (tok) CROSS JOIN tot
    )
    SELECT doc_id, COUNT(*) AS n_tokens,
           ROUND(EXP(-(CAST(SUM(lp) AS DOUBLE) / COUNT(*))), 4)
             AS perplexity
    FROM scored GROUP BY doc_id
    """,
    description="corpus-trained unigram-LM perplexity (CCNet-style "
    "quality filter): vocabulary aggregate -> token-keyed scoring join "
    "-> per-doc decimal-accumulated log-prob; the model is never "
    "collected",
)
def text_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return X.unigram_perplexity(docs)


@register(
    "profile_orders",
    oracle="""
    SELECT 'o_orderkey' AS "column", COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_orderkey) AS n_nulls,
           COUNT(DISTINCT o_orderkey) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus),
           CAST(MIN(o_orderstatus) AS VARCHAR),
           CAST(MAX(o_orderstatus) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           CAST(CAST(MIN(o_totalprice) AS DECIMAL(38,6)) AS VARCHAR),
           CAST(CAST(MAX(o_totalprice) AS DECIMAL(38,6)) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate),
           COUNT(DISTINCT o_orderdate),
           CAST(MIN(o_orderdate) AS VARCHAR),
           CAST(MAX(o_orderdate) AS VARCHAR)
    FROM orders
    """,
    description="column profiler (data card): one-scan per-column "
    "null/distinct/min/max summary; exact distincts here (the Expand "
    "trade), approx_count_distinct for the production path",
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return PR.profile(
        orders,
        ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"],
    )


# -- fuzzy edit-distance join ------------------------------------------------

from ..functions import fuzzy as FZ  # noqa: E402


@register(
    "join_fuzzy_editdist",
    oracle="""
    WITH vars AS (
      SELECT s_suppkey, s_name,
             UNNEST(LIST_DISTINCT(LIST_PREPEND(s_name,
               LIST_TRANSFORM(RANGE(1, LEN(s_name) + 1),
                 i -> substr(s_name, 1, i - 1)
                      || substr(s_name, i + 1, LEN(s_name)))))) AS var
      FROM supplier
    ), pairs AS (
      SELECT DISTINCT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
             a.s_name AS key_a, b.s_name AS key_b
      FROM vars a JOIN vars b
        ON a.var = b.var AND a.s_suppkey < b.s_suppkey
    )
    SELECT id_a, id_b, key_a, key_b,
           CAST(levenshtein(key_a, key_b) AS INT) AS distance
    FROM pairs
    WHERE levenshtein(key_a, key_b) <= 1
    """,
    description="edit-distance<=1 self-join via FastSS deletion-variant "
    "blocking (equi-join on variants + inline levenshtein verify — "
    "sound, complete, never a cross join)",
)
def join_fuzzy_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load(spark, sf_dir, "supplier")
    return FZ.fuzzy_join_pairs(supplier, "s_name", "s_suppkey")


# -- mergeable-sketch rollup -------------------------------------------------


@register(
    "agg_sketch_rollup",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_contract
    FROM events
    GROUP BY event_type
    """,
    description="mergeable HLL sketch rollup (Datasketches): per-day "
    "hll_sketch_agg partials union with hll_union_agg — the "
    "pre-aggregated incremental-distinct pattern (store day sketches, "
    "merge at query time; never re-scan history). Gate: exact distinct "
    "+ estimate-within-5%-rsd contract boolean, the HLL pattern "
    "agg_approx_distinct established",
)
def agg_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    per_day = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = per_day.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return exact.join(merged, "event_type").select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("est") - F.col("exact_users"))
            / F.col("exact_users")
            <= F.lit(0.05)
        ).alias("within_contract"),
    )


# -- exact duplicate-span detection (substring-level dedup) ------------------


@register(
    "dedup_duplicate_spans",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             LIST_FILTER(regexp_split_to_array(lower(text), '\s+'),
                         t -> LEN(t) > 0) AS tk
      FROM documents
    ), win AS (
      SELECT doc_id, UNNEST(RANGE(0, LEN(tk) - 7)) AS pos, tk
      FROM toks WHERE LEN(tk) >= 8
    ), grams AS (
      SELECT doc_id, pos,
             LIST_AGGREGATE(tk[pos+1 : pos+8], 'string_agg', ' ')
               AS gram
      FROM win
    ), rep AS (
      SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) > 1
    ), marked AS (
      SELECT g.doc_id, g.pos AS s, g.pos + 8 AS e
      FROM grams g JOIN rep USING (gram)
    ), flagged AS (
      SELECT doc_id, s, e,
             CASE WHEN MAX(e) OVER w IS NULL
                    OR s > MAX(e) OVER w THEN 1 ELSE 0 END AS is_new
      FROM marked
      WINDOW w AS (PARTITION BY doc_id ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), islands AS (
      SELECT doc_id, s, e,
             SUM(is_new) OVER (PARTITION BY doc_id ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM flagged
    )
    SELECT doc_id,
           CAST(MIN(s) AS BIGINT) AS span_start,
           CAST(MAX(e) AS BIGINT) AS span_end,
           CAST(COUNT(*) AS BIGINT) AS n_windows
    FROM islands GROUP BY doc_id, island
    """,
    description="exact duplicate-span detection (Lee et al. 2022 "
    "substring dedup): repeated 8-token windows via gram aggregate + "
    "semi join, merged per doc with one gaps-and-islands window pass",
)
def dedup_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    spans = D.duplicate_spans(docs, n=8)
    return spans.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        F.col("n_windows").cast("long").alias("n_windows"),
    )


# -- persisted ANN index (the production serving layout) ---------------------

_ANN_INDEX_BUILT: dict[str, str] = {}


def _ann_index_fixture(spark: SparkSession, sf_dir: str) -> str:
    import os as _os
    from ..core.tmp import session_tmp

    from ..functions.ann_index import build_ann_index

    key = _os.path.abspath(sf_dir)
    if key in _ANN_INDEX_BUILT and _os.path.isdir(
        _os.path.join(_ANN_INDEX_BUILT[key], "_delta_log")
    ):
        return _ANN_INDEX_BUILT[key]
    base = session_tmp("datarepo_ann_index_")
    uri = _os.path.join(base, "embeddings_ivf")
    emb = load(spark, sf_dir, "embeddings")
    # one shared fixture serves both the plain-IVF and the IVF-PQ query:
    # pq_m adds the 8-byte codes column; the plain query's column
    # projection never reads it
    build_ann_index(
        spark, emb, uri, nlist=8, iterations=4, pq_m=8, pq_iterations=6
    )
    _ANN_INDEX_BUILT[key] = uri
    return uri


@register(
    "similarity_ann_index",
    oracle=_ANN_ORACLE,
    description="persisted ANN index: corpus IVF-assigned ONCE into a "
    "Delta table partitioned by cell (centroids stored beside the "
    "log); the query resolves nprobe cells driver-side and reads only "
    "those partitions — gated by exact top-3 + recall contract",
)
def similarity_ann_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ann_index import query_ann_index

    uri = _ann_index_fixture(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]
    ann = query_ann_index(spark, uri, qv, k=10, nprobe=3).filter(
        F.col("vec_id") != 0
    )
    base = emb.filter(F.col("vec_id") != 0)
    exact = S.knn_brute_force(base, qv, k=10)
    return _ann_gate(ann, exact)


@register(
    "similarity_ann_index_pq",
    oracle=_ANN_ORACLE,
    description="persisted IVF-PQ index (the production 100 TB serving "
    "shape): cell-partitioned Delta table storing 8-byte PQ codes; a "
    "query reads nprobe pruned cells x ONLY the (id, codes) columns "
    "for the ADC scan, then the raw vectors for the top k*refine "
    "survivors only — gated by exact top-3 + recall contract",
)
def similarity_ann_index_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ann_index import query_ann_index_pq

    uri = _ann_index_fixture(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]
    # nprobe/refine sized like similarity_ann_ivfpq: the synthetic
    # uniform-ish embeddings are the ANN worst case for coarse cells
    ann = query_ann_index_pq(
        spark, uri, qv, k=10, nprobe=5, refine=8
    ).filter(F.col("vec_id") != 0)
    base = emb.filter(F.col("vec_id") != 0)
    exact = S.knn_brute_force(base, qv, k=10)
    return _ann_gate(ann, exact)


@register(
    "similarity_ann_index_build",
    # r14 (VERDICT r13 #4): the index BUILD as its own timed row, so
    # the serving rows above stop conflating one-off build cost with
    # steady probe cost in the bench. Every invocation builds into a
    # FRESH directory (no fixture reuse — the row times the build);
    # the oracle checks the written table's cardinality and that every
    # row carries PQ codes. Probe-side correctness stays gated by
    # similarity_ann_index / similarity_ann_index_pq.
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(1 AS BIGINT) AS all_coded
    FROM embeddings
    """,
    description="IVF-PQ ANN index build, timed end-to-end into a fresh "
    "Delta dir (centroid fit + corpus assign + PQ encode + "
    "cell-partitioned write) — the build half of the persisted-index "
    "serving shape; returns written-table cardinality + coded-row "
    "check",
)
def similarity_ann_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os

    from ..core.tmp import session_tmp
    from ..functions.ann_index import build_ann_index
    from ..tables.delta_table import DeltalakeTable

    base = session_tmp("datarepo_ann_index_build_")
    uri = _os.path.join(base, "embeddings_ivf")
    emb = load(spark, sf_dir, "embeddings")
    build_ann_index(
        spark, emb, uri, nlist=8, iterations=4, pq_m=8, pq_iterations=6
    )
    written = DeltalakeTable("embeddings_ivf_build", uri)(spark=spark)
    return written.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.min(F.col("codes").isNotNull().cast("long")).alias("all_coded"),
    )


# -- persisted MinHash-LSH dedup index (incremental corpus dedup) ------------

_DEDUP_INDEX_BUILT: dict[str, str] = {}


def _dedup_index_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Index the corpus slice (doc_id % 10 < 8) once per sf_dir; probes
    dedup the remaining 20% 'new batch' against it."""
    import os as _os
    from ..core.tmp import session_tmp

    from ..functions.dedup_index import build_dedup_index

    key = _os.path.abspath(sf_dir)
    if key in _DEDUP_INDEX_BUILT and _os.path.isdir(
        _os.path.join(_DEDUP_INDEX_BUILT[key], "buckets", "_delta_log")
    ):
        return _DEDUP_INDEX_BUILT[key]
    base = session_tmp("datarepo_dedup_index_")
    uri = _os.path.join(base, "documents_lsh")
    corpus = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 < 8
    )
    build_dedup_index(spark, corpus, uri)
    # Deliberately NOT compacted here (r13, tried + measured): running
    # optimize_dedup_index after the build left steady probes flat
    # (3.25-3.59 s vs 3.0-3.3 s uncompacted — the gate's 128 small
    # bucket files sit in page cache and 128 scan tasks amortize over
    # 32 cores) while adding ~3 s of compaction to the first timed
    # pass. At production scale compaction IS the answer to an
    # append-accumulated index (the module docstring's maintenance
    # step); at gate scale it is pure first-pass cost.
    _DEDUP_INDEX_BUILT[key] = uri
    return uri


@register(
    "dedup_incremental_index",
    # Same contract (and the same 100%-recall-on-gate-corpus argument)
    # as dedup_minhash_lsh, restricted to CROSS pairs: batch docs
    # (doc_id % 10 >= 8) vs the indexed corpus slice (doc_id % 10 < 8).
    # The inverted-gram join enumerates every pair that can pass the
    # threshold, so brute-force Jaccard reproduces the result exactly.
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             LIST_FILTER(regexp_split_to_array(lower(text), '\s+'),
                         t -> LEN(t) > 0) AS tk
      FROM documents
    ), sh AS (
      SELECT doc_id,
             LIST_DISTINCT(
               CASE WHEN LEN(tk) >= 3
                 THEN LIST_TRANSFORM(RANGE(1, LEN(tk) - 1),
                      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                 ELSE [COALESCE(LIST_AGGREGATE(tk, 'string_agg', ' '), '')]
               END) AS s
      FROM toks
    ), gr_b AS (
      SELECT doc_id, LEN(s) AS ln, UNNEST(s) AS g FROM sh
      WHERE doc_id % 10 >= 8
    ), gr_c AS (
      SELECT doc_id, LEN(s) AS ln, UNNEST(s) AS g FROM sh
      WHERE doc_id % 10 < 8
    ), cnts AS (
      SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
             ANY_VALUE(b.ln) AS lb, ANY_VALUE(c.ln) AS lc,
             COUNT(*) AS cnt
      FROM gr_b b JOIN gr_c c ON b.g = c.g
      GROUP BY 1, 2
    )
    SELECT batch_id, corpus_id,
           ROUND(CAST(cnt AS DOUBLE) / (lb + lc - cnt), 6) AS jaccard
    FROM cnts
    WHERE ROUND(CAST(cnt AS DOUBLE) / (lb + lc - cnt), 6) >= 0.5
    """,
    description="persisted MinHash-LSH dedup index: a new batch dedups "
    "against the already-indexed corpus (bucket-join on the stored "
    "band table, exact-Jaccard verify on candidate text only) — the "
    "incremental-ingestion production shape",
)
def dedup_incremental_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.dedup_index import dedup_against_index

    uri = _dedup_index_fixture(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 10 >= 8)
    corpus = docs.filter(F.col("doc_id") % 10 < 8)
    return dedup_against_index(
        spark, batch, uri, threshold=0.5, corpus_df=corpus
    )


@register(
    "dedup_incremental_index_build",
    # r14 (VERDICT r13 #4): the LSH index BUILD as its own timed row —
    # dedup_incremental_index (above) keeps its per-sf_dir fixture and
    # measures the PROBE; this row rebuilds into a fresh directory on
    # every invocation so the build cost is bench-visible instead of
    # riding the probe row's first pass. Oracle: each indexed doc
    # writes exactly one signature row and bands(=16) bucket rows
    # (posexplode of the fixed-width band array), so the written-table
    # cardinalities are pure functions of the corpus slice.
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) * 16 AS BIGINT) AS n_bucket_rows
    FROM documents WHERE doc_id % 10 < 8
    """,
    description="MinHash-LSH dedup index build, timed end-to-end into "
    "a fresh Delta dir (one signature pass feeding the band-partitioned "
    "bucket table + the signatures table) — the build half of the "
    "incremental-dedup serving shape; returns written-table "
    "cardinalities",
)
def dedup_incremental_index_build(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os as _os

    from ..core.tmp import session_tmp
    from ..functions.dedup_index import build_dedup_index
    from ..tables.delta_table import DeltalakeTable

    base = session_tmp("datarepo_dedup_index_build_")
    uri = _os.path.join(base, "documents_lsh")
    corpus = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 < 8
    )
    build_dedup_index(spark, corpus, uri)
    sigs = DeltalakeTable(
        "lsh_sigs_build", _os.path.join(uri, "signatures")
    )(spark=spark)
    buckets = DeltalakeTable(
        "lsh_buckets_build", _os.path.join(uri, "buckets")
    )(spark=spark)
    return sigs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    ).crossJoin(
        buckets.agg(
            F.count(F.lit(1)).cast("long").alias("n_bucket_rows")
        )
    )


# -- Naive Bayes classifier (model-based filtering, relational form) ---------

from ..functions import classify as CL  # noqa: E402


@register(
    "classify_nb_language",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(LIST_FILTER(
               regexp_split_to_array(lower(text), '\s+'),
               t -> LEN(t) > 0)) AS tok
      FROM documents
    ), labels AS (
      SELECT doc_id, lang AS label FROM documents
    ), lab_set AS (
      SELECT DISTINCT lang AS label FROM documents
    ), counts AS (
      SELECT t.tok, l.label, COUNT(*) AS c
      FROM toks t JOIN labels l USING (doc_id)
      GROUP BY 1, 2
    ), totals AS (
      SELECT label, CAST(SUM(c) AS BIGINT) AS tt FROM counts GROUP BY 1
    ), vocab AS (
      SELECT COUNT(DISTINCT tok) AS v FROM toks
    ), priors AS (
      SELECT lang AS label,
             CAST(ROUND(LN(COUNT(*) * 1.0 /
               (SELECT COUNT(*) FROM documents)), 6)
               AS DECIMAL(38,6)) AS prior
      FROM documents GROUP BY 1
    ), sc AS (
      SELECT t.doc_id, ls.label,
             CAST(ROUND(LN((COALESCE(c.c, 0) + 1.0)
                           / (tt.tt + 1.0 * vocab.v)), 6)
                  AS DECIMAL(38,6)) AS lp
      FROM toks t
      CROSS JOIN lab_set ls
      LEFT JOIN counts c ON c.tok = t.tok AND c.label = ls.label
      JOIN totals tt ON tt.label = ls.label
      CROSS JOIN vocab
    ), agg AS (
      SELECT doc_id, label, SUM(lp) AS s FROM sc GROUP BY 1, 2
    ), ranked AS (
      SELECT a.doc_id, a.label,
             ROW_NUMBER() OVER (
               PARTITION BY a.doc_id
               ORDER BY a.s + p.prior DESC, a.label) AS rn
      FROM agg a JOIN priors p ON p.label = a.label
    )
    SELECT r.doc_id, r.label AS predicted,
           (r.label = d.lang) AS correct
    FROM ranked r JOIN documents d USING (doc_id)
    WHERE rn = 1
    """,
    description="multinomial Naive Bayes language classifier, trained "
    "and scored relationally (count aggregates + score join + per-doc "
    "reduce; DECIMAL log-prob sums) — the oracle recomputes the whole "
    "model bit-for-bit",
)
def classify_nb_language(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return CL.nb_classify(docs, "text", "lang", "doc_id")


# -- event analytics: funnel + retention -------------------------------------

from ..functions import funnel as FN  # noqa: E402


@register(
    "events_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS stage_1_ts
      FROM events WHERE event_type = 'view' GROUP BY 1
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS stage_2_ts
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.stage_1_ts
      GROUP BY 1
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS stage_3_ts
      FROM events e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.stage_2_ts
      GROUP BY 1
    )
    SELECT s1.user_id, s1.stage_1_ts, s2.stage_2_ts, s3.stage_3_ts,
           CAST(1 + (s2.user_id IS NOT NULL)::INT
                  + (s3.user_id IS NOT NULL)::INT AS INT)
             AS stages_completed
    FROM s1
    LEFT JOIN s2 ON s1.user_id = s2.user_id
    LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
    description="ordered funnel view→click→purchase: stage k's reach "
    "time is a conditional min after stage k-1 — user-keyed "
    "aggregations, no per-user sort, no MATCH_RECOGNIZE engine needed",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return FN.funnel(e, ["view", "click", "purchase"])


@register(
    "events_retention",
    oracle="""
    WITH weeks AS (
      SELECT user_id, CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS w
      FROM events
    ), cohorts AS (
      SELECT user_id, MIN(w) AS cohort_week FROM weeks GROUP BY 1
    ), activity AS (
      SELECT DISTINCT user_id, w AS active_week FROM weeks
    )
    SELECT c.cohort_week,
           CAST(DATE_DIFF('day', CAST(c.cohort_week AS DATE),
                          CAST(a.active_week AS DATE)) / 7
                AS INT) AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM activity a JOIN cohorts c USING (user_id)
    GROUP BY 1, 2
    """,
    description="weekly cohort retention matrix: two aggregates + one "
    "join (first-activity cohort x active-week offset)",
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return FN.cohort_retention(e)


@register(
    "events_transition_matrix",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ordered WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
    description="event-transition (Markov bigram) matrix: per-user "
    "LEAD over (ts, event_id) then a pair count — one window partition "
    "per user, one aggregate",
)
def events_transition_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    )
    return (
        ordered.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "pipeline_mixture_sample",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, source,
             CAST({X.sql_token_count('text', X.WS_TOKEN_RE)} AS BIGINT)
               AS n_tokens,
             {SP.sql_hash_fraction('doc_id', salt='mixture')} AS u
      FROM documents
    ), totals AS (
      SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS total
      FROM toks GROUP BY 1
    ), rates AS (
      SELECT t.source,
             LEAST(CAST(1.0 AS DOUBLE),
                   CAST(2000.0 AS DOUBLE) * CAST(w.w AS DOUBLE)
                     / CAST(t.total AS DOUBLE)) AS rate
      FROM totals t
      JOIN (VALUES ('src1', 0.5), ('src2', 0.3), ('src3', 0.2))
        AS w(source, w) USING (source)
    )
    SELECT tk.doc_id, tk.source, tk.n_tokens
    FROM toks tk JOIN rates r USING (source)
    WHERE tk.u < r.rate
    """,
    description="pretraining mixture sampling: per-source keep rates "
    "sized so kept-token mass matches budget x weight (Pile/LLaMA "
    "recipe); two aggregates + broadcast rates + zero-RNG hash keep",
)
def pipeline_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return SP.mixture_sample(
        docs,
        {"src1": 0.5, "src2": 0.3, "src3": 0.2},
        token_budget=2000,
    )


@register(
    "pipeline_token_budget",
    # The oracle is the NAIVE form (global sort + running sum); the
    # engine runs the bucketed two-level plan (coarse token-mass cumsum
    # over ≤1000 buckets, exact sort of the one boundary bucket only) —
    # proven equivalent because the bucket id is monotone in score, so
    # the greedy (quality DESC, doc_id ASC) order visits whole buckets
    # in id order and the budget lands inside exactly one of them.
    oracle=rf"""
    WITH m AS (
      SELECT doc_id,
             {X.sql_quality_inputs('text')},
             CAST({X.sql_token_count('text', X.WS_TOKEN_RE)} AS BIGINT)
               AS tokens
      FROM documents
    ), q AS (
      SELECT doc_id, {X.SQL_QUALITY_FORMULA} AS quality, tokens FROM m
    ), c AS (
      SELECT doc_id, quality, tokens,
             SUM(tokens) OVER (
               ORDER BY quality DESC, doc_id ASC
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM q
    )
    SELECT doc_id, quality, tokens FROM c WHERE cum <= 10000
    """,
    description="token-budget corpus selection: greedy best-quality "
    "prefix under a 10k-token budget via the two-level bucket plan "
    "(coarse mass cumsum + exact boundary-bucket sort) — the corpus "
    "never globally sorts",
)
def pipeline_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        X.quality_score(F.col("text")).alias("quality"),
        X.token_count(F.col("text"), X.WS_TOKEN_RE)
        .cast("long")
        .alias("tokens"),
    )
    return SP.token_budget_select(
        scored, budget=10_000, score_col="quality", token_col="tokens"
    )


@register(
    "text_normalize",
    oracle=rf"""
    WITH n AS (
      SELECT doc_id, {X.sql_normalize_text('text')} AS normalized
      FROM documents
    )
    SELECT doc_id, normalized,
           CAST(LEN(normalized) AS INT) AS n_chars
    FROM n
    """,
    description="corpus pre-clean: tag strip, control chars, "
    "typographic quote/dash folding, whitespace collapse — one chained "
    "regexp projection (zero shuffle), shared rule list keeps engine "
    "and oracle byte-identical",
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    norm = X.normalize_text(F.col("text"))
    return docs.select(
        "doc_id",
        norm.alias("normalized"),
        F.length(norm).cast("int").alias("n_chars"),
    )


@register(
    "join_fuzzy_link",
    oracle="""
    WITH lv AS (
      SELECT s_suppkey AS lid, s_name AS key_left,
             UNNEST(LIST_DISTINCT(LIST_PREPEND(s_name,
               LIST_TRANSFORM(RANGE(1, LEN(s_name) + 1),
                 i -> substr(s_name, 1, i - 1)
                      || substr(s_name, i + 1, LEN(s_name)))))) AS var
      FROM supplier WHERE s_suppkey % 2 = 0
    ), rv AS (
      SELECT s_suppkey AS rid, s_name AS key_right,
             UNNEST(LIST_DISTINCT(LIST_PREPEND(s_name,
               LIST_TRANSFORM(RANGE(1, LEN(s_name) + 1),
                 i -> substr(s_name, 1, i - 1)
                      || substr(s_name, i + 1, LEN(s_name)))))) AS var
      FROM supplier WHERE s_suppkey % 2 = 1
    )
    SELECT DISTINCT lid AS left_id, rid AS right_id,
           key_left, key_right,
           CAST(levenshtein(key_left, key_right) AS INT) AS distance
    FROM lv JOIN rv USING (var)
    WHERE levenshtein(key_left, key_right) <= 1
    """,
    description="cross-frame fuzzy record linkage (entity resolution): "
    "two tables' deletion neighborhoods equi-joined, inline levenshtein "
    "verify — never a cross join",
)
def join_fuzzy_link(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load(spark, sf_dir, "supplier")
    left = supplier.filter(F.col("s_suppkey") % 2 == 0)
    right = supplier.filter(F.col("s_suppkey") % 2 == 1)
    return FZ.fuzzy_link(
        left, right, "s_name", "s_suppkey", "s_suppkey"
    )


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH m AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS s1,
             -- product cast back to scale 6 to match Spark's
             -- decimal(38,6) * decimal(38,6) -> decimal(38,6) result
             CAST(SUM(CAST(CAST(value AS DECIMAL(38,6))
                           * CAST(value AS DECIMAL(38,6))
                           AS DECIMAL(38,6))) AS DOUBLE) AS s2
      FROM events GROUP BY 1
    ), stats AS (
      -- the variance numerator can round to a tiny NEGATIVE double for
      -- constant-valued groups; guard it or SQRT errors (DuckDB) /
      -- yields NaN that passes sigma > 0 (Spark)
      SELECT event_type, n, s1 / n AS mu,
             s2 - s1 * s1 / n AS num,
             SQRT(GREATEST(s2 - s1 * s1 / n, 0) / (n - 1)) AS sigma
      FROM m WHERE n > 1
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - st.mu) / st.sigma, 4) AS z
    FROM events e JOIN stats st USING (event_type)
    WHERE st.num > 0
      AND ABS((e.value - st.mu) / st.sigma) > 3.0
    """,
    description="per-type z-score anomaly flags: moments accumulate as "
    "DECIMAL sums (order- and engine-exact, unlike stddev's float "
    "accumulator), scalar stats broadcast back, |z| > 3 rows surface",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(38,6)")
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("s1"),
        F.sum((dec * dec).cast("decimal(38,6)")).cast("double").alias("s2"),
    ).filter(F.col("n") > 1)
    num = F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")
    stats = m.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mu"),
        num.alias("num"),
        F.sqrt(F.greatest(num, F.lit(0.0)) / (F.col("n") - 1)).alias(
            "sigma"
        ),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        e.join(F.broadcast(stats), "event_type")
        .filter((F.col("num") > 0) & (F.abs(z) > 3.0))
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(z, 4).alias("z"),
        )
    )


@register(
    "events_sliding_window",
    oracle=f"""
    WITH slid AS (
      SELECT event_type, value,
             UNNEST([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts)
                       - INTERVAL '30 minutes']) AS window_start
      FROM events
    )
    SELECT window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {SQL_DSUM('value')} AS total_value
    FROM slid
    GROUP BY 1, 2
    """,
    description="sliding 1h window / 30m slide aggregation (each event "
    "lands in two windows — the batch twin of streaming sliding "
    "windows); oracle derives both window starts per event",
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour", "30 minutes"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Ranking + mixing (functions/ranking.py, functions/sampling.py) — round 5
# ---------------------------------------------------------------------------

from ..functions import ranking as RK  # noqa: E402


@register(
    "sample_weighted",
    # Efraimidis–Spirakis rank u^(1/w): pow() can differ in the last ulp
    # across libms, so BOTH engines round the rank to 12 decimals and
    # tiebreak on doc_id — the boundary row can never flip.
    oracle=f"""
    SELECT doc_id, n_chars
    FROM documents
    ORDER BY ROUND(POW({SP.sql_hash_fraction('doc_id', salt='wsample')},
                       1.0 / (n_chars + 1)), 12) DESC, doc_id
    LIMIT 100
    """,
    description="weighted sample without replacement (A-Res, "
    "deterministic sha variate): inclusion odds proportional to doc "
    "length; one scan + TakeOrdered, no corpus shuffle",
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return SP.weighted_sample(
        docs, F.col("n_chars") + F.lit(1), 100, "doc_id"
    ).select("doc_id", "n_chars")


@register(
    "sample_group_quota",
    # the raw sha variate is exact in both engines (hex→int is exact,
    # the divisor is a power of two) — no rounding needed for the order
    oracle=f"""
    WITH r AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {SP.sql_hash_fraction('doc_id', salt='quota')},
                        doc_id
             ) AS rn
      FROM documents
    )
    SELECT doc_id, source FROM r WHERE rn <= 10
    """,
    description="per-source quota cap (data-mixing primitive): keep a "
    "deterministic uniform subset of at most N rows per group — one "
    "shuffle keyed on the group",
)
def sample_group_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return SP.group_quota_sample(docs, "source", 10, "doc_id").select(
        "doc_id", "source"
    )


@register(
    "text_tfidf_keywords",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id,
             UNNEST(LIST_FILTER(
               regexp_split_to_array(lower(text), '\s+'),
               t -> LEN(t) > 0)) AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM tok GROUP BY doc_id, token
    ), dfreq AS (
      SELECT token, COUNT(*) AS df_t FROM tf GROUP BY token
    ), n AS (
      SELECT COUNT(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.token,
             ROUND(tf.tf * ROUND(LN(CAST(n.n_docs AS DOUBLE) / df_t), 9),
                   6) AS score
      FROM tf JOIN dfreq USING (token) CROSS JOIN n
    ), ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY score DESC, token
             ) AS rn
      FROM scored
    )
    SELECT doc_id, token, score FROM ranked WHERE rn <= 3
    """,
    description="TF-IDF characteristic terms per document: token "
    "explode → (doc,token)/(token) aggregates → broadcast N → ranking "
    "window; text never shuffles",
)
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return RK.tfidf_keywords(docs, k=3)


@register(
    "text_bm25_search",
    # same ln-rounding discipline as TF-IDF; per-term scores rounded
    # before the sum so the fold is exact in both engines. dl is a
    # row-wise regexp token count (Spark: size(tokens) — no explode),
    # avgdl averages over ALL docs; dl values are integer-valued, so
    # the avg is exact under any accumulation order.
    oracle=rf"""
    WITH dl AS (
      SELECT doc_id,
             CAST({X.sql_token_count('text', X.WS_TOKEN_RE)} AS DOUBLE)
               AS dl
      FROM documents
    ), corpus AS (
      SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl
    ), tok AS (
      SELECT doc_id,
             UNNEST(LIST_FILTER(
               regexp_split_to_array(lower(text), '\s+'),
               t -> LEN(t) > 0)) AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM tok WHERE token IN ('hash', 'join', 'scan')
      GROUP BY doc_id, token
    ), tfd AS (
      SELECT *, COUNT(*) OVER (PARTITION BY token) AS df_t FROM tf
    ), per_term AS (
      SELECT tfd.doc_id,
             ROUND(
               ROUND(LN((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0), 9)
               * (tfd.tf * 2.2)
               / (tfd.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl)),
               6) AS term_score
      FROM tfd
      JOIN dl USING (doc_id)
      CROSS JOIN corpus
    )
    SELECT doc_id, ROUND(SUM(term_score), 6) AS score
    FROM per_term
    GROUP BY doc_id
    ORDER BY score DESC, doc_id
    LIMIT 20
    """,
    description="BM25 lexical search (Robertson/Walker): query-token "
    "filtered TF, broadcast N/avgdl scalars, global top-k — the "
    "retrieval primitive for corpus search/decontamination",
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return RK.bm25_search(docs, ["hash", "join", "scan"], k=20)


from ..functions import graph as G  # noqa: E402


@register(
    "graph_pagerank",
    # 3 synchronous iterations unrolled as CTEs, entirely in INTEGER
    # micro-units (1.0 = 1e6): per-edge term floor(rank_u/deg), update
    # 150000 + floor(85*sum/100) — integer sums are order-insensitive
    # and floor-of-quotient is engine-exact, so the fixed point is
    # bit-identical across engines (float sums / double->decimal casts
    # both diverge on tie values). Mean-1 normalized form. The
    # symmetric trade graph has NO dangling nodes, so the engine's
    # dangling-mass redistribution term is identically zero here and
    # the oracle omits it (pinned nonzero in tests/test_graph.py).
    oracle="""
    WITH base AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
                      's' || CAST(l_suppkey AS VARCHAR) AS b
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), edges AS (
      SELECT a AS src, b AS dst FROM base
      UNION ALL
      SELECT b AS src, a AS dst FROM base
    ), deg AS (
      SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src
    ), nodes AS (
      SELECT DISTINCT src AS node FROM edges
      UNION
      SELECT DISTINCT dst AS node FROM edges
    ), r0 AS (
      SELECT node, CAST(1000000 AS BIGINT) AS rank_micro FROM nodes
    ), c1 AS (
      SELECT e.dst AS node,
             SUM(CAST(FLOOR(r.rank_micro / d.deg) AS BIGINT)) AS c
      FROM edges e JOIN r0 r ON e.src = r.node JOIN deg d ON e.src = d.node
      GROUP BY e.dst
    ), r1 AS (
      SELECT n.node,
             CAST(150000 + CAST(FLOOR(85 * COALESCE(c1.c, 0) / 100)
                                AS BIGINT) AS BIGINT) AS rank_micro
      FROM nodes n LEFT JOIN c1 ON n.node = c1.node
    ), c2 AS (
      SELECT e.dst AS node,
             SUM(CAST(FLOOR(r.rank_micro / d.deg) AS BIGINT)) AS c
      FROM edges e JOIN r1 r ON e.src = r.node JOIN deg d ON e.src = d.node
      GROUP BY e.dst
    ), r2 AS (
      SELECT n.node,
             CAST(150000 + CAST(FLOOR(85 * COALESCE(c2.c, 0) / 100)
                                AS BIGINT) AS BIGINT) AS rank_micro
      FROM nodes n LEFT JOIN c2 ON n.node = c2.node
    ), c3 AS (
      SELECT e.dst AS node,
             SUM(CAST(FLOOR(r.rank_micro / d.deg) AS BIGINT)) AS c
      FROM edges e JOIN r2 r ON e.src = r.node JOIN deg d ON e.src = d.node
      GROUP BY e.dst
    ), r3 AS (
      SELECT n.node,
             CAST(150000 + CAST(FLOOR(85 * COALESCE(c3.c, 0) / 100)
                                AS BIGINT) AS BIGINT) AS rank_micro
      FROM nodes n LEFT JOIN c3 ON n.node = c3.node
    )
    SELECT node, rank_micro, rank_micro / 1000000.0 AS rank
    FROM r3 ORDER BY rank_micro DESC, node LIMIT 20
    """,
    description="PageRank (3 fixed iterations, mean-1 normalized) on "
    "the bipartite customer<->supplier trade graph: per-iteration one "
    "edges-by-ranks join + one contribution aggregate, the Pregel step "
    "flattened into Catalyst; the graph never collects",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The iteration runs on LONG node ids (customer 2k, supplier 2k+1
    # — injective, so the graph is isomorphic and every integer rank
    # is bit-identical; r13, guide §2.3 narrower shuffle keys); the
    # 'c…'/'s…' display strings are re-derived only on the final
    # O(nodes) frame. PageRank uses node identity alone — no
    # order-sensitivity — so the encoding cannot change any value.
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
        )
        .distinct()
    )
    edges = base.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(base.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    pr = G.pagerank(edges, iterations=3)
    decoded = pr.select(
        F.concat(
            F.when(F.col("node").bitwiseAND(1) == 0, F.lit("c")).otherwise(
                F.lit("s")
            ),
            F.shiftright(F.col("node"), 1).cast("string"),
        ).alias("node"),
        "rank_micro",
        "rank",
    )
    return decoded.orderBy(F.desc("rank_micro"), F.asc("node")).limit(20)


@register(
    "text_bigram_perplexity",
    # same decimal-exact fold as text_perplexity; context counts and
    # vocabulary derive from the bigram table (window + scalar), so
    # both engines train the identical model from one tokenize pass
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             LIST_FILTER(regexp_split_to_array(lower(text), '\s+'),
                         x -> LEN(x) > 0) AS l
      FROM documents
    ), bg AS (
      SELECT doc_id,
             l[CAST(i AS INT)] AS w1,
             l[CAST(i AS INT) + 1] AS w2
      FROM t, UNNEST(RANGE(1, LEN(l))) AS u(i)
      WHERE LEN(l) >= 2
    ), counts AS (
      SELECT w1, w2, COUNT(*) AS c12,
             SUM(COUNT(*)) OVER (PARTITION BY w1) AS c1
      FROM bg GROUP BY w1, w2
    ), v AS (
      SELECT COUNT(DISTINCT w2) AS vsz FROM counts
    ), occ AS (
      SELECT bg.doc_id,
             CAST(ROUND(LN((c12 + 1.0) / (c1 + 1.0 * vsz)), 6)
                  AS DECIMAL(38,6)) AS lp
      FROM bg JOIN counts USING (w1, w2) CROSS JOIN v
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           ROUND(EXP(-(CAST(SUM(lp) AS DOUBLE) / COUNT(*))), 4)
             AS perplexity
    FROM occ
    GROUP BY doc_id
    """,
    description="bigram-LM perplexity filter (sequence-aware upgrade of "
    "the CCNet-style unigram filter): one tokenize pass, context counts "
    "via window over the bigram table, decimal-exact log-prob fold",
)
def text_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return X.bigram_perplexity(docs)


@register(
    "dedup_lines_c4",
    # winner = lexicographic min (doc_id, pos); the oracle encodes it as
    # doc_id*1e6+pos (positions are far below 1e6), which orders
    # identically. Short lines (< 5 ws tokens) never dedup — C4's
    # formatting carve-out.
    oracle=rf"""
    WITH src AS (
      SELECT doc_id, COALESCE(text, '') AS t FROM documents
    ), {D.sql_line_dedup_ctes()}, agg AS (
      SELECT doc_id,
             STRING_AGG(line, chr(10) ORDER BY pos) AS text,
             COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT s.doc_id,
           SHA256(COALESCE(a.text, '')) AS text_hash,
           CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_lines_kept,
           CAST(LEN(string_split(s.t, chr(10))) - COALESCE(a.n_kept, 0)
                AS BIGINT) AS n_lines_dropped
    FROM src s LEFT JOIN agg a USING (doc_id)
    """,
    description="C4-style cross-corpus line dedup with document "
    "reassembly: repeated boilerplate lines survive only at their first "
    "(doc, position); one explode, a min-struct winner aggregate keyed "
    "on line content, a content join, and a per-document "
    "sort_array(collect_list) stitch — shuffles carry lines, never "
    "documents",
)
def dedup_lines_c4(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    out = D.line_dedup(docs)
    return out.select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("text_hash"),
        "n_lines_kept",
        "n_lines_dropped",
    )


@register(
    "pipeline_length_buckets",
    # pad-to-multiple-of-16 batching plan: bucket = ceil(tokens/16)
    # capped at 32 (pad_to 512); docs past the cap truncate, so their
    # per-doc waste clamps at 0 instead of going negative. Integer
    # arithmetic only — no log2 float hazards near power boundaries.
    oracle=rf"""
    WITH t AS (
      SELECT doc_id,
             CAST({X.sql_token_count('text', X.WS_TOKEN_RE)} AS BIGINT)
               AS n_tokens
      FROM documents
    ), b AS (
      SELECT doc_id, n_tokens,
             LEAST(CAST(FLOOR((n_tokens + 15) / 16) AS BIGINT), 32) AS bucket
      FROM t
    )
    SELECT bucket,
           CAST(bucket * 16 AS BIGINT) AS pad_to,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(GREATEST(bucket * 16 - n_tokens, 0)) AS BIGINT)
             AS padding_waste
    FROM b
    GROUP BY bucket
    """,
    description="length-bucketed batching plan (pad-to-multiple-of-16): "
    "per bucket doc count, real tokens, and padding waste — the numbers "
    "that size training batches; one scan, one tiny aggregate",
)
def pipeline_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n_tokens = X.token_count(F.col("text"), X.WS_TOKEN_RE).cast("long")
    bucket = F.least(
        F.floor((n_tokens + F.lit(15)) / F.lit(16)).cast("long"),
        F.lit(32).cast("long"),
    )
    b = docs.select(
        n_tokens.alias("n_tokens"), bucket.alias("bucket")
    )
    return b.groupBy("bucket").agg(
        (F.col("bucket") * 16).alias("pad_to"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(
            F.greatest(
                F.col("bucket") * 16 - F.col("n_tokens"), F.lit(0)
            )
        ).alias("padding_waste"),
    )


@register(
    "pipeline_curate_v2",
    # the round-5 curation chain: cross-corpus line dedup (boilerplate
    # removal) -> quality score over the CLEANED text -> exact dedup ->
    # per-source quota mixing. Every stage reuses an already-proven SQL
    # mirror; the stages compose as CTEs exactly as the operators
    # compose as DataFrames.
    oracle=rf"""
    WITH src AS (
      SELECT doc_id, COALESCE(text, '') AS t, source FROM documents
    ), {D.sql_line_dedup_ctes()}, cleaned AS (
      SELECT doc_id, STRING_AGG(line, chr(10) ORDER BY pos) AS ct
      FROM kept GROUP BY doc_id
    ), q AS (
      SELECT doc_id, source, ct,
             {X.SQL_QUALITY_FORMULA} AS quality
      FROM (
        SELECT c.doc_id, s.source, c.ct,
               {X.sql_quality_inputs('c.ct')}
        FROM cleaned c JOIN src s USING (doc_id)
      )
    ), filt AS (
      SELECT * FROM q WHERE quality >= 0.5
    ), ded AS (
      SELECT MIN(doc_id) AS doc_id
      FROM filt GROUP BY sha256(lower(trim(ct)))
    ), surv AS (
      SELECT f.doc_id, f.source, f.quality
      FROM filt f JOIN ded USING (doc_id)
    ), ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {SP.sql_hash_fraction('doc_id', salt='quota')},
                        doc_id
             ) AS rn
      FROM surv
    )
    SELECT doc_id, source, quality FROM ranked WHERE rn <= 15
    """,
    description="curation v2: cross-corpus line dedup -> quality on the "
    "cleaned text -> exact dedup -> per-source quota mix — the round-5 "
    "operators composed end-to-end, stage mirrors composed as CTEs",
)
def pipeline_curate_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    cleaned = D.line_dedup(docs).filter(F.col("n_lines_kept") > 0)
    scored = (
        cleaned.join(docs.select("doc_id", "source"), "doc_id")
        .select(
            "doc_id",
            "source",
            "text",
            X.quality_score(F.col("text")).alias("quality"),
        )
    )
    filt = scored.filter(F.col("quality") >= 0.5)
    surv = D.exact_dedup_project(filt, ["doc_id", "source", "quality"])
    return SP.group_quota_sample(surv, "source", 15, "doc_id").select(
        "doc_id", "source", "quality"
    )


@register(
    "profile_histogram",
    # bucket index = floor((v - min) * k / (max - min)) clamped — pure
    # double arithmetic on identical inputs, deterministic both engines
    oracle="""
    WITH b AS (
      SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
      FROM orders WHERE o_totalprice IS NOT NULL
    ), idx AS (
      SELECT LEAST(15, CAST(FLOOR(
               (o_totalprice - b.lo) * 16 / (b.hi - b.lo)) AS INT))
               AS bucket,
             b.lo AS blo, b.hi AS bhi
      FROM orders, b WHERE o_totalprice IS NOT NULL
    )
    SELECT bucket,
           ROUND(MIN(blo) + bucket * (MIN(bhi) - MIN(blo)) / 16, 6) AS lo,
           ROUND(MIN(blo) + (bucket + 1) * (MIN(bhi) - MIN(blo)) / 16, 6)
             AS hi,
           COUNT(*) AS n
    FROM idx
    GROUP BY bucket
    """,
    description="equi-width histogram profile of a numeric column: one "
    "whole-frame bounds aggregate broadcast back + one bucket-keyed "
    "count — the distribution card next to the min/max profile",
)
def profile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.profile import histogram

    orders = load(spark, sf_dir, "orders")
    return histogram(orders, "o_totalprice", 16)


@register(
    "pipeline_nucleus_topp",
    # Oracle is the NAIVE per-group form (sort each group + running
    # sum); the engine runs the bucketed two-level plan per group
    # (coarse mass cumsum over <=1000 buckets, exact sort of the one
    # boundary bucket per group) — equivalent because the bucket id is
    # monotone in score and equal scores share a bucket, so the greedy
    # order visits whole buckets in order and the p*total threshold
    # lands inside exactly one of them.
    oracle="""
    WITH t AS (
      SELECT lang, SUM(n_chars) AS total FROM documents GROUP BY lang
    ), c AS (
      SELECT d.doc_id, d.lang, d.n_chars,
             SUM(d.n_chars) OVER (
               PARTITION BY d.lang
               ORDER BY d.n_chars DESC, d.doc_id ASC
               ROWS UNBOUNDED PRECEDING) - d.n_chars AS before_mass,
             t.total AS total
      FROM documents d JOIN t USING (lang)
    )
    SELECT doc_id, lang, n_chars FROM c WHERE before_mass < 0.5 * total
    """,
    description="per-group nucleus (top-p) selection: each language "
    "keeps its highest-mass documents until p=0.5 of the group's char "
    "mass is covered — two-level bucket plan, no group ever globally "
    "sorts in one task",
)
def pipeline_nucleus_topp(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return SP.nucleus_select(
        docs.select("doc_id", "lang", "n_chars"),
        group_cols=["lang"],
        score_col="n_chars",
        p=0.5,
    )


@register(
    "profile_winsorized",
    # Rank-based order statistics (value at CEIL(q*n) of the
    # (value, id) ascending order) — bit-identical across engines,
    # unlike interpolated percentiles. DuckDB SUM(int)->HUGEINT is
    # cast back to BIGINT.
    oracle="""
    WITH r AS (
      SELECT lang, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents
    ), m AS (
      SELECT lang, MAX(n) AS n,
             GREATEST(1, CAST(CEIL(0.05 * MAX(n)) AS BIGINT)) AS lor,
             GREATEST(1, CAST(CEIL(0.95 * MAX(n)) AS BIGINT)) AS hir
      FROM r GROUP BY lang
    ), env AS (
      SELECT r.lang,
             MIN(CASE WHEN r.rn = m.lor THEN r.n_chars END) AS lo,
             MAX(CASE WHEN r.rn = m.hir THEN r.n_chars END) AS hi
      FROM r JOIN m USING (lang)
      WHERE r.rn = m.lor OR r.rn = m.hir
      GROUP BY r.lang
    )
    SELECT d.lang,
           COUNT(*) AS n_rows,
           MIN(e.lo) AS lo,
           MAX(e.hi) AS hi,
           CAST(SUM(CASE WHEN d.n_chars < e.lo THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clamped_low,
           CAST(SUM(CASE WHEN d.n_chars > e.hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clamped_high,
           CAST(SUM(GREATEST(e.lo, LEAST(e.hi, d.n_chars)))
                AS BIGINT) AS winsorized_sum,
           ROUND(CAST(SUM(GREATEST(e.lo, LEAST(e.hi, d.n_chars)))
                      AS DOUBLE) / COUNT(*), 6) AS winsorized_mean
    FROM documents d JOIN env e USING (lang)
    GROUP BY d.lang
    """,
    description="per-language winsorized length profile: exact "
    "rank-based p05/p95 envelope, clamped sums in BIGINT, one rank "
    "window + broadcast envelope join",
)
def profile_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.profile import winsorized_stats

    docs = load(spark, sf_dir, "documents")
    return winsorized_stats(
        docs, "n_chars", group_cols=["lang"], lower=0.05, upper=0.95
    )


@register(
    "similarity_kmeans_assign",
    # Deterministic k-means assignment step against k=8 FIXED centroids
    # (the first 8 vectors by id): the oracle-parity twin of the IVF
    # coarse quantizer's assign. Cosines are sequential double folds
    # (LIST_REDUCE == Catalyst aggregate fold, same order), rounded to
    # 6; per-cell sums accumulate in DECIMAL(38,6) so group order
    # cannot change the result. The engine computes the argmax row-
    # local (transform over the broadcast centroid literals +
    # array_position, ties -> lowest cell) — no row explosion, no
    # window; the only shuffle is the final k-row aggregate.
    oracle="""
    WITH v AS (
      SELECT vec_id,
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), n AS (
      SELECT vec_id, e,
             SQRT(LIST_REDUCE(LIST_TRANSFORM(e, x -> x * x),
                              (a, x) -> a + x)) AS nrm
      FROM v
    ), cents AS (
      SELECT vec_id AS cell, e AS c, nrm AS cnrm FROM n WHERE vec_id < 8
    ), sims AS (
      SELECT a.vec_id, cents.cell,
             ROUND(
               LIST_REDUCE(LIST_TRANSFORM(RANGE(1, 65),
                                          i -> a.e[i] * cents.c[i]),
                           (acc, x) -> acc + x) / (a.nrm * cents.cnrm),
               6) AS sim
      FROM n a CROSS JOIN cents
    ), best AS (
      SELECT vec_id, cell, sim,
             ROW_NUMBER() OVER (
               PARTITION BY vec_id ORDER BY sim DESC, cell ASC) AS rn
      FROM sims
    )
    SELECT cell,
           COUNT(*) AS n_vectors,
           CAST(SUM(CAST(sim AS DECIMAL(38,6))) AS DECIMAL(38,6))
             AS sum_sim
    FROM best WHERE rn = 1
    GROUP BY cell
    """,
    description="k-means assignment step vs 8 fixed centroids: "
    "row-local argmax over broadcast centroid literals (no explode, "
    "no window), per-cell count + DECIMAL-stable similarity mass",
)
def similarity_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    assigned = S.assign_cells_rowlocal(
        emb.select("vec_id", "embedding"), _first_k_centroids(emb, 8)
    )
    return assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(F.round(F.col("sim"), 6).cast("decimal(38,6)")).alias(
            "sum_sim"
        ),
    )


def _first_k_centroids(emb: DataFrame, k: int) -> list:
    """Deterministic fixture centroids: the first k vectors by id —
    bounded k x dim driver collect, shared by the oracle CTE."""
    return [
        row["embedding"]
        for row in emb.filter(F.col("vec_id") < k)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    ]


@register(
    "sample_cluster_split",
    # Leakage-safe splits: the split variate keys on the near-dup
    # CLUSTER component, so a 0.95-Jaccard twin of a test document can
    # never land in train. The oracle recomputes the exact pair set
    # (inverted-index shared-gram Jaccard), closes it with a recursive
    # CTE, and applies the same sha-fraction interval split on the
    # component id.
    oracle=rf"""
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             LIST_FILTER(regexp_split_to_array(lower(text), '\s+'),
                         t -> LEN(t) > 0) AS tk
      FROM documents
    ), sh AS (
      SELECT doc_id,
             LIST_DISTINCT(
               CASE WHEN LEN(tk) >= 3
                 THEN LIST_TRANSFORM(RANGE(1, LEN(tk) - 1),
                      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                 ELSE [COALESCE(LIST_AGGREGATE(tk, 'string_agg', ' '), '')]
               END) AS s
      FROM toks
    ), gr AS (
      SELECT doc_id, LEN(s) AS ln, UNNEST(s) AS g FROM sh
    ), cnts AS (
      SELECT x.doc_id AS id_a, y.doc_id AS id_b,
             ANY_VALUE(x.ln) AS la, ANY_VALUE(y.ln) AS lb,
             COUNT(*) AS c
      FROM gr x JOIN gr y ON x.g = y.g AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    ), pairs AS MATERIALIZED (
      SELECT id_a, id_b
      FROM cnts
      WHERE ROUND(CAST(c AS DOUBLE) / (la + lb - c), 6) >= 0.5
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach AS (
      SELECT a AS id, a AS r FROM edges
      UNION
      SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id
    ), comp AS (
      SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id
    ), annotated AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    ), frac AS (
      SELECT doc_id, component,
             {SP.sql_hash_fraction('component', salt='cluster-split')} AS u
      FROM annotated
    )
    SELECT doc_id, component,
           CASE WHEN u < 0.8 THEN 'train'
                WHEN u < 0.9 THEN 'val'
                WHEN u < 1.0 THEN 'test' END AS split
    FROM frac
    """,
    description="leakage-safe train/val/test split: near-dup clusters "
    "never straddle splits (sha variate keyed on the component id; "
    "text never enters the propagation)",
)
def sample_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_dedup_pairs(docs, threshold=0.5)
    return SP.cluster_safe_split(
        docs.select("doc_id"), pairs, id_col="doc_id"
    ).select("doc_id", "component", "split")


@register(
    "sample_diverse_cells",
    # Cluster-balanced (diversity-aware) subsampling: cap every k-means
    # cell at a fixed quota so dense regions of embedding space cannot
    # dominate the sample — the cheap structural cousin of facility-
    # location selection, and the standard cluster-balanced variant of
    # uniform subsampling. Assignment is the row-local argmax against
    # fixed centroids (zero shuffle); the quota is one group-keyed
    # window over (cell, sha variate).
    oracle=f"""
    WITH v AS (
      SELECT vec_id,
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), n AS (
      SELECT vec_id, e,
             SQRT(LIST_REDUCE(LIST_TRANSFORM(e, x -> x * x),
                              (a, x) -> a + x)) AS nrm
      FROM v
    ), cents AS (
      SELECT vec_id AS cell, e AS c, nrm AS cnrm FROM n WHERE vec_id < 8
    ), sims AS (
      SELECT a.vec_id, cents.cell,
             ROUND(
               LIST_REDUCE(LIST_TRANSFORM(RANGE(1, 65),
                                          i -> a.e[i] * cents.c[i]),
                           (acc, x) -> acc + x) / (a.nrm * cents.cnrm),
               6) AS sim
      FROM n a CROSS JOIN cents
    ), best AS (
      SELECT vec_id, cell,
             ROW_NUMBER() OVER (
               PARTITION BY vec_id ORDER BY sim DESC, cell ASC) AS rn
      FROM sims
    ), assigned AS (
      SELECT vec_id, cell FROM best WHERE rn = 1
    ), quota AS (
      SELECT vec_id, cell,
             ROW_NUMBER() OVER (
               PARTITION BY cell
               ORDER BY {SP.sql_hash_fraction('vec_id', salt='diverse')},
                        vec_id
             ) AS qrn
      FROM assigned
    )
    SELECT vec_id, cell FROM quota WHERE qrn <= 40
    """,
    description="diversity-aware subsampling: row-local k-means cell "
    "assignment + deterministic per-cell quota — dense embedding "
    "regions cannot dominate the sample; one group-keyed shuffle",
)
def sample_diverse_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    assigned = S.assign_cells_rowlocal(
        emb.select("vec_id", "embedding"), _first_k_centroids(emb, 8)
    ).select("vec_id", "cell")
    return SP.group_quota_sample(
        assigned, "cell", 40, "vec_id", salt="diverse"
    )


@register(
    "pipeline_decontaminate_neardup",
    # Near-dup decontamination: drop training docs that are
    # paraphrase-level twins of eval docs — the oracle is the UNBLOCKED
    # brute-force cross-set exact Jaccard (inverted-index shared-gram
    # form), so parity also certifies the banded LSH candidate
    # generation lost no cross pair at this threshold on this corpus.
    oracle=rf"""
    WITH {D.sql_shingle_gram_ctes()}, cnts AS (
      SELECT x.doc_id AS tid, y.doc_id AS eid,
             ANY_VALUE(x.ln) AS la, ANY_VALUE(y.ln) AS lb,
             COUNT(*) AS c
      FROM gr x JOIN gr y
        ON x.g = y.g AND x.doc_id >= 50 AND y.doc_id < 50
      GROUP BY 1, 2
    ), flagged AS (
      SELECT DISTINCT tid FROM cnts
      WHERE ROUND(CAST(c AS DOUBLE) / (la + lb - c), 6) >= 0.5
    )
    SELECT d.doc_id, d.source
    FROM documents d
    WHERE d.doc_id >= 50
      AND d.doc_id NOT IN (SELECT tid FROM flagged)
    """,
    description="benchmark decontamination at paraphrase level: "
    "training docs near-duplicate (exact Jaccard >= 0.5 via banded "
    "LSH candidates) to any eval doc are dropped; eval bucket map "
    "broadcasts so the training side never shuffles for candidates",
)
def pipeline_decontaminate_neardup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") >= 50)
    eval_df = docs.filter(F.col("doc_id") < 50)
    return D.decontaminate_near_dup(
        train, eval_df, threshold=0.5
    ).select("doc_id", "source")


@register(
    "pipeline_curriculum_shards",
    # Oracle is the NAIVE single-window NTILE; the engine computes the
    # identical shard arithmetically from a two-level global rank
    # (bucket prefix + within-bucket rank) — no rangepartitioning, no
    # whole-corpus window task.
    oracle="""
    SELECT doc_id, n_chars AS score,
           CAST(NTILE(16) OVER (ORDER BY n_chars, doc_id) AS BIGINT)
             AS shard
    FROM documents
    """,
    description="curriculum sharding: exact NTILE(16) over the "
    "difficulty proxy via bucket-prefix + within-bucket rank — "
    "equal-count shards in difficulty order without a global sort",
)
def pipeline_curriculum_shards(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return SP.ntile_shards(
        docs.select("doc_id", "n_chars"), "n_chars", 16
    ).withColumnRenamed("n_chars", "score")


@register(
    "text_boilerplate_fraction",
    oracle=rf"""
    WITH {D.sql_shingle_gram_ctes()},
    nd AS (SELECT COUNT(*) AS n FROM documents),
    dfreq AS (SELECT g, COUNT(*) AS dfc FROM gr GROUP BY g),
    boiler AS (
      SELECT dfreq.g FROM dfreq, nd
      WHERE dfc >= GREATEST(2, CAST(FLOOR(0.05 * n) AS BIGINT))
    )
    SELECT gr.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS boilerplate_grams,
           ROUND(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS boilerplate_frac
    FROM gr LEFT JOIN boiler b ON gr.g = b.g
    GROUP BY gr.doc_id
    """,
    description="per-doc boilerplate fraction: grams in >=5% of docs "
    "are boilerplate (Zipf head only — the set broadcasts); one gram "
    "shuffle for document frequency, none after",
)
def text_boilerplate_fraction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return X.boilerplate_fraction(docs)


@register(
    "text_novelty_score",
    oracle=rf"""
    WITH {D.sql_shingle_gram_ctes()},
    owner AS (SELECT g, MIN(doc_id) AS ow FROM gr GROUP BY g)
    SELECT gr.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN gr.doc_id = o.ow THEN 1 ELSE 0 END)
                AS BIGINT) AS novel_grams,
           ROUND(SUM(CASE WHEN gr.doc_id = o.ow THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
    FROM gr JOIN owner o ON gr.g = o.g
    GROUP BY gr.doc_id
    """,
    description="per-doc n-gram novelty: fraction of a doc's distinct "
    "grams first seen at its id (min-id owner aggregate + one gram "
    "join) — mosaic-duplication signal pairwise Jaccard misses",
)
def text_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return X.novelty_score(docs)


@register(
    "pipeline_curate_v3",
    # The round-7 signals composed into one curation job: boilerplate
    # gate -> novelty gate -> per-language nucleus. One gram explode
    # feeds BOTH gram-set scorers (shared persist); the nucleus stage
    # runs the two-level bucket plan per language. Oracle composes the
    # same stage CTEs over the shared shingle convention.
    oracle=rf"""
    WITH {D.sql_shingle_gram_ctes()},
    nd AS (SELECT COUNT(*) AS n FROM documents),
    dfreq AS (SELECT g, COUNT(*) AS dfc FROM gr GROUP BY g),
    boiler AS (
      SELECT dfreq.g FROM dfreq, nd
      WHERE dfc >= GREATEST(2, CAST(FLOOR(0.05 * n) AS BIGINT))
    ),
    bfrac AS (
      SELECT gr.doc_id,
             SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END)
               / CAST(COUNT(*) AS DOUBLE) AS bf
      FROM gr LEFT JOIN boiler b ON gr.g = b.g
      GROUP BY gr.doc_id
    ),
    owner AS (SELECT g, MIN(doc_id) AS ow FROM gr GROUP BY g),
    nov AS (
      SELECT gr.doc_id,
             SUM(CASE WHEN gr.doc_id = o.ow THEN 1 ELSE 0 END)
               / CAST(COUNT(*) AS DOUBLE) AS nv
      FROM gr JOIN owner o ON gr.g = o.g
      GROUP BY gr.doc_id
    ),
    pool AS (
      SELECT d.doc_id, d.lang, d.n_chars
      FROM documents d
      JOIN bfrac ON d.doc_id = bfrac.doc_id
      JOIN nov ON d.doc_id = nov.doc_id
      WHERE ROUND(bfrac.bf, 6) < 0.6 AND ROUND(nov.nv, 6) >= 0.2
    ),
    t AS (SELECT lang, SUM(n_chars) AS total FROM pool GROUP BY lang),
    c AS (
      SELECT p.doc_id, p.lang, p.n_chars,
             SUM(p.n_chars) OVER (
               PARTITION BY p.lang
               ORDER BY p.n_chars DESC, p.doc_id ASC
               ROWS UNBOUNDED PRECEDING) - p.n_chars AS before_mass,
             t.total AS total
      FROM pool p JOIN t USING (lang)
    )
    SELECT doc_id, lang, n_chars FROM c WHERE before_mass < 0.7 * total
    """,
    description="curation v3: boilerplate gate (<0.6) -> novelty gate "
    "(>=0.2) -> per-language nucleus top-0.7 — the round-7 signal "
    "family composed; one shared gram explode feeds both scorers",
)
def pipeline_curate_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # r8: both gram-set signals come from ONE fused aggregate pipeline
    # (one gram-keyed agg, one join-back, one doc-keyed agg) — the gram
    # stream exchanges twice total instead of four times
    scores = X.gram_set_scores(docs).select(
        "doc_id",
        F.round("boilerplate_frac", 6).alias("bf"),
        F.round("novelty", 6).alias("nv"),
    )
    pool = (
        docs.select("doc_id", "lang", "n_chars")
        .join(scores, "doc_id")
        .filter((F.col("bf") < 0.6) & (F.col("nv") >= 0.2))
        .drop("bf", "nv")
    )
    return SP.nucleus_select(
        pool, group_cols=["lang"], score_col="n_chars", p=0.7
    ).select("doc_id", "lang", "n_chars")


@register(
    "text_quality_rank",
    # Per-source percentile rank of the quality score: heterogeneous
    # sources (web vs books vs code) have incomparable raw quality
    # distributions — mixing recipes threshold on the WITHIN-SOURCE
    # rank instead. percent_rank = (rank-1)/(n-1): one integer-pair
    # division, bit-identical across engines (ties share a rank in
    # both). One window shuffle keyed on source.
    oracle=rf"""
    WITH m AS (
      SELECT doc_id, source,
             {X.sql_quality_inputs('text')}
      FROM documents
    ), q AS (
      SELECT doc_id, source, {X.SQL_QUALITY_FORMULA} AS quality FROM m
    )
    SELECT doc_id, source, quality,
           ROUND(PERCENT_RANK() OVER (
             PARTITION BY source ORDER BY quality, doc_id), 6)
             AS quality_rank
    FROM q
    """,
    description="within-source percentile rank of quality — the "
    "cross-source normalization a mixing recipe thresholds on; one "
    "source-keyed window",
)
def text_quality_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        X.quality_score(F.col("text")).alias("quality"),
    )
    w = Window.partitionBy("source").orderBy("quality", "doc_id")
    return scored.withColumn(
        "quality_rank", F.round(F.percent_rank().over(w), 6)
    )


@register(
    "agg_mode",
    # Deterministic statistical mode per group: highest count wins,
    # ties break to the SMALLEST value — expressed as one extra tiny
    # aggregate over the (group, value, count) frame via
    # max_by-equivalent struct ordering, no window over the raw rows.
    oracle="""
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    ), r AS (
      SELECT o_orderstatus, o_orderpriority, n,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderstatus
               ORDER BY n DESC, o_orderpriority ASC) AS rn
      FROM c
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority,
           n AS mode_count
    FROM r WHERE rn = 1
    """,
    description="per-group deterministic mode (max count, ties to the "
    "smallest value): one count aggregate + one struct-max over the "
    "tiny (group, value) frame — never a window over raw rows",
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    # struct ordering: (-n nope: use n desc via max of struct(n, neg?)
    # — struct max compares fields in order, so (n, reversed-value)
    # would pick the LARGEST value on ties; instead min of struct
    # (-n, value) gives (max count, smallest value) deterministically
    best = counts.groupBy("o_orderstatus").agg(
        F.min(
            F.struct((-F.col("n")).alias("neg"), F.col("o_orderpriority"))
        ).alias("b")
    )
    return best.select(
        "o_orderstatus",
        F.col("b.o_orderpriority").alias("mode_priority"),
        (-F.col("b.neg")).alias("mode_count"),
    )


@register(
    "sample_kfold",
    # Stratified k-fold assignment: within each language, rows take
    # folds round-robin in deterministic hash order — folds are
    # EXACTLY balanced per stratum (sizes differ by at most 1), unlike
    # a floor(u*k) draw whose fold sizes are only balanced in
    # expectation. One stratum-keyed window; assignment is stable
    # under repartitioning (sha variate + id tiebreak).
    oracle=f"""
    WITH r AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY {SP.sql_hash_fraction('doc_id', salt='kfold')},
                        doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, lang,
           CAST((rn - 1) % 5 AS BIGINT) AS fold
    FROM r
    """,
    description="stratified 5-fold assignment: round-robin over the "
    "deterministic hash order within each language — folds exactly "
    "balanced per stratum, stable under repartitioning",
)
def sample_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        SP.hash_fraction(F.col("doc_id"), "kfold"), F.asc("doc_id")
    )
    return docs.select(
        "doc_id",
        "lang",
        ((F.row_number().over(w) - 1) % 5).cast("long").alias("fold"),
    )


# ---------------------------------------------------------------------------
# Round 8: containment dedup, row-local entropy, temperature mixing,
# cross-engine-exact correlation, event debounce
# ---------------------------------------------------------------------------


@register(
    "dedup_ngram_containment",
    # Containment C(A,B) = |A∩B| / min(|A|,|B|) — the asymmetric
    # doc-in-doc duplication signal Jaccard under-scores (Broder '97).
    # Inverted-index form on BOTH sides: shared-gram COUNT is the
    # intersection (grams are distinct), so no per-pair list ops; every
    # pair with containment > 0 shares a gram, so enumeration is exact.
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             LIST_FILTER(regexp_split_to_array(lower(text), '\s+'),
                         t -> LEN(t) > 0) AS tk
      FROM documents
    ), sh AS (
      SELECT doc_id,
             LIST_DISTINCT(
               CASE WHEN LEN(tk) >= 3
                 THEN LIST_TRANSFORM(RANGE(1, LEN(tk) - 1),
                      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                 ELSE [COALESCE(LIST_AGGREGATE(tk, 'string_agg', ' '), '')]
               END) AS s
      FROM toks
    ), gr AS (
      SELECT doc_id, LEN(s) AS ln, UNNEST(s) AS g FROM sh
    ), cnts AS (
      SELECT x.doc_id AS id_a, y.doc_id AS id_b,
             ANY_VALUE(x.ln) AS la, ANY_VALUE(y.ln) AS lb,
             COUNT(*) AS c
      FROM gr x JOIN gr y ON x.g = y.g AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(CAST(c AS DOUBLE) / LEAST(la, lb), 6) AS containment
    FROM cnts
    WHERE ROUND(CAST(c AS DOUBLE) / LEAST(la, lb), 6) >= 0.2
    """,
    description="exact 3-gram containment pairs (doc-in-doc duplication "
    "signal); inverted-index join, no per-pair list intersections",
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return D.containment_pairs(
        docs, "text", "doc_id", n=3, threshold=0.2
    )


@register(
    "text_char_entropy",
    # Row-local Shannon entropy: a shuffle-free quality signal (low
    # entropy = repetitive/boilerplate text). Sorted distinct-char fold
    # order makes the double sum engine-identical; log2 is libm, so
    # both sides round to 6.
    oracle=r"""
    WITH c AS (
      SELECT doc_id,
             LIST_FILTER(string_split(lower(text), ''),
                         ch -> LEN(ch) > 0) AS chars
      FROM documents
    ), k AS (
      SELECT doc_id, LEN(chars) AS n,
             LIST_TRANSFORM(
               LIST_SORT(LIST_DISTINCT(chars)),
               x -> CAST(LEN(LIST_FILTER(chars, ch -> ch = x)) AS DOUBLE)
             ) AS cnts
      FROM c
    )
    SELECT doc_id,
           ROUND(CASE WHEN n > 0 THEN
             LOG2(CAST(n AS DOUBLE))
             - LIST_AGGREGATE(
                 LIST_TRANSFORM(cnts, cc -> cc * LOG2(cc)), 'sum') / n
           ELSE 0.0 END, 6) AS entropy
    FROM k
    """,
    description="per-document character Shannon entropy — row-local "
    "(no shuffle, no explode): the scale-right per-doc quality signal",
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", X.chars_of(F.col("text")).alias("__chars")
    )
    return staged.select(
        "doc_id",
        F.round(X.char_entropy(F.col("__chars")), 6).alias("entropy"),
    )


@register(
    "pipeline_mixture_temperature",
    # w_i = n_i^0.7 / Σ n_j^0.7 — the temperature-flattened source
    # mixture (mBERT/XLM-R, LLaMA recipe). One grouped count is the
    # only corpus exchange; the window runs over the tiny group frame.
    oracle="""
    WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source)
    SELECT source, n,
           ROUND(POW(CAST(n AS DOUBLE), 0.7)
                 / SUM(POW(CAST(n AS DOUBLE), 0.7)) OVER (), 6) AS weight,
           ROUND(POW(CAST(n AS DOUBLE), 0.7)
                 / SUM(POW(CAST(n AS DOUBLE), 0.7)) OVER ()
                 * 10000.0, 3) AS expected_rows
    FROM c
    """,
    description="temperature-scaled (alpha=0.7) per-source mixture "
    "weights + expected rows for a 10k budget",
)
def pipeline_mixture_temperature(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return SP.temperature_weights(docs, "source", alpha=0.7, budget=10_000)


@register(
    "profile_correlation",
    # Pearson correlation per group, CROSS-ENGINE EXACT: built-in
    # corr() accumulates co-moments in engine-specific order, so the
    # five sums are taken in DECIMAL(38,6) (order-independent) and the
    # closed form (n·Σxy − ΣxΣy) / (√(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²))
    # runs as a fixed sequence of IEEE ops: bit-identical in Spark and
    # DuckDB. The price is downscaled by 1000 (correlation is invariant
    # under per-variable scaling) so y² stays inside the
    # engine-identical double->decimal cast range — value*10^6 must be
    # < 2^53, and a raw price² ~ 1e10 * 10^6 sits just beyond it.
    oracle=f"""
    WITH u AS (
      SELECT l_returnflag, l_quantity AS x,
             l_extendedprice / 1000.0 AS y
      FROM lineitem
    ), s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             {SQL_DSUM('x')} AS sx,
             {SQL_DSUM('y')} AS sy,
             {SQL_DSUM('x * y')} AS sxy,
             {SQL_DSUM('x * x')} AS sxx,
             {SQL_DSUM('y * y')} AS syy
      FROM u GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND((n * sxy - sx * sy)
                 / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)),
                 9) AS corr_qty_price
    FROM s
    """,
    description="per-group Pearson correlation via DECIMAL(38,6) "
    "co-moments — order-independent and bit-identical across engines",
)
def profile_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # correlation is scale-invariant: downscale the price so y² stays
    # in the engine-identical double->decimal cast range (oracle note)
    x, y = F.col("l_quantity"), F.col("l_extendedprice") / F.lit(1000.0)
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(x).alias("sx"),
        dsum(y).alias("sy"),
        dsum(x * y).alias("sxy"),
        dsum(x * x).alias("sxx"),
        dsum(y * y).alias("syy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx")) * F.sqrt(
        n * F.col("syy") - F.col("sy") * F.col("sy")
    )
    return s.select(
        "l_returnflag", "n", F.round(num / den, 9).alias("corr_qty_price")
    )


@register(
    "events_debounce",
    # Telemetry duplicate suppression: collapse each burst of same-type
    # events per user with inter-event gaps <= 60 s to one row (burst
    # head + collapsed count). Same lag-gap + cumulative-sum shape as
    # sessionization — one (user, type)-keyed window, µs-exact gaps.
    oracle="""
    WITH gaps AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) IS NULL
                  OR ts - LAG(ts) OVER (PARTITION BY user_id, event_type
                                        ORDER BY ts, event_id)
                     > INTERVAL '60 seconds'
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), b AS (
      SELECT user_id, event_type, ts,
             SUM(is_new) OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS burst_id
      FROM gaps
    )
    SELECT user_id, event_type, CAST(burst_id AS BIGINT) AS burst_id,
           MIN(ts) AS first_ts, COUNT(*) AS n_collapsed
    FROM b GROUP BY user_id, event_type, burst_id
    """,
    description="event debounce: collapse <=60s same-type bursts per "
    "user to their first event — lag-gap + cumulative-sum, one window",
)
def events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    gap = F.unix_micros(F.col("ts")) - F.lag(
        F.unix_micros(F.col("ts"))
    ).over(w)
    is_new = F.when(gap.isNull() | (gap > 60 * 1_000_000), 1).otherwise(0)
    b = e.withColumn(
        "burst_id",
        F.sum(is_new).over(
            Window.partitionBy("user_id", "event_type")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return b.groupBy("user_id", "event_type", "burst_id").agg(
        F.min("ts").alias("first_ts"),
        F.count(F.lit(1)).alias("n_collapsed"),
    )


@register(
    "similarity_radius_search",
    # Exact range search — "everything with cosine >= 0.25 of the
    # probe": row-local cosine vs the broadcast literal + filter, a
    # pure map stage (plan-asserted shuffle-free). Complement of the
    # top-k baseline; FAISS range_search semantics.
    oracle="""
    WITH v AS (
      SELECT vec_id,
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), q AS (
      SELECT e AS qe,
             SQRT(LIST_REDUCE(LIST_TRANSFORM(e, x -> x * x),
                              (a, x) -> a + x)) AS qn
      FROM v WHERE vec_id = 0
    )
    SELECT vec_id,
           ROUND(
             LIST_REDUCE(LIST_TRANSFORM(RANGE(1, 65), i -> e[i] * qe[i]),
                         (acc, x) -> acc + x)
             / (SQRT(LIST_REDUCE(LIST_TRANSFORM(e, x -> x * x),
                                 (a, x) -> a + x)) * qn),
             6) AS cosine
    FROM v, q
    WHERE ROUND(
             LIST_REDUCE(LIST_TRANSFORM(RANGE(1, 65), i -> e[i] * qe[i]),
                         (acc, x) -> acc + x)
             / (SQRT(LIST_REDUCE(LIST_TRANSFORM(e, x -> x * x),
                                 (a, x) -> a + x)) * qn),
             6) >= 0.25
    """,
    description="exact cosine range search (all vectors within the "
    "radius) — shuffle-free map stage; FAISS range_search semantics",
)
def similarity_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).head()["embedding"]
    return S.radius_search(
        emb, [float(x) for x in query], threshold=0.25
    )


@register(
    "events_sequence_ngrams",
    # User-journey mining: the 20 most common 3-step event-type
    # sequences. lead(1)/lead(2) over the per-user time order — ONE
    # (user)-keyed window exchange — then a count and TakeOrdered
    # top-k; journeys never materialize as arrays.
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS e1,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT e1, e2, e3, COUNT(*) AS n
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY e1, e2, e3
    ORDER BY n DESC, e1, e2, e3
    LIMIT 20
    """,
    description="top-20 3-step event-type journeys: lead window + "
    "count + TakeOrdered — no array materialization",
)
def events_sequence_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        seq.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "e1", "e2", "e3")
        .limit(20)
    )


@register(
    "agg_weighted_avg",
    # Weighted mean per group with DECIMAL(38,6) numerator/denominator
    # sums (order-independent, engine-exact): avg unit price weighted
    # by quantity. One grouped aggregate, partial map-side.
    oracle=f"""
    SELECT l_returnflag,
           {SQL_DSUM('l_extendedprice * l_quantity')}
             / {SQL_DSUM('l_quantity')} AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="per-group weighted average via exact decimal sums — "
    "one partial-aggregated exchange",
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        (
            dsum(F.col("l_extendedprice") * F.col("l_quantity"))
            / dsum(F.col("l_quantity"))
        ).alias("wavg_price")
    )


@register(
    "pipeline_temperature_sample",
    # The temperature weights made executable: each source contributes
    # round(w_i x budget) documents, chosen by deterministic hash rank.
    # One grouped count, the tiny quota frame broadcast back, one
    # source-keyed window — the alpha-mixing draw end to end.
    oracle=f"""
    WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    w AS (
      SELECT source,
             ROUND(POW(CAST(n AS DOUBLE), 0.7)
                   / SUM(POW(CAST(n AS DOUBLE), 0.7)) OVER (), 6) AS wt
      FROM c
    ), q AS (
      SELECT source, CAST(ROUND(wt * 300.0, 0) AS BIGINT) AS quota FROM w
    ), r AS (
      SELECT d.doc_id, d.source, q.quota,
             ROW_NUMBER() OVER (
               PARTITION BY d.source
               ORDER BY {SP.sql_hash_fraction('d.doc_id', salt='temp')},
                        d.doc_id) AS rn
      FROM documents d JOIN q USING (source)
    )
    SELECT doc_id, source FROM r WHERE rn <= quota
    """,
    description="temperature-mixture draw (alpha=0.7, 300-doc budget): "
    "per-source quota = round(weight x budget), hash-rank selection",
)
def pipeline_temperature_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return SP.temperature_sample(
        docs, "source", "doc_id", alpha=0.7, budget=300, salt="temp"
    ).select("doc_id", "source")


@register(
    "join_asof_forward",
    # The forward direction of the as-of operator (pandas merge_asof
    # direction='forward'): earliest event at-or-after each order —
    # the attribution shape ("first activity after purchase"). DuckDB
    # native ASOF with the <= inequality is the oracle.
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, e.ts AS first_event_ts
    FROM orders o
    ASOF LEFT JOIN events e
      ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    """,
    description="as-of join (forward): earliest event at-or-after each "
    "order, per customer — vs DuckDB native ASOF",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    o = load(spark, sf_dir, "orders")
    e = load(spark, sf_dir, "events")
    return asof_join(
        o.select("o_orderkey", "o_custkey", "o_orderdate"),
        e,
        left_on="o_orderdate",
        right_on="ts",
        left_by="o_custkey",
        right_by="user_id",
        payload=F.col("ts"),
        payload_name="first_event_ts",
        direction="forward",
    ).select("o_orderkey", "o_custkey", "first_event_ts")


@register(
    "profile_skew_kurtosis",
    # Higher central moments, CROSS-ENGINE EXACT like profile_correlation:
    # built-in skewness()/kurtosis() accumulate engine-specific float
    # streams, so the four power sums are taken in DECIMAL(38,6) and the
    # closed central-moment forms run as a fixed IEEE sequence.
    # Spark/DuckDB built-ins also disagree on the ESTIMATOR (sample vs
    # population); computing from sums pins the population form.
    # The price is DOWNSCALED by 1000 first: the double->DECIMAL(38,6)
    # cast is only engine-identical while value*10^6 < 2^53 (Spark casts
    # via shortest-string, DuckDB via scaled binary — they diverge
    # beyond the double's integer range), and a raw price^4 ~ 1e20 is
    # far outside it. Standardized moments are scale-invariant, so
    # u = price/1000 (u^4 <= ~1.2e8, *10^6 well under 2^53) gives the
    # SAME skewness/kurtosis with bit-identical accumulation.
    oracle=f"""
    WITH u AS (
      SELECT l_returnflag, l_extendedprice / 1000.0 AS x FROM lineitem
    ), s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             {SQL_DSUM('x')} AS s1,
             {SQL_DSUM('x * x')} AS s2,
             {SQL_DSUM('x * x * x')} AS s3,
             {SQL_DSUM('x * x * x * x')} AS s4
      FROM u GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * POW(s1 / n, 3))
                 / POW(SQRT(s2 / n - (s1 / n) * (s1 / n)), 3), 9)
             AS skewness_pop,
           ROUND((s4 / n - 4 * (s1 / n) * (s3 / n)
                  + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                  - 3 * POW(s1 / n, 4))
                 / POW(s2 / n - (s1 / n) * (s1 / n), 2) - 3, 9)
             AS excess_kurtosis_pop
    FROM s
    """,
    description="population skewness + excess kurtosis per group from "
    "DECIMAL(38,6) power sums — order-independent, engine-exact "
    "estimator (built-ins disagree on sample-vs-population)",
)
def profile_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # scale-invariant moments: downscale so every power sum stays in
    # the engine-identical double->decimal cast range (see oracle note)
    x = F.col("l_extendedprice") / F.lit(1000.0)
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(x).alias("s1"),
        dsum(x * x).alias("s2"),
        dsum(x * x * x).alias("s3"),
        dsum(x * x * x * x).alias("s4"),
    )
    n = F.col("n").cast("double")
    m1 = F.col("s1") / n
    m2 = F.col("s2") / n
    m3 = F.col("s3") / n
    m4 = F.col("s4") / n
    var = m2 - m1 * m1
    skew = (m3 - 3 * m1 * m2 + 2 * F.pow(m1, F.lit(3.0))) / F.pow(
        F.sqrt(var), F.lit(3.0)
    )
    kurt = (
        m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * F.pow(m1, F.lit(4.0))
    ) / F.pow(var, F.lit(2.0)) - 3
    return s.select(
        "l_returnflag",
        "n",
        F.round(skew, 9).alias("skewness_pop"),
        F.round(kurt, 9).alias("excess_kurtosis_pop"),
    )


@register(
    "dedup_rate_by_source",
    # The curation dashboard number: per source, how much of the corpus
    # is exact-duplicate mass. COUNT(DISTINCT sha256) over the 32-byte
    # content key — text never shuffles; one grouped aggregate.
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT sha256(lower(trim(text)))) AS n_distinct,
           ROUND(1.0 - COUNT(DISTINCT sha256(lower(trim(text))))
                 / CAST(COUNT(*) AS DOUBLE), 6) AS dup_fraction
    FROM documents
    GROUP BY source
    """,
    description="per-source exact-duplicate rate: count distinct over "
    "the 32-byte content key — text never shuffles",
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ck = D.content_key(F.col("text"))
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(ck).alias("n_distinct"),
        F.round(
            F.lit(1.0)
            - F.countDistinct(ck) / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("dup_fraction"),
    )


# ---------------------------------------------------------------------------
# r9: time-series resampling, EWMA, nearest as-of, corpus-composition entropy
# ---------------------------------------------------------------------------


@register(
    "events_ewma",
    # Truncated exponentially-weighted moving average (decay w=0.8 over
    # the last 16 events per user). Both engines fold the SAME ordered
    # window list left-to-right (acc*w + v), so the double sequence is
    # bit-identical; the final division is rounded. The window list is
    # ordered by (ts, event_id) — fully deterministic.
    oracle="""
    WITH w AS (
      SELECT event_id, user_id,
             list(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS vals
      FROM events
    )
    SELECT event_id, user_id,
           ROUND(
             list_reduce(vals, (acc, x) -> acc * 0.8 + x)
             / list_reduce(list_transform(vals, x -> CAST(1.0 AS DOUBLE)),
                           (acc, x) -> acc * 0.8 + x),
             9) AS ewma
    FROM w
    """,
    description="per-user EWMA (decay 0.8, 16-event horizon) via an "
    "ordered window list + one left fold — one keyed exchange, O(16) "
    "per row",
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of event values per user.

    Scale shape: ONE exchange on user_id, one window sort; the fold is
    row-local over a bounded 16-element frame (collect_list over a
    rowsBetween frame preserves frame order). The truncated horizon is
    deliberate: the untruncated recursive EWMA needs w^(-rownum)
    rescaling that overflows doubles after ~1500 rows per key, and a
    16-step tail at w=0.8 already carries >97% of the mass.
    """
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-15, 0)
    )
    vals = F.collect_list("value").over(w)
    e = e.select("event_id", "user_id", vals.alias("__vals"))
    rest = F.slice(
        F.col("__vals"), 2, F.greatest(F.size("__vals") - 1, F.lit(0))
    )
    num = F.aggregate(
        rest,
        F.element_at("__vals", 1),
        lambda acc, v: acc * F.lit(0.8) + v,
    )
    den = F.aggregate(
        rest,
        F.lit(1.0),
        lambda acc, _v: acc * F.lit(0.8) + F.lit(1.0),
    )
    return e.select(
        "event_id", "user_id", F.round(num / den, 9).alias("ewma")
    )


@register(
    "events_resample_ffill",
    # Gap-filling resample: a daily grid per user from the first event's
    # day to the last event, forward-filled with the latest value
    # at-or-before each grid point (the hypertable/time_bucket rollup
    # shape). Events are pre-aggregated to one row per (user, ts) so the
    # carried payload is deterministic under timestamp ties. DuckDB's
    # native ASOF JOIN is the oracle for our union-and-carry asof.
    oracle="""
    WITH e AS (
      SELECT user_id, ts, MAX(value) AS v FROM events GROUP BY user_id, ts
    ), b AS (
      SELECT user_id,
             CAST(DATE_TRUNC('day', MIN(ts)) AS TIMESTAMP) AS t0,
             MAX(ts) AS t1
      FROM e GROUP BY user_id
    ), grid AS (
      SELECT user_id,
             UNNEST(generate_series(t0, t1, INTERVAL 1 DAY)) AS grid_ts
      FROM b
    )
    SELECT g.user_id, g.grid_ts, e.v AS v_ffill
    FROM grid g ASOF LEFT JOIN e
      ON g.user_id = e.user_id AND g.grid_ts >= e.ts
    """,
    description="daily-grid resample + forward fill per user (sequence "
    "explode + backward as-of carry) — vs DuckDB native ASOF",
)
def events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize an event stream onto a fixed daily grid with forward
    fill — the feature-store/training-window shape ("the value in force
    at each grid point").

    Scale shape: the grid is generated per key with sequence+explode
    (row-local, no driver loop); the fill is ONE backward as-of join —
    one exchange on user_id, one window sort, no range-bucket tuning.
    Grid points before a user's first event stay NULL (nothing to carry).
    """
    from ..operators.asof import asof_join

    e = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("v"))
    )
    grid = (
        e.groupBy("user_id")
        .agg(
            F.date_trunc("day", F.min("ts")).alias("t0"),
            F.max("ts").alias("t1"),
        )
        .select(
            "user_id",
            F.explode(
                F.sequence("t0", "t1", F.expr("interval 1 day"))
            ).alias("grid_ts"),
        )
    )
    return asof_join(
        grid,
        e,
        left_on="grid_ts",
        right_on="ts",
        left_by="user_id",
        right_by="user_id",
        payload=F.col("v"),
        payload_name="v_ffill",
        direction="backward",
    ).select("user_id", "grid_ts", "v_ffill")


@register(
    "join_asof_nearest",
    # The nearest direction (pandas merge_asof direction='nearest'):
    # closest event on either side of each order date, ties backward.
    # DuckDB has no nearest ASOF, so the oracle is the same
    # union-and-carry construction in SQL with exact integer-microsecond
    # distances — an independent engine executing an independent
    # spelling of the algorithm.
    oracle="""
    WITH u AS (
      SELECT o_custkey AS k, o_orderdate AS ts, o_orderkey,
             CAST(NULL AS TIMESTAMP) AS ets, 1 AS is_left
      FROM orders
      UNION ALL
      SELECT user_id, ts, CAST(NULL AS BIGINT), ts, 0 FROM events
    ), f AS (
      SELECT k, ts, o_orderkey, is_left,
        last_value(ets IGNORE NULLS) OVER (
          PARTITION BY k ORDER BY ts, is_left
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bts,
        last_value(ets IGNORE NULLS) OVER (
          PARTITION BY k ORDER BY ts DESC, is_left
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fts
      FROM u
    )
    SELECT o_orderkey, k AS o_custkey,
           CASE WHEN bts IS NOT NULL AND (fts IS NULL OR
                  epoch_us(ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(ts))
                THEN bts ELSE fts END AS nearest_event_ts
    FROM f WHERE is_left = 1
    """,
    description="as-of join (nearest): closest event in either time "
    "direction per customer, exact micros distance, ties backward",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    o = load(spark, sf_dir, "orders")
    e = load(spark, sf_dir, "events")
    return asof_join(
        o.select("o_orderkey", "o_custkey", "o_orderdate"),
        e,
        left_on="o_orderdate",
        right_on="ts",
        left_by="o_custkey",
        right_by="user_id",
        payload=F.col("ts"),
        payload_name="nearest_event_ts",
        direction="nearest",
    ).select("o_orderkey", "o_custkey", "nearest_event_ts")


@register(
    "profile_entropy_by_source",
    # Corpus-composition diagnostic: Shannon entropy of each source's
    # language distribution (0 = monolingual source, log2(k) = uniform
    # over k languages). ENGINE-EXACT by construction: per-(source,lang)
    # counts are exact integers, and BOTH engines fold c*log2(c) in the
    # same lang-sorted order (Spark sort_array fold / DuckDB ordered
    # list_reduce — a 0.0-seeded fold and a first-element-seeded reduce
    # agree bit-exactly because 0.0 + x == x); log2 is libm, so the
    # result rounds to 9.
    oracle="""
    WITH c AS (
      SELECT source, lang, CAST(COUNT(*) AS DOUBLE) AS cnt
      FROM documents GROUP BY source, lang
    ), t AS (
      SELECT source, list(cnt ORDER BY lang) AS l FROM c GROUP BY source
    )
    SELECT source,
           CAST(list_reduce(l, (a, b) -> a + b) AS BIGINT) AS n_docs,
           ROUND(LOG2(list_reduce(l, (a, b) -> a + b))
                 - list_reduce(list_transform(l, x -> x * LOG2(x)),
                               (a, b) -> a + b)
                   / list_reduce(l, (a, b) -> a + b),
                 9) AS lang_entropy
    FROM t
    """,
    description="per-source Shannon entropy of the language mix — "
    "two-level exact-count aggregate, lang-ordered entropy fold",
)
def profile_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H(source) = log2(N) - sum c*log2(c) / N over per-language counts.

    Scale shape: two hash aggregates (source x lang, then source), both
    map-side combinable; only (source, lang, count) tuples shuffle. The
    per-source language list is tiny (the alphabet of langs), so the
    sorted fold is O(k) row-local work after the aggregate.
    """
    docs = load(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    t = c.groupBy("source").agg(
        F.sort_array(F.collect_list(F.struct("lang", "cnt"))).alias("__l")
    )
    counts = F.transform("__l", lambda x: x["cnt"])
    n = F.aggregate(counts, F.lit(0.0), lambda a, b: a + b)
    s = F.aggregate(
        counts, F.lit(0.0), lambda a, b: a + b * F.log2(b)
    )
    return t.select(
        "source",
        n.cast("long").alias("n_docs"),
        F.round(F.log2(n) - s / n, 9).alias("lang_entropy"),
    )


@register(
    "pipeline_shuffle_shards",
    # Deterministic training-order shuffle: shard = hash bucket, pos =
    # rank of a second hash within the shard. Reproducible everywhere
    # (content-derived, never rand — the retry-safety invariant), and
    # the distributed plan is shard-then-sort-within: one exchange, NO
    # global rangepartitioning sort.
    oracle=f"""
    SELECT doc_id,
           CAST(FLOOR({SP.sql_hash_fraction('doc_id', salt='corpus:shard')}
                      * 16) AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY CAST(FLOOR(
               {SP.sql_hash_fraction('doc_id', salt='corpus:shard')} * 16)
               AS INT)
             ORDER BY {SP.sql_hash_fraction('doc_id', salt='corpus:pos')},
                      doc_id) AS INT) AS pos
    FROM documents
    """,
    description="deterministic corpus shuffle into 16 training shards "
    "(hash shard + in-shard hash rank) — one exchange, no global sort, "
    "retry-reproducible",
)
def pipeline_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.sampling import shuffle_shards

    docs = load(spark, sf_dir, "documents").select("doc_id")
    return shuffle_shards(
        docs, key_col="doc_id", n_shards=16, salt="corpus"
    ).select("doc_id", "shard", F.col("pos").cast("int").alias("pos"))


_PHASH_CTAB_SQL = (
    "[" + ", ".join(str(v) for row in M.dct_cos_table() for v in row) + "]"
)


@register(
    "multimodal_phash",
    # Fixed-point DCT perceptual hash: the cosine basis is rounded ONCE
    # to integers at 2^14 scale (multimodal.dct_cos_table — the same
    # table is inlined below as a literal), so the whole transform is
    # exact int64 arithmetic and the oracle rebuilds the raster and
    # recomputes the 64-bit hash bit-for-bit. AC coefficients threshold
    # at their exact median (strict >), DC dropped, one 0 pad bit.
    oracle=_AHASH_GATE_SQL
    + f"""
    , c AS (SELECT {_PHASH_CTAB_SQL} AS ctab
    ), d AS (
      SELECT media_id,
             LIST_TRANSFORM(RANGE(0, 64), k ->
               LIST_SUM(LIST_TRANSFORM(RANGE(0, 8), x ->
                 ctab[(k // 8) * 8 + x + 1] *
                 LIST_SUM(LIST_TRANSFORM(RANGE(0, 8), y ->
                   ctab[(k % 8) * 8 + y + 1] * luma[x * 8 + y + 1])))))
               AS dct
      FROM l, c
    ), t AS (
      SELECT media_id, dct[2:64] AS ac, LIST_SORT(dct[2:64])[32] AS med
      FROM d
    )
    SELECT media_id,
           LIST_AGGREGATE(LIST_TRANSFORM(ac,
             x -> CASE WHEN x > med THEN '1' ELSE '0' END),
             'string_agg', '') || '0' AS phash
    FROM t
    """,
    description="perceptual DCT hash (pHash) of decoded images: "
    "fixed-point integer DCT (JPEG-style 2^14 cosine table), AC median "
    "threshold — bit-exact vs the SQL raster + DCT reconstruction",
)
def multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _ahash_gate_media(spark, sf_dir)
    return M.phash_hashes(media).select("media_id", "phash")


@register(
    "similarity_mmr_rerank",
    # Greedy maximal-marginal-relevance over the exact top-20 pool:
    # pick argmax 0.7*rel - (1-0.7)*max_sim_to_picked, ties by id. Both
    # relevance and pair cosines are rounded(9) from identical
    # sequential folds, and the MMR score is the SAME two multiplies +
    # subtract on those doubles — the penalty factor is spelled
    # (1.0 - 0.7), matching Python's `1.0 - lam` bit-exactly (the
    # literal 0.3 is a DIFFERENT double). The oracle is a recursive
    # CTE running the same greedy selection.
    oracle="""
    WITH RECURSIVE v AS (
      SELECT vec_id,
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), q AS (
      SELECT e AS qe,
             SQRT(LIST_REDUCE(LIST_TRANSFORM(e, x -> x * x),
                              (a, x) -> a + x)) AS qn
      FROM v WHERE vec_id = 0
    ), rel AS (
      SELECT vec_id, e,
             ROUND(
               LIST_REDUCE(LIST_TRANSFORM(RANGE(1, 65), i -> e[i] * qe[i]),
                           (acc, x) -> acc + x)
               / (SQRT(LIST_REDUCE(LIST_TRANSFORM(e, x -> x * x),
                                   (a, x) -> a + x)) * qn),
               9) AS r
      FROM v, q
    ), pool AS (
      SELECT vec_id, e, r FROM rel ORDER BY r DESC, vec_id LIMIT 20
    ), pc AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             ROUND(
               LIST_REDUCE(LIST_TRANSFORM(RANGE(1, 65),
                                          i -> a.e[i] * b.e[i]),
                           (acc, x) -> acc + x)
               / (SQRT(LIST_REDUCE(LIST_TRANSFORM(a.e, x -> x * x),
                                   (s, x) -> s + x))
                  * SQRT(LIST_REDUCE(LIST_TRANSFORM(b.e, x -> x * x),
                                     (s, x) -> s + x))),
               9) AS c
      FROM pool a, pool b WHERE a.vec_id != b.vec_id
    ), sel AS (
      (SELECT 1 AS step, [vec_id] AS picked
       FROM pool ORDER BY r DESC, vec_id LIMIT 1)
      UNION ALL
      SELECT s.step + 1,
        LIST_APPEND(s.picked, (
          SELECT p2.vec_id FROM pool p2
          WHERE NOT LIST_CONTAINS(s.picked, p2.vec_id)
          ORDER BY 0.7 * p2.r - (1.0 - 0.7) * (
              SELECT MAX(pc.c) FROM pc
              WHERE pc.ia = p2.vec_id
                AND LIST_CONTAINS(s.picked, pc.ib)
            ) DESC, p2.vec_id
          LIMIT 1
        ))
      FROM sel s WHERE s.step < 5
    ), final AS (
      SELECT picked FROM sel ORDER BY step DESC LIMIT 1
    )
    SELECT CAST(i AS INT) AS rank,
           picked[i] AS vec_id,
           (SELECT r FROM rel WHERE rel.vec_id = picked[i]) AS relevance
    FROM final, (SELECT UNNEST(RANGE(1, 6)) AS i) steps
    """,
    description="diversity-aware top-5 via greedy MMR over the exact "
    "top-20 cosine pool (Carbonell-Goldstein) — corpus work is one "
    "TakeOrdered scan; pairwise cosines are a broadcast self-join of "
    "the 20-row pool; vs a DuckDB recursive-CTE greedy",
)
def similarity_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).head()["embedding"]
    return S.mmr_rerank(
        emb, [float(x) for x in query], k=5, pool=20, lam=0.7
    )


@register(
    "window_distribution_variants",
    # The distribution window functions in one gate: cume_dist,
    # percent_rank, ntile over the same ordered partition. All three
    # are exact rank arithmetic (integer ratios) — engine-identical;
    # the ratios round(9) only to absorb the division.
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           ROUND(CUME_DIST() OVER w, 9) AS cd,
           ROUND(PERCENT_RANK() OVER w, 9) AS pr,
           CAST(NTILE(7) OVER w AS INT) AS bucket
    FROM orders
    WHERE o_orderkey <= 2000
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
    """,
    description="distribution window functions (cume_dist / "
    "percent_rank / ntile) over one ordered partition",
)
def window_distribution_variants(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    w = Window.partitionBy("o_orderstatus").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.cume_dist().over(w), 9).alias("cd"),
        F.round(F.percent_rank().over(w), 9).alias("pr"),
        F.ntile(7).over(w).alias("bucket"),
    )


@register(
    "profile_dataset_card",
    # The per-source "datasheet" a curation pipeline publishes: volume,
    # exact duplicate rate, length median, token mean, English share.
    # All components reuse the established engine-exact spellings
    # (sha256 content key, MEDIAN <-> F.median, regexp token counts,
    # exact integer ratios rounded once).
    oracle=rf"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(1.0 - COUNT(DISTINCT sha256(lower(trim(text))))
                 / CAST(COUNT(*) AS DOUBLE), 6) AS dup_fraction,
           MEDIAN(n_chars) AS med_chars,
           ROUND(AVG(CAST({X.sql_token_count('text', X.WS_TOKEN_RE)}
                          AS BIGINT)), 9) AS mean_tokens_ws,
           ROUND(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS english_frac
    FROM documents
    GROUP BY source
    """,
    description="per-source dataset card: volume, exact dup rate, "
    "median length, mean whitespace tokens, English share — one "
    "map-side-combinable aggregate pass, text never shuffles",
)
def profile_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ck = D.content_key(F.col("text"))
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.lit(1.0)
            - F.countDistinct(ck) / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("dup_fraction"),
        F.median("n_chars").alias("med_chars"),
        F.round(
            F.avg(X.token_count(F.col("text"), X.WS_TOKEN_RE).cast("long")),
            9,
        ).alias("mean_tokens_ws"),
        F.round(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("english_frac"),
    )


@register(
    "graph_triangle_count",
    # Supplier co-occurrence graph (two suppliers share an order):
    # exact triangle count via the degree-ordered forward method must
    # equal the canonical a<b<c three-way SQL join; wedges and the
    # global clustering coefficient are exact integer arithmetic (one
    # libm-free division, rounded).
    oracle="""
    WITH raw AS (
      SELECT DISTINCT l1.l_suppkey AS x, l2.l_suppkey AS y
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey
       AND l1.l_suppkey < l2.l_suppkey
    ), deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT x AS node FROM raw UNION ALL SELECT y FROM raw
      ) GROUP BY node
    ), tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM raw e1
      JOIN raw e2 ON e2.x = e1.y
      JOIN raw e3 ON e3.x = e1.x AND e3.y = e2.y
    ), wed AS (
      SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg
    )
    SELECT n_triangles, n_wedges,
           ROUND(3.0 * n_triangles / CAST(n_wedges AS DOUBLE), 9)
             AS global_clustering
    FROM tri, wed
    """,
    description="exact triangle count + clustering coefficient of the "
    "supplier co-occurrence graph — degree-ordered forward method "
    "(hub-safe wedge enumeration) vs the canonical a<b<c SQL join",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.graph import triangle_count

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    pairs = (
        li.join(l2, li.l_orderkey == l2.k2)
        .filter(F.col("l_suppkey") < F.col("s2"))
        .select(F.col("l_suppkey").alias("src"), F.col("s2").alias("dst"))
        .distinct()
    )
    return triangle_count(pairs)


@register(
    "profile_mutual_information",
    # Column-dependence diagnostic: mutual information between source
    # and lang in bits — I = sum p_xy * log2(p_xy / (p_x * p_y)) over
    # the (source, lang) contingency cells. ENGINE-EXACT like
    # profile_entropy_by_source: all counts are exact integers and both
    # engines fold the cell terms in the same (source, lang)-sorted
    # order (a 0.0-seeded fold equals a first-element-seeded reduce);
    # log2 is libm, so round(9). Also emits H(lang) and the normalized
    # I/H(lang) (fraction of language uncertainty explained by source —
    # ~0 means sources share one language mix; ~1 means source leaks
    # lang).
    oracle="""
    WITH cell AS (
      SELECT source, lang, CAST(COUNT(*) AS DOUBLE) AS c
      FROM documents GROUP BY source, lang
    ), tot AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents
    ), px AS (
      SELECT source, CAST(SUM(CAST(c AS BIGINT)) AS DOUBLE) AS cx
      FROM cell GROUP BY source
    ), py AS (
      SELECT lang, CAST(SUM(CAST(c AS BIGINT)) AS DOUBLE) AS cy
      FROM cell GROUP BY lang
    ), terms AS (
      SELECT LIST(
               (cell.c / n) * LOG2((cell.c * n) / (px.cx * py.cy))
               ORDER BY cell.source, cell.lang
             ) AS t,
             LIST(DISTINCT {'lang': py.lang, 'cy': py.cy}
                  ORDER BY {'lang': py.lang, 'cy': py.cy}) AS ly,
             ANY_VALUE(n) AS n
      FROM cell JOIN px USING (source) JOIN py USING (lang), tot
    )
    SELECT ROUND(LIST_REDUCE(t, (a, b) -> a + b), 9) AS mi_bits,
           ROUND(-LIST_REDUCE(LIST_TRANSFORM(ly,
                    x -> (x.cy / n) * LOG2(x.cy / n)), (a, b) -> a + b),
                 9) AS h_lang_bits,
           ROUND(LIST_REDUCE(t, (a, b) -> a + b)
                 / (-LIST_REDUCE(LIST_TRANSFORM(ly,
                      x -> (x.cy / n) * LOG2(x.cy / n)), (a, b) -> a + b)),
                 9) AS normalized_mi
    FROM terms
    """,
    description="mutual information I(source; lang) in bits + H(lang) "
    "+ normalized MI — exact contingency counts, sorted engine-"
    "identical folds; the column-dependence / split-leakage diagnostic",
)
def profile_mutual_information(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    cell = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    px = cell.groupBy("source").agg(
        F.sum(F.col("c").cast("long")).cast("double").alias("cx")
    )
    py = cell.groupBy("lang").agg(
        F.sum(F.col("c").cast("long")).cast("double").alias("cy")
    )
    n = docs.count()  # one scalar job; the frames below broadcast
    joined = cell.join(F.broadcast(px), "source").join(
        F.broadcast(py), "lang"
    )
    terms = joined.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "source",
                    "lang",
                    (
                        (F.col("c") / F.lit(float(n)))
                        * F.log2(
                            (F.col("c") * F.lit(float(n)))
                            / (F.col("cx") * F.col("cy"))
                        )
                    ).alias("term"),
                )
            )
        ).alias("__t")
    )
    lang_terms = py.select(
        F.struct("lang", "cy").alias("s")
    ).agg(F.sort_array(F.collect_list("s")).alias("__ly"))
    t = F.transform("__t", lambda x: x["term"])
    mi = F.aggregate(t, F.lit(0.0), lambda a, b: a + b)
    hl = -F.aggregate(
        F.transform(
            "__ly",
            lambda x: (x["cy"] / F.lit(float(n)))
            * F.log2(x["cy"] / F.lit(float(n))),
        ),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    return terms.crossJoin(F.broadcast(lang_terms)).select(
        F.round(mi, 9).alias("mi_bits"),
        F.round(hl, 9).alias("h_lang_bits"),
        F.round(mi / hl, 9).alias("normalized_mi"),
    )
