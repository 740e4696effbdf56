"""Text-analysis operators for a training-data pipeline over ``documents``.

Language-ID (stopword-profile heuristic), quality scoring (length/stopword/
char-class ratios), token counting (whitespace + regex word split) and
document fingerprinting — each a pure column-algebra plan with a DuckDB
twin.  These are the corpus-hygiene stages any 100 TB pretraining pipeline
runs before extraction; all narrow maps + one grouped agg at most, so they
scale linearly and pipeline with the parquet scan.

Portable-hash convention: fingerprints are md5-derived (first 15 hex chars
as bigint) — identical in Spark (conv(hex,16,10)) and DuckDB
(CAST('0x'||hex AS BIGINT)); see mdhash_spark/MDHASH_SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STOPWORDS_EN = ("the", "a", "of", "and", "to")
# token profiles for the toy lang-id heuristic (deterministic, mirrored in SQL)
PROFILES = {
    "en": ("the", "a", "of"),
    "es": ("el", "la", "de"),
    "fr": ("le", "la", "et"),
}


def mdhash_spark(col) -> F.Column:
    """Portable 60-bit content hash: bigint of md5's first 15 hex chars."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def MDHASH_SQL(expr: str) -> str:
    return f"CAST(concat('0x', substring(md5({expr}), 1, 15)) AS BIGINT)"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --- token counting ----------------------------------------------------------

def ta_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + a BPE-ish regex word split, counted per doc."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    words = F.split(F.col("text"), "[^a-zA-Z0-9]+")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
        F.size(F.filter(words, lambda w: F.length(w) > 0)).cast("bigint").alias("n_words"),
        F.length("text").cast("bigint").alias("n_chars_actual"),
    )


TA_TOKEN_STATS_SQL = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
       len(list_filter(string_split_regex(text, '[^a-zA-Z0-9]+'),
                       w -> length(w) > 0)) AS n_words,
       length(text) AS n_chars_actual
FROM documents
"""




# --- shared expression builders (single source of truth for quality + lang,
# used by ta_quality_score / ta_lang_id AND the composed ta_curate_corpus so
# the curation pass cannot drift from the standalone operators) -------------

def quality_score_expr():
    """(n_tokens, n_stopwords, quality_score) column expressions."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    sw = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS_EN)))
    score = (
        F.when((n >= 20) & (n <= 1000), F.lit(1)).otherwise(F.lit(0))
        + F.when((sw * 100) >= n * 2, F.lit(1)).otherwise(F.lit(0))  # >=2% stopwords
        + F.when(F.length("text") * 10 >= n * 30, F.lit(1)).otherwise(F.lit(0))
    )
    return n, sw, score


def lang_best_expr():
    """struct(hits, lang) of the argmax language profile (ties -> max lang)."""
    ltoks = F.split(F.lower(F.col("text")), " ")
    pairs = F.array(
        *[
            F.struct(
                F.size(F.filter(ltoks, lambda t: t.isin(*prof))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, prof in sorted(PROFILES.items())
        ]
    )
    return F.array_max(pairs)


_SW_SQL = ",".join(repr(s) for s in STOPWORDS_EN)

QUALITY_SCORE_SQL = f"""CAST(
         (CASE WHEN len(string_split(text,' ')) BETWEEN 20 AND 1000 THEN 1 ELSE 0 END)
       + (CASE WHEN len(list_filter(string_split(text,' '),
                  t -> lower(t) IN ({_SW_SQL}))) * 100
               >= len(string_split(text,' ')) * 2 THEN 1 ELSE 0 END)
       + (CASE WHEN length(text) * 10 >= len(string_split(text,' ')) * 30
               THEN 1 ELSE 0 END) AS INTEGER)"""

LANG_BEST_SQL = "list_max([" + ", ".join(
    "struct_pack(hits := len(list_filter(string_split(lower(text), ' '), "
    f"t -> t IN ({','.join(repr(w) for w in prof)}))), lang := '{lang}')"
    for lang, prof in sorted(PROFILES.items())
) + "])"


# --- quality scoring ----------------------------------------------------------

def ta_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quality heuristics: length band, stopword ratio,
    mean token length.  Integer/exact arithmetic where hashes must match."""
    d = _docs(spark, sf_dir)
    n, sw, score = quality_score_expr()
    return d.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        sw.cast("bigint").alias("n_stopwords"),
        score.cast("int").alias("quality_score"),
    )


TA_QUALITY_SQL = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_filter(string_split(text, ' '),
                       t -> lower(t) IN ({_SW_SQL}))) AS n_stopwords,
       {QUALITY_SCORE_SQL} AS quality_score
FROM documents
"""


# --- language id ---------------------------------------------------------------

def ta_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID: argmax of per-language profile hits
    (ties break on language name).  The n-gram-heuristic classifier every
    corpus pipeline runs; deterministic so the SQL twin matches exactly."""
    d = _docs(spark, sf_dir)
    # struct compare: hits then lang; max hits, tie -> max lang
    best = lang_best_expr()
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_meta"),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        best["hits"].cast("bigint").alias("profile_hits"),
    )


def _lang_id_sql() -> str:
    return f"""
WITH scored AS (
  SELECT doc_id, lang AS lang_meta,
         {LANG_BEST_SQL} AS best
  FROM documents
)
SELECT doc_id, lang_meta,
       CASE WHEN best.hits > 0 THEN best.lang ELSE 'und' END AS lang_pred,
       CAST(best.hits AS BIGINT) AS profile_hits
FROM scored
"""


TA_LANG_ID_SQL = _lang_id_sql()


# --- fingerprinting -------------------------------------------------------------

def ta_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: full-text hash + shingle-set hash (stable under
    token order for the shingle variant's sorted distinct 3-gram set)."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.lower(F.col("text")), " ")
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(2), F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 3)),
    )
    return d.select(
        "doc_id",
        mdhash_spark(F.lower(F.col("text"))).alias("text_fp"),
        mdhash_spark(
            F.array_join(F.array_sort(F.array_distinct(sh)), "")
        ).alias("shingle_fp"),
    )


TA_FINGERPRINT_SQL = f"""
WITH sh AS (
  SELECT doc_id, lower(text) AS lt,
         list_sort(list_distinct(
           list_transform(
             range(1, greatest(len(string_split(lower(text),' ')) - 2, 0) + 1),
             i -> array_to_string(list_slice(string_split(lower(text),' '), i, i + 2), ' ')
           ))) AS shset
  FROM documents
)
SELECT doc_id,
       {MDHASH_SQL('lt')} AS text_fp,
       {MDHASH_SQL("array_to_string(shset, chr(1))")} AS shingle_fp
FROM sh
"""


# --- end-to-end corpus curation --------------------------------------------------

def ta_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data curation pass every corpus pipeline ships:
    exact-dedup keepers only (min doc_id per content fingerprint), quality
    score >= 2, language ID != 'und' — emitting the curated doc list with
    its audit columns.  One declarative plan: the dedup groupBy is the only
    wide exchange; quality/lang are narrow maps fused into the same scan."""
    d = _docs(spark, sf_dir)
    _, _, score = quality_score_expr()
    best = lang_best_expr()
    scored = d.select(
        "doc_id",
        mdhash_spark(F.col("text")).alias("text_fp"),
        score.cast("int").alias("quality_score"),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
    )
    keepers = scored.groupBy("text_fp").agg(F.min("doc_id").alias("keep_doc_id"))
    return (
        scored.join(keepers, "text_fp")
        .filter(
            (F.col("doc_id") == F.col("keep_doc_id"))
            & (F.col("quality_score") >= 2)
            & (F.col("lang_pred") != "und")
        )
        .select("doc_id", "quality_score", "lang_pred", "text_fp")
    )


def _curate_sql() -> str:
    return f"""
WITH scored AS (
  SELECT doc_id, {MDHASH_SQL('text')} AS text_fp,
         {QUALITY_SCORE_SQL} AS quality_score,
         {LANG_BEST_SQL} AS best
  FROM documents
),
scored2 AS (
  SELECT doc_id, text_fp, quality_score,
         CASE WHEN best.hits > 0 THEN best.lang ELSE 'und' END AS lang_pred
  FROM scored
),
keepers AS (SELECT text_fp, min(doc_id) AS keep_doc_id FROM scored2 GROUP BY text_fp)
SELECT s.doc_id, s.quality_score, s.lang_pred, s.text_fp
FROM scored2 s JOIN keepers k USING (text_fp)
WHERE s.doc_id = k.keep_doc_id AND s.quality_score >= 2 AND s.lang_pred != 'und'
"""


TA_CURATE_SQL = _curate_sql()


# --- corpus vocabulary ------------------------------------------------------------

VOCAB_TOP_K = 100


def ta_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide vocabulary: top-K tokens by document frequency then total
    count — the token-frequency table tokenizer training and stopword
    induction start from.  Shape at 100 TB: explode is a narrow map, the
    groupBy is one shuffle on the token (partial aggregation eats the heavy
    duplication map-side), and the top-K is a tiny global sort of the
    already-aggregated vocabulary.  Ordering is fully deterministic:
    (doc_freq DESC, total_count DESC, token ASC)."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"))
    agg = toks.groupBy("tok").agg(
        F.countDistinct("doc_id").cast("bigint").alias("doc_freq"),
        F.count("*").cast("bigint").alias("total_count"),
    )
    return (
        agg.orderBy(F.desc("doc_freq"), F.desc("total_count"), F.asc("tok"))
        .limit(VOCAB_TOP_K)
    )


TA_VOCAB_TOPK_SQL = f"""
SELECT tok, count(DISTINCT doc_id) AS doc_freq, count(*) AS total_count
FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents)
GROUP BY tok
ORDER BY doc_freq DESC, total_count DESC, tok ASC
LIMIT {VOCAB_TOP_K}
"""
