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

from ..sources.scan import spread_scan

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



def ngram_array(toks, n: int):
    """Token n-grams of an array column, guarded for short inputs: Spark's
    sequence(1, x) DESCENDS when x <= 0 ([1, 0] -> slice(_, 0, _) throws),
    where DuckDB's range(1, x+1) is simply empty — the when() gives both
    dialects the empty list for size < n.  Centralized after this bug class
    bit ta_fingerprint in round 3; every new n-gram operator should use
    this (dedup._tok_shingles deliberately differs: it emits the whole
    short text as one shingle, mirrored in its own twin)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread_scan: tokenize/ngram/md5 passes run on the scan task; fan a
    # single-row-group bench file out to the cores (no-op on real
    # multi-split inputs — see sources/scan.py)
    path = f"{sf_dir}/documents.parquet"
    return spread_scan(spark.read.parquet(path), path)


def _docs_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Un-spread documents scan for operators whose per-row work is one
    split/size (ta_pack_sequences, ta_mixture_weights): the spread
    exchange costs more than the parallelism buys there (same measured
    trade as dedup._docs_raw, r9)."""
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
    sh = ngram_array(toks, 3)  # short-doc-guarded (see ngram_array)
    return d.select(
        "doc_id",
        mdhash_spark(F.lower(F.col("text"))).alias("text_fp"),
        mdhash_spark(
            F.array_join(F.array_sort(F.array_distinct(sh)), "\x01")
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
       {MDHASH_SQL("coalesce(array_to_string(shset, chr(1)), '')")} AS shingle_fp
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


# --- repetition signals (Gopher-style quality rules) ------------------------------

# thresholds picked at the fixture's discriminating quantiles (dup-2gram p90
# = 0.065, dup-token median = 0.538 / max 0.723): a doc is repetitive when
# its 2-gram duplication is in the top decile OR token duplication near max.
REP_DUP_2GRAM_THS = 0.06
REP_DUP_TOKEN_THS = 0.65


def ta_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (the Gopher/MassiveText repetition
    rules — Rae et al. 2021 §A1.1 — restated relationally): per-doc
    duplicate-token fraction, top-token fraction, duplicate-2-gram
    fraction, and the composed is_repetitive flag.

    Shape at 100 TB: token and 2-gram tables are narrow explodes; each
    groupBy(doc_id, unit) -> groupBy(doc_id) pair does partial aggregation
    map-side (the unit tables never leave the exchange un-combined), and
    the final join is doc_id-to-doc_id.  No HOF is quadratic in doc length
    (an all-column-algebra variant would be O(n * n_distinct) per doc —
    wrong for book-length docs)."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    tstats = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count("*").cast("bigint").alias("n_distinct"),
            F.max("c").cast("bigint").alias("top_count"),
        )
    )
    tarr = F.split(F.col("text"), " ")
    grams_arr = ngram_array(tarr, 2)
    grams = d.select("doc_id", F.explode(grams_arr).alias("gram"))
    gstats = (
        grams.groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_grams"),
            F.count("*").cast("bigint").alias("n_distinct_grams"),
        )
    )
    j = tstats.join(gstats, "doc_id", "left")
    dup_tok = F.round(F.lit(1.0) - F.col("n_distinct") / F.col("n_tokens"), 6)
    top_tok = F.round(F.col("top_count") / F.col("n_tokens"), 6)
    dup_gram = F.when(
        F.col("n_grams") > 0,
        F.round(F.lit(1.0) - F.col("n_distinct_grams") / F.col("n_grams"), 6),
    ).otherwise(F.lit(0.0))
    return j.select(
        "doc_id",
        "n_tokens",
        dup_tok.alias("dup_token_frac"),
        top_tok.alias("top_token_frac"),
        dup_gram.alias("dup_2gram_frac"),
        (
            (dup_gram > REP_DUP_2GRAM_THS) | (dup_tok > REP_DUP_TOKEN_THS)
        ).alias("is_repetitive"),
    )


TA_REPETITION_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
tstats AS (
  SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct, max(c) AS top_count
  FROM (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok)
  GROUP BY doc_id
),
grams AS (
  SELECT doc_id, unnest(
    list_transform(range(1, greatest(len(string_split(text,' ')) - 1, 0) + 1),
                   i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])
  ) AS gram FROM documents
),
gstats AS (
  SELECT doc_id, sum(c) AS n_grams, count(*) AS n_distinct_grams
  FROM (SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY doc_id, gram)
  GROUP BY doc_id
),
j AS (
  SELECT t.doc_id, t.n_tokens,
         round(1.0 - t.n_distinct / t.n_tokens, 6) AS dup_token_frac,
         round(t.top_count / t.n_tokens, 6) AS top_token_frac,
         CASE WHEN g.n_grams > 0
              THEN round(1.0 - g.n_distinct_grams / g.n_grams, 6)
              ELSE 0.0 END AS dup_2gram_frac
  FROM tstats t LEFT JOIN gstats g USING (doc_id)
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       dup_token_frac, top_token_frac, dup_2gram_frac,
       (dup_2gram_frac > {REP_DUP_2GRAM_THS} OR dup_token_frac > {REP_DUP_TOKEN_THS})
         AS is_repetitive
FROM j
"""


# --- sequence packing (distributed prefix sum) -------------------------------------

PACK_SEQ_LEN = 256  # tokens per packed training sequence
PACK_BUCKET = 100  # doc_ids per prefix-sum bucket


def ta_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing (the GPT-style pretraining batch
    layout): documents in deterministic doc_id order are laid end-to-end on
    a token tape and cut into PACK_SEQ_LEN-token sequences; each doc gets
    (seq_id, offset_in_seq) of its starting token.

    The global running total is a DISTRIBUTED PREFIX SUM, not one giant
    window: within-bucket cumsum partitions by floor(doc_id/PACK_BUCKET)
    (parallel, ~PACK_BUCKET rows per window partition), bucket totals are
    one tiny aggregate whose own cumsum runs over #buckets rows, and the
    two join back on the bucket key.  A bare Window.orderBy(doc_id) would
    drag the whole corpus through ONE task — the classic packing
    anti-pattern at 100 TB.  All arithmetic is exact BIGINT."""
    from pyspark.sql import Window

    d = _docs_raw(spark, sf_dir).select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
        F.floor(F.col("doc_id") / PACK_BUCKET).alias("bkt"),
    )
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = d.withColumn("cum_in", F.sum("n_tokens").over(w_in))
    btot = d.groupBy("bkt").agg(F.sum("n_tokens").alias("btok"))
    w_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    boff = btot.withColumn("boff", F.sum("btok").over(w_b) - F.col("btok")).select(
        "bkt", "boff"
    )
    tape = within.join(boff, "bkt").select(
        "doc_id",
        "n_tokens",
        (F.col("boff") + F.col("cum_in") - F.col("n_tokens")).alias("start_tok"),
    )
    return tape.select(
        "doc_id",
        "n_tokens",
        F.floor(F.col("start_tok") / PACK_SEQ_LEN).cast("bigint").alias("seq_id"),
        F.pmod("start_tok", F.lit(PACK_SEQ_LEN)).cast("bigint").alias("offset_in_seq"),
    )


TA_PACK_SQL = f"""
WITH d AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(floor(doc_id / {PACK_BUCKET}) AS BIGINT) AS bkt
  FROM documents
),
within AS (
  SELECT *, sum(n_tokens) OVER (PARTITION BY bkt ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_in
  FROM d
),
boff AS (
  SELECT bkt, sum(btok) OVER (ORDER BY bkt
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - btok AS boff
  FROM (SELECT bkt, sum(n_tokens) AS btok FROM d GROUP BY bkt)
),
tape AS (
  SELECT w.doc_id, w.n_tokens, b.boff + w.cum_in - w.n_tokens AS start_tok
  FROM within w JOIN boff b USING (bkt)
)
SELECT doc_id, n_tokens,
       CAST(floor(start_tok / {PACK_SEQ_LEN}) AS BIGINT) AS seq_id,
       CAST(start_tok % {PACK_SEQ_LEN} AS BIGINT) AS offset_in_seq
FROM tape
"""


# --- domain mixture weights ---------------------------------------------------------

def ta_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) domain statistics + proportional sampling weight —
    the mixture table a pretraining data loader consumes.  Token totals are
    exact BIGINTs, so weight = round(domain_tokens / corpus_tokens, 6) is
    order-independent (no float accumulation before the single division).
    The unpartitioned window runs over the ALREADY-AGGREGATED domain table
    (O(#domains) rows), not the corpus."""
    from pyspark.sql import Window

    d = _docs_raw(spark, sf_dir).select(
        "lang", "source", F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tok")
    )
    g = d.groupBy("lang", "source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
    )
    total = F.sum("n_tokens").over(Window.partitionBy())
    return g.select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / total, 6).alias("weight"),
    )


TA_MIXTURE_SQL = """
WITH g AS (
  SELECT lang, source, count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang, source
)
SELECT lang, source, n_docs, n_tokens,
       round(n_tokens / (sum(n_tokens) OVER ()), 6) AS weight
FROM g
"""


# --- span redaction (PII-scrub analog) ----------------------------------------------

def ta_redact_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensitive-span scrubbing over the transcripts — the PII-redaction
    pass a training pipeline runs before material leaves the curation zone.
    The corpus plants dates and quantity tokens (the reference's MFG/EXP/
    WEIGHT fields), so those are the redaction targets here: every token
    matching the shared DATE/WEIGHT rules (functions/rules.py — the SAME
    regexes the mention detector classifies with) is rewritten to [DATE] /
    [NUM], with per-turn match counters for the audit log.

    Token-level transform (split -> per-token CASE -> join) rather than a
    full-text regexp_replace: the anchored token regexes are shared
    verbatim with the detector AND with DuckDB's RE2 (which lacks the
    lookarounds an in-text boundary match would need).  Pure narrow map —
    zero shuffles."""
    from ..sources.transcripts import transcripts_from_documents

    return redact_turns(transcripts_from_documents(spark, sf_dir))


def redact_turns(t: DataFrame) -> DataFrame:
    """The redaction projection over a (conv_id, turn_idx, text)-shaped
    DataFrame.  STATELESS, so it runs unchanged under Structured Streaming
    (tests/test_streaming.py pins stream == batch) — the scrub can sit
    inline in the ingestion stream, not only as a batch pass."""
    from ..functions import rules

    toks = F.split(F.col("text"), " ")
    red = F.transform(
        toks,
        lambda tok: F.when(tok.rlike(rules.DATE_RE_SQL), F.lit("[DATE]"))
        .when(F.lower(tok).rlike(rules.WEIGHT_RE_SQL), F.lit("[NUM]"))
        .otherwise(tok),
    )
    n_dates = F.size(F.filter(toks, lambda tok: tok.rlike(rules.DATE_RE_SQL)))
    n_nums = F.size(
        F.filter(
            toks,
            lambda tok: ~tok.rlike(rules.DATE_RE_SQL)
            & F.lower(tok).rlike(rules.WEIGHT_RE_SQL),
        )
    )
    return t.select(
        "conv_id",
        "turn_idx",
        F.array_join(red, " ").alias("redacted_text"),
        n_dates.cast("int").alias("n_dates"),
        n_nums.cast("int").alias("n_nums"),
    )


def ta_redact_sql() -> str:
    from ..functions import rules
    from ..sources.transcripts import duckdb_transcripts_sql

    case = (
        f"CASE WHEN regexp_matches(tok, '{rules.DATE_RE_SQL}') THEN '[DATE]' "
        f"WHEN regexp_matches(lower(tok), '{rules.WEIGHT_RE_SQL}') THEN '[NUM]' "
        "ELSE tok END"
    )
    return f"""
WITH transcripts AS ({duckdb_transcripts_sql("SELECT doc_id AS k FROM documents")})
SELECT conv_id, turn_idx,
       array_to_string(list_transform(string_split(text, ' '), tok -> {case}), ' ')
         AS redacted_text,
       CAST(len(list_filter(string_split(text, ' '),
            tok -> regexp_matches(tok, '{rules.DATE_RE_SQL}'))) AS INTEGER) AS n_dates,
       CAST(len(list_filter(string_split(text, ' '),
            tok -> NOT regexp_matches(tok, '{rules.DATE_RE_SQL}')
                   AND regexp_matches(lower(tok), '{rules.WEIGHT_RE_SQL}')))
         AS INTEGER) AS n_nums
FROM transcripts
"""


# --- applying the mixture: deterministic domain-balanced sampling -------------------

SAMPLE_PPM = 1_000_000  # rate resolution (parts per million)


def ta_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-BALANCED downsampling — the apply-side of ta_mixture_weights:
    every (lang, source) domain is thinned to the smallest domain's token
    budget, so the sampled corpus mixes domains uniformly.

    Selection is DETERMINISTIC hash gating, not rand(): doc kept iff
    md5-hash(doc_id) mod 1e6 < rate_ppm, with rate_ppm =
    floor(min_domain_tokens * 1e6 / domain_tokens) — exact integer
    arithmetic end to end, so both dialects make byte-identical keep
    decisions and a re-run (or a resumed job) samples the same docs.
    Shape: one groupBy for domain totals, a tiny window over the aggregated
    domain table for the min, a join back on (lang, source) that AQE
    broadcasts (the domain table is O(#domains)), then a narrow filter."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir).select(
        "doc_id", "lang", "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tok"),
    )
    g = d.groupBy("lang", "source").agg(F.sum("n_tok").alias("dom_tokens"))
    # decimal(38,0) widening: bigint * 1e6 would wrap (Spark) / raise
    # (DuckDB) once the smallest domain passes ~9.2e12 tokens — realistic at
    # the 100 TB design point; DECIMAL in Spark / HUGEINT in the twin keep
    # the arithmetic exact and overflow-free
    # exact truncating integer division (DIV), matching DuckDB's `//`:
    # decimal `/` rounds HALF_UP at the result scale BEFORE floor(), which
    # disagrees with floor by 1 ppm when min*1e6/dom_tokens falls within
    # ~5e-7 below an integer — reachable once domains pass ~2e12 tokens
    g = g.withColumn(
        "min_tok", F.min("dom_tokens").over(Window.partitionBy())
    ).withColumn(
        "rate_ppm",
        F.expr(
            f"CAST((CAST(min_tok AS DECIMAL(38,0)) * {SAMPLE_PPM})"
            " DIV dom_tokens AS BIGINT)"
        ),
    ).drop("min_tok")
    gate = F.pmod(mdhash_spark(F.col("doc_id").cast("string")), F.lit(SAMPLE_PPM))
    return (
        d.join(g.select("lang", "source", "rate_ppm"), ["lang", "source"])
        .filter(gate < F.col("rate_ppm"))
        .select("doc_id", "lang", "source", "rate_ppm")
    )


TA_MIXTURE_SAMPLE_SQL = f"""
WITH d AS (
  SELECT doc_id, lang, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
),
g AS (
  SELECT lang, source, sum(n_tok) AS dom_tokens FROM d GROUP BY lang, source
),
r AS (
  SELECT lang, source,
         CAST((CAST(min(dom_tokens) OVER () AS HUGEINT) * {SAMPLE_PPM})
              // dom_tokens AS BIGINT) AS rate_ppm
  FROM g
)
SELECT d.doc_id, d.lang, d.source, r.rate_ppm
FROM d JOIN r USING (lang, source)
WHERE {MDHASH_SQL("CAST(doc_id AS VARCHAR)")} % {SAMPLE_PPM} < r.rate_ppm
"""


# --- full curation composition ------------------------------------------------------

def ta_curate_corpus_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE curation pass, composed from the registered operators
    themselves (zero drift): exact-dedup keepers x quality x language
    (ta_curate_corpus), minus repetitive docs (ta_repetition_filter),
    intersected with the deterministic domain-balanced sample
    (ta_mixture_sample).  What ships to pretraining is exactly this join.

    Shape: three branches over the same documents scan, joined on doc_id —
    each branch keeps its own operator's scale properties (map-side
    combined aggs, hash gating); the joins are doc_id equi-joins on
    already-thinned sides."""
    cur = ta_curate_corpus(spark, sf_dir)
    rep = ta_repetition_filter(spark, sf_dir).select(
        "doc_id", "dup_2gram_frac", "is_repetitive"
    )
    samp = ta_mixture_sample(spark, sf_dir).select("doc_id", "rate_ppm")
    return (
        cur.join(rep, "doc_id")
        .filter(~F.col("is_repetitive"))
        .join(samp, "doc_id")
        .select("doc_id", "quality_score", "lang_pred", "dup_2gram_frac", "rate_ppm")
    )


TA_CURATE_V2_SQL = f"""
WITH cur AS ({TA_CURATE_SQL}),
rep AS ({TA_REPETITION_SQL}),
samp AS ({TA_MIXTURE_SAMPLE_SQL})
SELECT c.doc_id, c.quality_score, c.lang_pred, r.dup_2gram_frac, s.rate_ppm
FROM cur c
JOIN rep r USING (doc_id)
JOIN samp s USING (doc_id)
WHERE NOT r.is_repetitive
"""


# --- feature-hashed document vectors ------------------------------------------------

DV_DIM = 64


def doc_vectors(docs: DataFrame) -> DataFrame:
    """(doc_id, v): DV_DIM-dim signed feature-hashing ("hashing trick",
    Weinberger et al. 2009) of the token bag — the model-free document
    embedding that bridges the text operators to the similarity stack
    (no external encoder exists in this container, and none is needed for
    the plumbing: bucket = md5(token) % DIM, sign = parity of the next
    hash bit, v[i] = Σ signs).  INTEGER counts end to end, so vectors are
    byte-identical across engines.

    Shape: explode → groupBy(doc_id, bucket) with map-side combine →
    per-doc map rebuild with zero-fill — one shuffle keyed on
    (doc_id, bucket), no per-row Python."""
    toks = F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok")
    t = docs.select("doc_id", toks)
    # hash each token ONCE (r9): the previous version inlined the md5
    # chain into both the bucket and the sign expression, so every token
    # paid two md5 evaluations; aliasing it in its own projection keeps
    # it a single evaluation (CollapseProject does not duplicate non-cheap
    # exprs referenced more than once).  Values unchanged.
    h_sql = "CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT)"
    th = t.select("doc_id", F.expr(h_sql).alias("h"))
    cell = th.select(
        "doc_id",
        F.expr(f"CAST(pmod(h, {DV_DIM}) AS INT)").alias("bucket"),
        F.expr(
            f"CASE WHEN pmod(h DIV {DV_DIM}, 2) = 0 THEN 1 ELSE -1 END"
        ).alias("sign"),
    )
    sums = cell.groupBy("doc_id", "bucket").agg(
        F.sum("sign").cast("long").alias("c")
    )
    filled = sums.groupBy("doc_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("bucket", "c")))
        ).alias("m")
    )
    idx = F.sequence(F.lit(0), F.lit(DV_DIM - 1))
    return filled.select(
        "doc_id",
        F.transform(idx, lambda i: F.coalesce(F.element_at("m", i), F.lit(0))).alias("v"),
    )


def ta_doc_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry for doc_vectors — SCALAR output contract.

    The r4 version returned the vector as ``v array<bigint>`` and became
    the round's one driver-gate FAIL: the driver's pandas canonicalizer
    factorizes every output column and dies on list cells
    (``TypeError: unhashable type: 'list'``).  Registry queries therefore
    emit only scalar columns (mechanically enforced by
    tests/test_plan_properties.py::test_no_row_at_a_time_python_anywhere
    and scripts/check_correctness.py); the vector is serialized as the
    deterministic space-joined string ``v_str`` — same encoding as
    kg_export_neighbors' ``neighbors`` column.  Consumers that need the
    real array (ss_topk_docs) call the doc_vectors() helper directly."""
    return doc_vectors(_docs(spark, sf_dir)).select(
        "doc_id", F.array_join(F.col("v").cast("array<string>"), " ").alias("v_str")
    )


def doc_vectors_sql(table: str = "documents") -> str:
    h = MDHASH_SQL("tok")
    return f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM {table}
),
cell AS (
  SELECT doc_id, CAST({h} % {DV_DIM} AS INTEGER) AS bucket,
         CASE WHEN ({h} // {DV_DIM}) % 2 = 0 THEN 1 ELSE -1 END AS sign
  FROM t
),
sums AS (
  SELECT doc_id, bucket, CAST(sum(sign) AS BIGINT) AS c
  FROM cell GROUP BY doc_id, bucket
),
grid AS (
  SELECT d.doc_id, g.bucket
  FROM (SELECT DISTINCT doc_id FROM sums) d
  CROSS JOIN (SELECT unnest(range(0, {DV_DIM})) AS bucket) g
)
SELECT g.doc_id, list(COALESCE(s.c, 0) ORDER BY g.bucket) AS v
FROM grid g LEFT JOIN sums s ON s.doc_id = g.doc_id AND s.bucket = g.bucket
GROUP BY g.doc_id
"""


def doc_vectors_str_sql(table: str = "documents") -> str:
    """Scalar twin of ta_doc_vectors: same vector, space-joined string."""
    return f"""
SELECT doc_id,
       array_to_string(list_transform(v, x -> CAST(x AS VARCHAR)), ' ') AS v_str
FROM ({doc_vectors_sql(table)})
"""


# --- bigram LM surprisal (perplexity-proxy quality signal) --------------------------

LM_Q = 1_000_000  # surprisal quantum


def ta_ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram-LM fluency signal per document — the
    perplexity-proxy filter a curation pipeline uses to drop gibberish
    (docs whose token transitions the corpus has never seen).

    Cross-engine-exact by construction: a true log-prob would hinge on
    ln() agreeing to the last ulp across engines (it does not have to),
    so the score is the INTEGER SURPRISAL proxy — per bigram,
    floor((c(w1)+V) * 1e6 / (c(w1,w2)+1)), i.e. the quantized inverse of
    the add-one-smoothed conditional probability; per doc, the floor-mean
    over its bigrams.  Monotone in perplexity, exact integer arithmetic
    end to end; the per-term bound corpus_tokens*1e6 overflows int64 at
    the 100 TB point, so the per-term surprise is cast to DECIMAL(38,0)
    BEFORE the per-doc F.sum (Spark's integral DIV returns BIGINT, and a
    LongType sum would wrap silently in non-ANSI mode while the DuckDB
    HUGEINT twin errors loudly — r4 ADVICE item 2; same discipline as
    stats_linear_fit's moment sums).

    Shape: one explode to (doc, bigram) — 2x the token stream, the cost
    any n-gram LM trainer pays; two map-side-combined count tables
    (bigrams, unigram contexts — both vocabulary-sized, far smaller than
    the corpus); two equi-joins that AQE broadcasts when the vocab fits;
    one final per-doc aggregation.  Docs with < 2 tokens keep a row with
    n_bigrams = 0 and a NULL score (try_divide; DuckDB NULLs the same
    division)."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.lower(F.col("text")), " ")
    bg = d.select(
        "doc_id", F.explode(ngram_array(toks, 2)).alias("bg")
    ).withColumn("w1", F.split(F.col("bg"), " ")[0])
    bg_counts = bg.groupBy("bg").agg(F.count("*").cast("long").alias("c_bg"))
    w1_counts = bg.groupBy("w1").agg(F.count("*").cast("long").alias("c_w1"))
    vocab = (
        d.select(F.explode(toks).alias("tok")).select(
            F.countDistinct("tok").alias("v")
        )
    )
    scored = (
        bg.join(bg_counts, "bg")
        .join(w1_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.expr(
                f"CAST((CAST(c_w1 + v AS DECIMAL(38,0)) * {LM_Q})"
                " DIV (c_bg + 1) AS DECIMAL(38,0))"
            ).alias("surprise"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("surprise").alias("total"),
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            # integral DIV, not try_divide: decimal try_divide rounds
            # HALF_UP at result scale before a cast could floor it, which
            # can disagree with DuckDB's // by 1 on .999999x quotients
            F.expr(
                "CAST(CASE WHEN n_bigrams IS NULL THEN NULL"
                " ELSE total DIV n_bigrams END AS BIGINT)"
            ).alias("surprise_q"),
        )
    )


TA_NGRAM_LM_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
),
bg AS (
  SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1 FROM (
    SELECT doc_id, unnest(CASE WHEN len(t) >= 2
      THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])
      ELSE [] END) AS bg
    FROM toks)
),
bgc AS (SELECT bg, CAST(count(*) AS BIGINT) AS c_bg FROM bg GROUP BY bg),
w1c AS (SELECT w1, CAST(count(*) AS BIGINT) AS c_w1 FROM bg GROUP BY w1),
vocab AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
          FROM (SELECT unnest(t) AS tok FROM toks)),
scored AS (
  SELECT b.doc_id,
         (CAST(c.c_w1 + vocab.v AS HUGEINT) * {LM_Q}) // (x.c_bg + 1) AS surprise
  FROM bg b JOIN bgc x USING (bg) JOIN w1c c USING (w1) CROSS JOIN vocab
),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, sum(surprise) AS total
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id, CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(p.total // p.n_bigrams AS BIGINT) AS surprise_q
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


# --- quantized tf-idf top terms -----------------------------------------------------

TFIDF_TOP_K = 3
TFIDF_Q = 1_000_000  # idf quantum


def ta_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, term, tfidf_q, rank): each document's top-3 terms by
    quantized tf-idf — the keyword/topic signal a curation pipeline uses
    for domain tagging and mixture assignment.

    Cross-engine-exact by construction: the classic log-idf would hinge
    on ln() ulp agreement (the same trap ta_ngram_lm_score documents), so
    the score is the quantized inverse-df weight computed DIRECTLY:
    ``tfidf_q = (CAST(tf AS DECIMAL(38,0)) * 1e6) DIV df``.  History of
    this expression (two rounds of overflow fixes, each honest about the
    previous one's limit): the r4 pure-BIGINT ``tf * ((N*1e6) DIV df)``
    wraps silently in Spark while DuckDB errors (r5 ADVICE item 1); the
    first r6 fix widened the OUTER product and normalized by N, but the
    inner ``(N*1e6) DIV df`` still narrowed through Spark's IntegralDivide
    — whose result type is always BIGINT even on DECIMAL operands — so at
    N ≳ 9.2e12 the quotient wrapped anyway (review-verified: Spark emits a
    negative score where the HUGEINT twin computes the correct value).
    The closure is ALGEBRAIC: N cancels out of tf·((N·1e6)/df)/N, so the
    direct form needs no 128-bit intermediate at all — the one product is
    DECIMAL(38,0)-wide (HUGEINT in DuckDB), and the true quotient is
    ≤ tf·1e6, int64-bounded for ANY corpus (overflow would need one
    document to contain 9.2e12 occurrences of one term, i.e. a > 9 TB
    document).  The old double-floored form differed from tf·1e6 DIV df
    by at most quantization noise; the direct form IS the intended
    quantity.  Ties break (tfidf_q DESC, term ASC) so the top-3 is fully
    deterministic.

    Shape at 100 TB: one explode → per-(doc, term) counts with map-side
    combine (one shuffle on (doc_id, term)); the df table is
    vocabulary-sized (groupBy term, map-side combined) and joins on the
    term key; the final top-3 window
    partitions by doc_id — group size is the document's distinct-term
    count, bounded by document length, so no hub risk.

    Reference analog: per-field score ranking, kie_utils.py:300-323."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    df_t = toks.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )
    scored = tf.join(df_t, "term").select(
        "doc_id",
        "term",
        F.expr(
            f"CAST((CAST(tf AS DECIMAL(38,0)) * {TFIDF_Q}) DIV df AS BIGINT)"
        ).alias("tfidf_q"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf_q"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tfidf_q", F.col("rank").cast("int").alias("rank"))
    )


TA_TFIDF_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term
),
df_t AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY term
),
scored AS (
  SELECT tf.doc_id, tf.term,
         CAST((CAST(tf.tf AS HUGEINT) * {TFIDF_Q}) // df_t.df AS BIGINT)
           AS tfidf_q
  FROM tf JOIN df_t USING (term)
)
SELECT doc_id, term, tfidf_q, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf_q DESC, term) AS rank
  FROM scored
) WHERE rank <= {TFIDF_TOP_K}
"""


# --- cross-document chunk dedup (exact substring-level duplication signal) ----------

CHUNK_TOKENS = 8


def ta_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_chunks, n_dup_chunks, dup_frac_ppm): per-document
    CROSS-CORPUS duplicated-chunk statistics — the exact substring-level
    dedup signal (CCNet/Gopher-style "remove shared paragraphs") at the
    granularity this corpus supports: non-overlapping CHUNK_TOKENS-token
    windows stand in for paragraphs (the fixture text has no sentence
    separators; real deployments split on structural boundaries, the
    plumbing is identical).

    A chunk is DUPLICATED when the same token sequence appears in more
    than one document (per-document chunk multiplicity does not count —
    that is ta_repetition_filter's in-document signal).  dup_frac_ppm =
    (n_dup_chunks * 1e6) DIV n_chunks, NULL for docs shorter than one
    chunk — integer-exact, same division in DuckDB.

    Shape at 100 TB: the chunk stream is |tokens| / CHUNK_TOKENS rows;
    chunks travel as 60-bit md5 hashes, never text (the dd_exact
    discipline); the frequency table groupBy(hash) is map-side combined;
    the join back is hash-keyed.  Reference analog: duplicate-content
    suppression in merge_boxes, kie_utils.py:195-214."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.lower(F.col("text")), " ")
    n_full = F.floor(F.size(toks) / CHUNK_TOKENS).cast("int")
    # sequence() DESCENDS when start > stop (the ngram_array bug class —
    # see that guard's docstring): a doc shorter than one chunk must yield
    # the EMPTY list, not sequence(0, -1) = [0, -1]
    chunk_arr = F.when(
        n_full >= 1,
        F.transform(
            F.sequence(F.lit(0), n_full - 1),
            lambda i: F.array_join(
                F.slice(toks, i * CHUNK_TOKENS + 1, CHUNK_TOKENS), " "
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    chunks = d.select("doc_id", F.explode(chunk_arr).alias("chunk")).select(
        "doc_id", mdhash_spark(F.col("chunk")).alias("h")
    )
    doc_chunks = chunks.groupBy("doc_id", "h").agg(
        F.count("*").cast("long").alias("mult")
    )
    cross = doc_chunks.select("doc_id", "h").groupBy("h").agg(
        F.count("*").cast("long").alias("n_docs_with")
    )
    per_doc = (
        doc_chunks.join(cross, "h")
        .groupBy("doc_id")
        .agg(
            F.sum("mult").cast("long").alias("n_chunks"),
            F.sum(F.when(F.col("n_docs_with") > 1, F.col("mult")).otherwise(0))
            .cast("long")
            .alias("n_dup_chunks"),
        )
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_chunks", F.lit(0)).cast("long").alias("n_chunks"),
            F.coalesce("n_dup_chunks", F.lit(0)).cast("long").alias("n_dup_chunks"),
            F.expr(
                "CAST(CASE WHEN coalesce(n_chunks, 0) = 0 THEN NULL"
                " ELSE (n_dup_chunks * 1000000) DIV n_chunks END AS BIGINT)"
            ).alias("dup_frac_ppm"),
        )
    )


def chunk_dedup_sql(table: str = "documents") -> str:
    h = MDHASH_SQL("chunk")
    return f"""
WITH t AS (
  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM {table}
),
chunks AS (
  SELECT doc_id, {h} AS h FROM (
    SELECT doc_id,
           unnest(list_transform(range(0, CAST(len(toks) // {CHUNK_TOKENS} AS BIGINT)),
                  i -> array_to_string(list_slice(toks, i * {CHUNK_TOKENS} + 1,
                                                  i * {CHUNK_TOKENS} + {CHUNK_TOKENS}), ' ')))
             AS chunk
    FROM t)
),
doc_chunks AS (
  SELECT doc_id, h, CAST(count(*) AS BIGINT) AS mult
  FROM chunks GROUP BY doc_id, h
),
cross_freq AS (
  SELECT h, CAST(count(*) AS BIGINT) AS n_docs_with FROM doc_chunks GROUP BY h
),
per_doc AS (
  SELECT dc.doc_id,
         CAST(sum(dc.mult) AS BIGINT) AS n_chunks,
         CAST(sum(CASE WHEN cf.n_docs_with > 1 THEN dc.mult ELSE 0 END) AS BIGINT)
           AS n_dup_chunks
  FROM doc_chunks dc JOIN cross_freq cf USING (h)
  GROUP BY dc.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_chunks, 0) AS BIGINT) AS n_chunks,
       CAST(COALESCE(p.n_dup_chunks, 0) AS BIGINT) AS n_dup_chunks,
       CAST(CASE WHEN COALESCE(p.n_chunks, 0) = 0 THEN NULL
            ELSE (p.n_dup_chunks * 1000000) // p.n_chunks END AS BIGINT)
         AS dup_frac_ppm
FROM {table} d LEFT JOIN per_doc p USING (doc_id)
"""
