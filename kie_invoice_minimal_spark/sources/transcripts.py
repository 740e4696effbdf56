"""The ``transcripts`` source table — deterministic synthesis + readers.

The engine's primary input is a table of multi-turn conversation/agent
transcripts ``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp)`` — the corpus analog of the reference's labeled
image corpus (``data/mcocr_labels.json``, keyed by image name; here keyed by
``(conv_id, turn_idx)``).

Synthesis is pure arithmetic on a bigint turn key ``k`` (no RNG), so the
identical table is derivable in PySpark (column expressions, this module)
and in DuckDB (SQL emitted by :func:`duckdb_transcripts_sql` from the SAME
Python constants).  A pytest compares the two row-for-row so the twins
cannot drift.

Turn texts plant mentions from the reference's label vocabulary
(``configs.py:41-51``) and rule triggers (``train_kie.py:73-95``), so golden
triples are computable by the oracle.  Brand surfaces are drawn from alias
variant groups (one "hot" brand is over-represented) to exercise entity
canonicalization and skew salting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.rules import ALIAS_GROUPS, NAME_GAZETTEER

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

TURNS_PER_CONV = 5

# Flattened, ordered token pools (order is load-bearing: both dialects index
# the same lists).
BRAND_VARIANTS: list[str] = [b for grp in ALIAS_GROUPS for b in grp]
NAME_TOKENS: list[str] = sorted(NAME_GAZETTEER)

# Template fragments per turn slot (turn_idx = k % 5).  {} holes are filled
# with derived tokens.  Slot 2 plants a date WITHOUT a preceding label token
# (negative case: stays OTHER); slot 3 uses the bare 'exp' trigger.
_T0 = ("xin chao toi can mua ", " cua ")
_T1 = ("San pham ", " NSX: ", "/2023 HSD: ", "/2025 KL: ", "g")
_T2 = ("ket qua tra cuu ", " trong luong ", "kg het han ", "/2025")
_T3 = ("thuong hieu ", " van con hang exp ", "/2026")
_T4 = "cam on ban nhe"


def _pick(idx: Column, pool: list[str]) -> Column:
    """pool[idx] as a Spark column (1-based element_at)."""
    return F.element_at(
        F.array(*[F.lit(s) for s in pool]), (idx + F.lit(1)).cast("int")
    )


def _name_idx(k: Column) -> Column:
    return (k * 13) % len(NAME_TOKENS)


def _brand_idx(k: Column) -> Column:
    # Hot-entity skew: every 3rd turn uses variant 0 of the hot brand.
    return F.when(k % 3 == 0, F.lit(0)).otherwise(
        1 + (k * 7) % (len(BRAND_VARIANTS) - 1)
    )


def _brand2_idx(k: Column) -> Column:
    """Second adjacent brand token for the multi-token span case."""
    return (k * 11) % len(BRAND_VARIANTS)


def derive_transcripts(keys: DataFrame, key_col: str = "k") -> DataFrame:
    """Derive the transcripts table from a DataFrame of bigint turn keys.

    Pure projection — no shuffle; the derivation parallelizes with the
    input's partitioning.
    """
    k = F.col(key_col).cast("bigint")
    name = _pick(_name_idx(k), NAME_TOKENS)
    brand = _pick(_brand_idx(k), BRAND_VARIANTS)
    mfg_m = (1 + k % 12).cast("string")
    exp_m = (1 + (k * 5) % 12).cast("string")
    weight = (100 + (k % 90) * 10).cast("string")
    turn = (k % TURNS_PER_CONV).cast("int")

    text = (
        F.when(turn == 0, F.concat(F.lit(_T0[0]), name, F.lit(_T0[1]), brand))
        .when(
            turn == 1,
            F.concat(
                F.lit(_T1[0]), name, F.lit(_T1[1]), mfg_m, F.lit(_T1[2]),
                exp_m, F.lit(_T1[3]), weight, F.lit(_T1[4]),
            ),
        )
        .when(
            turn == 2,
            F.concat(
                F.lit(_T2[0]), brand, F.lit(_T2[1]), weight, F.lit(_T2[2]),
                exp_m, F.lit(_T2[3]),
            ),
        )
        .when(
            turn == 3,
            # every other conversation plants TWO adjacent brand tokens —
            # the multi-token span case (reference merges multi-box spans,
            # backend_utils.py:95-121); exercised by kg_mentions_merged
            F.concat(
                F.lit(_T3[0]),
                F.when(
                    F.floor(k / TURNS_PER_CONV) % 2 == 0,
                    F.concat(brand, F.lit(" "), _pick(_brand2_idx(k), BRAND_VARIANTS)),
                ).otherwise(brand),
                F.lit(_T3[1]),
                exp_m,
                F.lit(_T3[2]),
            ),
        )
        .otherwise(F.lit(_T4))
    )
    role = (
        F.when(turn % 3 == 0, F.lit("user"))
        .when(turn % 3 == 1, F.lit("assistant"))
        .otherwise(F.lit("tool"))
    )
    return keys.select(
        F.concat(F.lit("conv-"), F.floor(k / TURNS_PER_CONV).cast("bigint").cast("string")).alias("conv_id"),
        turn.alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        F.when(role == "tool", F.lit("lookup")).otherwise(F.lit(None).cast("string")).alias("tool"),
        F.expr(f"timestamp'2024-01-01 00:00:00' + {key_col} * INTERVAL 1 MINUTE").alias("ts"),
    )


def transcripts_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcripts derived from the driver's ``documents`` table (k = doc_id).

    Used by ``__spark_entry__.queries()`` so the DuckDB oracle can derive the
    identical table from its ``documents`` view.
    """
    # NO spread_scan here (r9 measured non-fix): the detector costs only
    # ~0.06 ms/row, so fanning the 5000-row bench scan to 32 tasks paid
    # more in per-task overhead than the parallelism bought back
    # (kg_mentions 0.42 -> 1.26 s, kg_triples 0.60 -> 1.87 s); the
    # compute-heavy shingle/md5 readers keep the spread instead.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return derive_transcripts(docs.select(F.col("doc_id").alias("k")))


def synth_transcripts(spark: SparkSession, n_turns: int, partitions: int | None = None) -> DataFrame:
    """Synthesize ``n_turns`` transcript rows distributed via spark.range —
    generation scales linearly with parallelism (no driver-side rows)."""
    rng = spark.range(0, n_turns, 1, partitions or spark.sparkContext.defaultParallelism)
    return derive_transcripts(rng.withColumnRenamed("id", "k"))


# ---------------------------------------------------------------------------
# DuckDB twin
# ---------------------------------------------------------------------------

def _sql_pick(idx_sql: str, pool: list[str]) -> str:
    """CASE WHEN chain indexing `pool` — portable, no list-subscript dialect
    differences."""
    whens = " ".join(
        f"WHEN {i} THEN '{tok}'" for i, tok in enumerate(pool)
    )
    return f"(CASE ({idx_sql}) {whens} END)"


def duckdb_transcripts_sql(keys_sql: str = "SELECT doc_id AS k FROM documents") -> str:
    """DuckDB SQL producing exactly the rows of :func:`derive_transcripts`
    over the same keys.  Generated from the same token pools/templates."""
    nv = len(NAME_TOKENS)
    bv = len(BRAND_VARIANTS)
    name = _sql_pick(f"(k * 13) % {nv}", NAME_TOKENS)
    brand = _sql_pick(
        f"CASE WHEN k % 3 = 0 THEN 0 ELSE 1 + (k * 7) % {bv - 1} END", BRAND_VARIANTS
    )
    brand2 = _sql_pick(f"(k * 11) % {bv}", BRAND_VARIANTS)
    mfg_m = "CAST(1 + k % 12 AS VARCHAR)"
    exp_m = "CAST(1 + (k * 5) % 12 AS VARCHAR)"
    weight = "CAST(100 + (k % 90) * 10 AS VARCHAR)"
    return f"""
WITH keys AS ({keys_sql}),
turns AS (
  SELECT k, CAST(k % {TURNS_PER_CONV} AS INTEGER) AS turn_idx,
         {name} AS name_tok, {brand} AS brand_tok,
         CASE WHEN CAST(floor(k / {TURNS_PER_CONV}) AS BIGINT) % 2 = 0
              THEN {brand} || ' ' || {brand2}
              ELSE {brand} END AS brand_span,
         {mfg_m} AS mfg_m, {exp_m} AS exp_m, {weight} AS weight_tok
  FROM keys
)
SELECT
  'conv-' || CAST(CAST(floor(k / {TURNS_PER_CONV}) AS BIGINT) AS VARCHAR) AS conv_id,
  turn_idx,
  CASE WHEN turn_idx % 3 = 0 THEN 'user'
       WHEN turn_idx % 3 = 1 THEN 'assistant'
       ELSE 'tool' END AS role,
  CASE turn_idx
    WHEN 0 THEN '{_T0[0]}' || name_tok || '{_T0[1]}' || brand_tok
    WHEN 1 THEN '{_T1[0]}' || name_tok || '{_T1[1]}' || mfg_m || '{_T1[2]}'
                || exp_m || '{_T1[3]}' || weight_tok || '{_T1[4]}'
    WHEN 2 THEN '{_T2[0]}' || brand_tok || '{_T2[1]}' || weight_tok || '{_T2[2]}'
                || exp_m || '{_T2[3]}'
    WHEN 3 THEN '{_T3[0]}' || brand_span || '{_T3[1]}' || exp_m || '{_T3[2]}'
    ELSE '{_T4}'
  END AS text,
  CASE WHEN turn_idx % 3 = 2 THEN 'lookup' ELSE NULL END AS tool,
  TIMESTAMP '2024-01-01 00:00:00' + k * INTERVAL 1 MINUTE AS ts
FROM turns
"""
