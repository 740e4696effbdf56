"""Candidate generation via MinHash / ngram blocking — SURVEY.md §2.6 (E2 at scale).

The reference prunes the O(n^2) edge space per page with a spatial band
(|Δy| <= 3·line_height, ``kie_utils.py:133-137``).  Across a 10^12-turn
corpus the analog is *blocking*: only surfaces that share a MinHash band
bucket become candidate pairs.  Everything here is JVM-side column algebra —
shingles via higher-order functions, MinHash via min(xxhash64(shingle, seed)),
band keys via hashing the signature slice — no Python.

Pipeline:
  mentions --(distinct surface)--> surface table   (the big dedup: linking
      operates on distinct surface forms, orders of magnitude smaller than
      the mention stream)
  surface --(normalize, shingle, minhash)--> signatures
  signatures --(explode bands)--> (band_key, surface)
  self-join on band_key (block-size capped) --> candidate pairs

Scale notes: the only shuffles are the distinct() and the band-key join.
Hot bands (stop-word-like surfaces) are capped at MAX_BLOCK_SIZE — a capped
block is dropped with a counter, not exploded (the north rule's "block-size
caps, overflow -> sub-salt"); AQE skew-join splits the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 8 bands x 2 rows: candidate recall at Jaccard 0.65 is ~0.99 (4 bands x 3
# rows missed ~27% of true near-pairs at that similarity — measured on the
# 15k-surface stress run)
N_HASHES = 16  # minhash signature length
N_BANDS = 8  # bands of r = N_HASHES / N_BANDS rows
ROWS_PER_BAND = N_HASHES // N_BANDS
SHINGLE_K = 3
MAX_BLOCK_SIZE = 50  # candidate blocks larger than this are dropped (counted)


def normalize_surface(col):
    """lower + strip diacritics + drop non-alphanumeric.

    Diacritic stripping uses explicit Vietnamese char maps (translate) so it
    stays JVM-side; the DuckDB twin is strip_accents(lower(..)).
    """
    src = "àáảãạăằắẳẵặâầấẩẫậèéẻẽẹêềếểễệìíỉĩịòóỏõọôồốổỗộơờớởỡợùúủũụưừứửữựỳýỷỹỵđ"
    dst = "aaaaaaaaaaaaaaaaaeeeeeeeeeeeiiiiiooooooooooooooooouuuuuuuuuuuyyyyyd"
    return F.regexp_replace(
        F.translate(F.lower(col), src, dst), "[^a-z0-9]", ""
    )


def _padded(col):
    """Boundary-padded normalized form so shingles see word edges."""
    return F.concat(F.lit("^^"), col, F.lit("$$"))


def shingles(col):
    """Character k-grams of the padded normalized surface (distinct)."""
    p = _padded(col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(p) - F.lit(SHINGLE_K - 1)),
            lambda i: p.substr(i, F.lit(SHINGLE_K)),
        )
    )


def surface_signatures(mentions: DataFrame, surface_col: str = "surface") -> DataFrame:
    """Distinct surfaces with normalized form, shingle set and MinHash bands.

    Returns: surface, norm, grams (array<string>), band_0..band_{N_BANDS-1}.
    """
    return signatures_from_surfaces(
        mentions.select(F.col(surface_col).alias("surface")).distinct()
    )


def signatures_from_surfaces(surf: DataFrame) -> DataFrame:
    """Signatures from an ALREADY-DISTINCT ``surface`` table (r9): callers
    that materialize the distinct-surface set once (link_entities) feed it
    here directly, so the upstream mention lineage is not re-executed per
    consumer job."""
    surf = (
        surf.withColumn("norm", normalize_surface(F.col("surface")))
        .withColumn("grams", shingles(F.col("norm")))
    )
    # minhash_i = min over grams of the i-th affine transform of ONE base
    # hash per gram (h_i = (a_i*h + b_i) mod P) — one hash pass, K cheap
    # arithmetic passes.  P = 2^31-1 keeps products overflow-safe.
    # NB: single-arg lambdas only — a two-arg lambda makes transform() bind
    # the array index to the second parameter.
    P = (1 << 31) - 1
    surf = surf.withColumn(
        "hb", F.transform("grams", lambda g: F.pmod(F.xxhash64(g), F.lit(P)))
    )

    def _mh(i: int):
        a, b = 2 * i + 3, (7919 * (i + 1)) % P
        return lambda h: (h * a + b) % P

    sig_cols = [
        F.array_min(F.transform("hb", _mh(i))).alias(f"mh_{i}")
        for i in range(N_HASHES)
    ]
    surf = surf.select("surface", "norm", "grams", *sig_cols)
    band_cols = [
        F.xxhash64(
            *[F.col(f"mh_{j}") for j in range(b * ROWS_PER_BAND, (b + 1) * ROWS_PER_BAND)]
        ).alias(f"band_{b}")
        for b in range(N_BANDS)
    ]
    return surf.select("surface", "norm", "grams", *band_cols)


def candidate_pairs(
    mentions: DataFrame,
    surface_col: str = "surface",
    max_block_size: int = MAX_BLOCK_SIZE,
) -> DataFrame:
    """Unordered candidate surface pairs sharing >= 1 MinHash band.

    Returns: surface_a, surface_b, norm_a, norm_b, grams_a, grams_b,
    block_key.  Pairs are deduped across bands (a pair sharing 3 bands
    appears once, keyed by its smallest band).
    """
    return candidate_pairs_from_surfaces(
        mentions.select(F.col(surface_col).alias("surface")).distinct(),
        max_block_size=max_block_size,
    )


def candidate_pairs_from_surfaces(
    surf: DataFrame, max_block_size: int = MAX_BLOCK_SIZE
) -> DataFrame:
    """candidate_pairs over an ALREADY-DISTINCT surface table (r9) — see
    signatures_from_surfaces for why callers pass one in."""
    # The signature table is the root of a diamond (bands, block-size
    # counts, both self-join sides) but needs NO explicit materialization:
    # every branch shares the distinct()'s exchange, which Spark reuses
    # (ReusedExchange).  Measured A/B at sf0.1: an eager localCheckpoint
    # here was ~1s SLOWER per query (extra job) than letting the reuse
    # happen — don't re-add it.
    sig = signatures_from_surfaces(surf)
    bands = sig.select(
        "surface",
        "norm",
        "grams",
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band_no"), F.col(f"band_{b}").alias("bkey")) for b in range(N_BANDS)])
        ).alias("bd"),
    ).select(
        "surface", "norm", "grams", "bd.band_no", F.col("bd.bkey").alias("block_key")
    )
    # block-size cap: count per block, drop oversized blocks (counted
    # upstream).  Plain join — the sizes table is O(distinct blocks), far too
    # big to broadcast at corpus scale; AQE picks broadcast when it fits.
    sizes = bands.groupBy("band_no", "block_key").agg(F.count("*").alias("block_n"))
    bands = bands.join(
        sizes.filter(F.col("block_n") <= max_block_size),
        ["band_no", "block_key"],
    )
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.block_key") == F.col("b.block_key"))
            & (F.col("a.surface") < F.col("b.surface")),
        )
        .select(
            F.col("a.surface").alias("surface_a"),
            F.col("b.surface").alias("surface_b"),
            F.col("a.norm").alias("norm_a"),
            F.col("b.norm").alias("norm_b"),
            F.col("a.grams").alias("grams_a"),
            F.col("b.grams").alias("grams_b"),
            F.col("a.block_key").alias("block_key"),
        )
    )
    # dedupe pairs that co-occur in several bands: keep min block_key
    deduped = pairs.groupBy("surface_a", "surface_b").agg(
        F.first("norm_a").alias("norm_a"),
        F.first("norm_b").alias("norm_b"),
        F.first("grams_a").alias("grams_a"),
        F.first("grams_b").alias("grams_b"),
        F.min("block_key").alias("block_key"),
    )
    # pair features computed JVM-side so the scorer UDF gets ready columns
    # (no set algebra in Python): 3-gram Jaccard, normalized equality,
    # 2-char-prefix match, length ratio.
    inter = F.size(F.array_intersect("grams_a", "grams_b")).cast("double")
    union = (F.size("grams_a") + F.size("grams_b")).cast("double") - inter
    la = F.length("norm_a").cast("double")
    lb = F.length("norm_b").cast("double")
    return deduped.select(
        "surface_a",
        "surface_b",
        "norm_a",
        "norm_b",
        "block_key",
        F.when(union > 0, inter / union).otherwise(F.lit(0.0)).alias("jaccard"),
        (F.col("norm_a") == F.col("norm_b")).cast("double").alias("norm_eq"),
        (F.substring("norm_a", 1, 2) == F.substring("norm_b", 1, 2))
        .cast("double")
        .alias("prefix_eq"),
        (F.least(la, lb) / F.greatest(F.greatest(la, lb), F.lit(1.0))).alias(
            "len_ratio"
        ),
    )
