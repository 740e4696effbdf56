"""DuckDB twins of the KG pipeline stages, generated from the SAME constants
as the Spark implementation (:mod:`.rules`, :mod:`..sources.transcripts`)
so the dialects cannot drift.  Used by ``__spark_entry__.oracle_sql()``.
"""

from __future__ import annotations

from . import rules
from ..sources.transcripts import duckdb_transcripts_sql


def _in_list(tokens: tuple[str, ...]) -> str:
    return ",".join(f"'{t}'" for t in tokens)


def _classify_case() -> str:
    """The rule CASE — mirrors rules.classify_token / the Spark detectors."""
    mfg_l = _in_list(rules.MFG_LABEL_TOKENS)
    exp_l = _in_list(rules.EXP_LABEL_TOKENS)
    wt_l = _in_list(rules.WEIGHT_LABEL_TOKENS)
    brands = _in_list(tuple(sorted(rules.BRAND_GAZETTEER)))
    names = _in_list(tuple(sorted(rules.NAME_GAZETTEER)))
    return f"""
      CASE
        WHEN lower(tok) IN ({mfg_l}) THEN 'MFG_LABEL'
        WHEN lower(tok) IN ({exp_l}) THEN 'EXP_LABEL'
        WHEN lower(tok) IN ({wt_l}) THEN 'WEIGHT_LABEL'
        WHEN regexp_matches(tok, '{rules.DATE_RE_SQL}') THEN
          CASE WHEN lower(coalesce(prev, '')) IN ({mfg_l}) THEN 'MFG'
               WHEN lower(coalesce(prev, '')) IN ({exp_l}) THEN 'EXP'
               ELSE 'OTHER' END
        WHEN regexp_matches(lower(tok), '{rules.WEIGHT_RE_SQL}') THEN 'WEIGHT'
        WHEN tok IN ({brands}) THEN 'BRAND'
        WHEN tok IN ({names}) THEN 'NAME'
        ELSE 'OTHER'
      END
    """


def _classified_tokens_cte(keys_sql: str) -> str:
    return f"""
WITH transcripts AS ({duckdb_transcripts_sql(keys_sql)}),
tok0 AS (
  SELECT conv_id, turn_idx,
         unnest(list_transform(string_split(text, ' '),
                               (t, i) -> struct_pack(pos := i - 1, tok := t))) AS u
  FROM transcripts
),
flat AS (
  SELECT conv_id, turn_idx, CAST(u.pos AS INTEGER) AS pos, u.tok AS tok FROM tok0
),
ctx AS (
  SELECT *,
         lag(tok) OVER (PARTITION BY conv_id, turn_idx ORDER BY pos) AS prev,
         CAST(coalesce(sum(length(tok) + 1) OVER (
             PARTITION BY conv_id, turn_idx ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INTEGER)
           AS span_start
  FROM flat
),
lab AS (
  SELECT conv_id, turn_idx, pos, span_start,
         CAST(span_start + length(tok) AS INTEGER) AS span_end,
         tok AS surface,
         {_classify_case()} AS mention_type
  FROM ctx
)
"""


def mentions_sql(keys_sql: str = "SELECT doc_id AS k FROM documents") -> str:
    """DuckDB twin of operators/mention_detect over derived transcripts."""
    return (
        _classified_tokens_cte(keys_sql)
        + """
SELECT conv_id, turn_idx, pos, span_start, span_end, surface, mention_type
FROM lab WHERE mention_type != 'OTHER'
"""
    )


def merged_mentions_sql(keys_sql: str = "SELECT doc_id AS k FROM documents") -> str:
    """DuckDB twin of operators/mention_detect.merge_adjacent_mentions over
    the derived transcripts: gaps-and-islands on token position."""
    return (
        _classified_tokens_cte(keys_sql)
        + """
, kept AS (SELECT * FROM lab WHERE mention_type != 'OTHER')
, isl AS (
  SELECT *,
         pos - row_number() OVER (
           PARTITION BY conv_id, turn_idx, mention_type ORDER BY pos) AS island
  FROM kept
)
SELECT conv_id, turn_idx,
       CAST(min(pos) AS INTEGER) AS pos,
       CAST(min(span_start) AS INTEGER) AS span_start,
       CAST(max(span_end) AS INTEGER) AS span_end,
       string_agg(surface, ' ' ORDER BY pos) AS surface,
       mention_type,
       CAST(count(*) AS INTEGER) AS n_tokens
FROM isl
GROUP BY conv_id, turn_idx, mention_type, island
"""
    )


def merged_rescan_sql(keys_sql: str = "SELECT doc_id AS k FROM documents") -> str:
    """DuckDB twin of mention_detect.rescan_merged_surfaces: the merged-span
    surface is RE-EXTRACTED from the turn text (the reference's merged-crop
    re-OCR, backend_utils.py:110-113) instead of string_agg over members."""
    return (
        _classified_tokens_cte(keys_sql)
        + """
, kept AS (SELECT * FROM lab WHERE mention_type != 'OTHER')
, isl AS (
  SELECT *,
         pos - row_number() OVER (
           PARTITION BY conv_id, turn_idx, mention_type ORDER BY pos) AS island
  FROM kept
)
, merged AS (
  SELECT conv_id, turn_idx,
         CAST(min(pos) AS INTEGER) AS pos,
         CAST(min(span_start) AS INTEGER) AS span_start,
         CAST(max(span_end) AS INTEGER) AS span_end,
         mention_type,
         CAST(count(*) AS INTEGER) AS n_tokens
  FROM isl
  GROUP BY conv_id, turn_idx, mention_type, island
)
SELECT m.conv_id, m.turn_idx, m.pos, m.span_start, m.span_end,
       substr(t.text, m.span_start + 1, m.span_end - m.span_start) AS surface,
       m.mention_type, m.n_tokens
FROM merged m JOIN transcripts t USING (conv_id, turn_idx)
"""
    )


# Normalization twin of operators/blocking.normalize_surface: lower, strip
# accents (+ đ, which strip_accents leaves), drop non-alphanumeric.
NORM_SQL = (
    "regexp_replace(replace(strip_accents(lower({col})), 'đ', 'd'),"
    " '[^a-z0-9]', '', 'g')"
)


def entity_map_sql(keys_sql: str = "SELECT doc_id AS k FROM documents") -> str:
    """DuckDB twin of plans/entity_linking.link_entities restricted to the
    planted data, where true alias groups collapse to one normalized form:
    component == normalized-form group, canonical == min(surface)."""
    norm = NORM_SQL.format(col="surface")
    return (
        _classified_tokens_cte(keys_sql)
        + f"""
, brands AS (SELECT DISTINCT surface FROM lab WHERE mention_type = 'BRAND')
, normed AS (SELECT surface, {norm} AS norm FROM brands)
SELECT n.surface AS surface, m.canonical_surface AS canonical_surface
FROM normed n
JOIN (SELECT norm, min(surface) AS canonical_surface FROM normed GROUP BY norm) m
  USING (norm)
"""
    )


def alias_triples_sql(keys_sql: str = "SELECT doc_id AS k FROM documents") -> str:
    norm = NORM_SQL.format(col="surface")
    return (
        _classified_tokens_cte(keys_sql)
        + f"""
, brands AS (SELECT DISTINCT surface FROM lab WHERE mention_type = 'BRAND')
, normed AS (SELECT surface, {norm} AS norm FROM brands)
, canon AS (SELECT norm, min(surface) AS canonical_surface FROM normed GROUP BY norm)
SELECT c.canonical_surface AS subj, 'HAS_ALIAS' AS pred, n.surface AS obj
FROM normed n JOIN canon c USING (norm)
WHERE n.surface != c.canonical_surface
"""
    )


def cc_over_band_pairs_sql(e2_sql: str) -> str:
    """Recursive-CTE connected components over the band-self-join pair list —
    the oracle for the iterative large-star/small-star algorithm."""
    return f"""
WITH RECURSIVE pairs AS ({e2_sql.strip()}),
sym AS (SELECT src_id AS u, dst_id AS v FROM pairs
        UNION SELECT dst_id, src_id FROM pairs),
reach(node, comp) AS (
  SELECT u, u FROM sym
  UNION
  SELECT s.v, r.comp FROM reach r JOIN sym s ON s.u = r.node
)
SELECT node AS event_id, min(comp) AS component FROM reach GROUP BY node
"""


def triples_sql(keys_sql: str = "SELECT doc_id AS k FROM documents") -> str:
    """DuckDB twin of the flagship pipeline (plans/pipeline.py)."""
    return (
        _classified_tokens_cte(keys_sql)
        + """
SELECT conv_id AS subj, mention_type AS pred,
       string_agg(surface, ' ' ORDER BY turn_idx, pos) AS obj,
       conv_id
FROM lab WHERE mention_type != 'OTHER'
GROUP BY conv_id, mention_type
"""
    )


def canonical_triples_sql(keys_sql: str = "SELECT doc_id AS k FROM documents") -> str:
    """Twin of plans/entity_linking.canonical_triples: BRAND surfaces are
    rewritten to their normalized-group canonical before triple concat."""
    norm = NORM_SQL.format(col="surface")
    return (
        _classified_tokens_cte(keys_sql)
        + f"""
, brands AS (SELECT DISTINCT surface FROM lab WHERE mention_type = 'BRAND')
, normed AS (SELECT surface, {norm} AS norm FROM brands)
, emap AS (
    SELECT n.surface, m.canonical_surface
    FROM normed n
    JOIN (SELECT norm, min(surface) AS canonical_surface FROM normed GROUP BY norm) m
      USING (norm)
)
SELECT conv_id AS subj, mention_type AS pred,
       string_agg(coalesce(e.canonical_surface, l.surface), ' '
                  ORDER BY turn_idx, pos) AS obj,
       conv_id
FROM lab l LEFT JOIN emap e ON l.surface = e.surface
WHERE mention_type != 'OTHER'
GROUP BY conv_id, mention_type
"""
    )


def canonical_mentions_sql(keys_sql: str = "SELECT doc_id AS k FROM documents") -> str:
    """Mentions with BRAND surfaces rewritten to their canonical form — the
    canonicalized-mention stream that downstream KG analytics (e.g. the
    canonical-entity PageRank) consume.  Same independent normalized-group
    formulation as entity_map_sql."""
    norm = NORM_SQL.format(col="surface")
    return (
        _classified_tokens_cte(keys_sql)
        + f"""
, brands AS (SELECT DISTINCT surface FROM lab WHERE mention_type = 'BRAND')
, normed AS (SELECT surface, {norm} AS norm FROM brands)
, emap AS (
    SELECT n.surface, m.canonical_surface
    FROM normed n
    JOIN (SELECT norm, min(surface) AS canonical_surface FROM normed GROUP BY norm) m
      USING (norm)
)
SELECT l.conv_id, l.turn_idx, l.pos, l.span_start, l.span_end,
       coalesce(e.canonical_surface, l.surface) AS surface, l.mention_type
FROM lab l LEFT JOIN emap e ON l.surface = e.surface
WHERE l.mention_type != 'OTHER'
"""
    )
