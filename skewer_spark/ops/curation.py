"""End-to-end corpus curation — the capstone composition.

A training-data pipeline is not a bag of operators; it is a FUNNEL:

    raw docs -> quality filter -> dedup -> PII scrub -> token packing

with a row-accounting LEDGER so every dropped document is attributed
to exactly one stage (the compliance artifact a 100-TB curation run
must produce: rows_in/rows_out per stage must chain, and the final
token total must equal what the packer scheduled).

This module chains previously-gated ops VERBATIM — the quality rules
are ``corpus_ops.quality_cls_ctes`` (same text as ``corpus_filter``),
the dedup fingerprint is ``corpus_ops.NORM_FP_EXPR`` (same text as
``dedup_normalized``), the PII patterns are the ``pii_scrub`` trio,
and the packer is ``packing.blocked_prefix_sum`` (same two-phase
distributed prefix sum as ``pack_sequences``) — so the capstone
cannot drift from the already-verified pieces.

Scale shape (the whole point of composing INSIDE one plan): the four
stages are ONE Catalyst plan — a narrow projection + one hash
aggregate for dedup + the blocked prefix-sum windows. No stage
materializes between steps, so column pruning reaches the scan and
the text column is dropped the moment ``scrubbed_md5``/``n_tokens``
are computed. At 10^12 docs the only shuffles are: the dedup
fingerprint groupBy (32-byte digests), the per-block packing windows,
and one broadcast of block totals. The ledger is a handful of
single-row aggregates over the same CTE chain.

Reference anchor: skewer's pipeline composes source -> parser ->
filter -> delivery with per-stage counters exposed as skw_* metrics
(services/milo/milo.go wiring, stats/stats.go counters); the ledger
here is the batch analog of those per-stage counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skewer_spark.ops import corpus_ops as C
from skewer_spark.ops.packing import (
    PACK_BUDGET,
    blocked_prefix_sum,
    pack_position_cols,
)
from skewer_spark.ops.portable import to_spark

# PII patterns — backslash-free so the identical literals parse in
# both engines. CANONICAL definitions: queries.q_pii_scrub (the
# transcripts-side gated query) imports THESE, so the capstone's
# scrub stage and the standalone op share one source of truth.
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PII_IP = "([0-9]{1,3}[.]){3}[0-9]{1,3}"
PII_HOST = "host-[0-9]+"

_SCRUB = (
    f"RREPLACE(RREPLACE(RREPLACE(text, "
    f"'{PII_EMAIL}', '<EMAIL>'), "
    f"'{PII_IP}', '<IP>'), "
    f"'{PII_HOST}', '<HOST>')"
)
_N_RED = (
    f"CAST(RCOUNT(text, '{PII_EMAIL}') + RCOUNT(text, '{PII_IP}') "
    f"+ RCOUNT(text, '{PII_HOST}') AS BIGINT)"
)


def gate_docs_cte() -> str:
    """Deterministic fixture augmentation for the gate corpus — the
    synthetic documents table is clean word-salad, so the funnel's
    dedup and scrub stages would be no-ops on it. Two variant families
    (same discipline as dedup_normalized_sql's fixture): every 5th doc
    re-appears case/punctuation-mangled (must be REMOVED by the dedup
    stage — its normalization fingerprint equals its source's), and
    every 7th doc re-appears with an appended PII sentence (must
    SURVIVE dedup — extra words change the fingerprint — and then be
    redacted by the scrub stage). Production runs use the real table
    untouched (real_docs_cte; curate_pack/run_curation augment
    param)."""
    return f"""docs_src AS (
  SELECT doc_id, lang, text FROM documents
  UNION ALL
  SELECT doc_id + 300000 AS doc_id, lang, upper(text) || ' !!!' AS text
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 600000 AS doc_id, lang,
         text || ' contact user' || CAST(doc_id AS SSTR)
              || '@example.com from 10.0.' || CAST(doc_id % 256 AS SSTR)
              || '.' || CAST(doc_id % 100 AS SSTR)
              || ' via host-' || CAST(doc_id AS SSTR) AS text
  FROM documents WHERE doc_id % 7 = 0
)"""


def real_docs_cte() -> str:
    """Production docs_src: the documents table untouched."""
    return "docs_src AS (SELECT doc_id, lang, text FROM documents)"


def _docs_cte(augment: bool) -> str:
    return gate_docs_cte() if augment else real_docs_cte()


def survivors_ctes(src: str = "docs_src") -> str:
    """The shared funnel CTE chain over ``src``:

      kept    — docs whose quality reason is 'kept'
      normed  — kept + normalization fingerprint
      winners — min doc_id per fingerprint (dedup canonical)
      surv    — the surviving documents (winners' bodies)
      tok     — scrubbed hash + redaction count + token count

    Pure macro-SQL; identical text runs on Spark and DuckDB."""
    return f"""{C.quality_cls_ctes(src)},
kept AS (
  SELECT d.doc_id, d.text FROM {src} d
  JOIN cls ON d.doc_id = cls.doc_id
  WHERE cls.reason = 'kept'
),
normed AS (SELECT doc_id, text, {C.NORM_FP_EXPR} AS norm_fp FROM kept),
winners AS (
  SELECT norm_fp, CAST(min(doc_id) AS BIGINT) AS keep_id
  FROM normed GROUP BY norm_fp
),
surv AS (
  SELECT n.doc_id, n.text
  FROM normed n JOIN winners w ON n.doc_id = w.keep_id
),
tok AS (
  SELECT doc_id,
         md5({_SCRUB}) AS scrubbed_md5,
         {_N_RED} AS n_redactions,
         CAST(ASIZE(SPLIT({_SCRUB}, ' ')) AS BIGINT) AS n_tokens
  FROM surv
)"""


def curation_ledger_sql(budget: int = PACK_BUDGET, augment: bool = True) -> str:
    """The row-accounting ledger: one row per funnel stage with
    (rows_in, rows_out, metric). metric is stage-specific — docs
    dropped for the two filtering stages, total redactions for the
    scrub, total tokens for the packer (whose rows_out is the number
    of packs the token stream cuts into). rows_out of stage N equals
    rows_in of stage N+1 BY CONSTRUCTION of the shared CTE chain; the
    gate hashes the whole table cross-engine."""
    return f"""
WITH {_docs_cte(augment)},
{survivors_ctes()},
raw_n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM docs_src),
kept_n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM kept),
surv_n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM surv),
red_n AS (SELECT CAST(COALESCE(sum(n_redactions), 0) AS BIGINT) AS n FROM tok),
tok_n AS (SELECT CAST(COALESCE(sum(n_tokens), 0) AS BIGINT) AS n FROM tok)
SELECT * FROM (
  SELECT CAST(1 AS INT) AS stage_idx, 'quality_filter' AS stage,
         raw_n.n AS rows_in, kept_n.n AS rows_out,
         raw_n.n - kept_n.n AS metric
  FROM raw_n, kept_n
  UNION ALL
  SELECT CAST(2 AS INT), 'dedup_normalized', kept_n.n, surv_n.n,
         kept_n.n - surv_n.n
  FROM kept_n, surv_n
  UNION ALL
  SELECT CAST(3 AS INT), 'pii_scrub', surv_n.n, surv_n.n, red_n.n
  FROM surv_n, red_n
  UNION ALL
  SELECT CAST(4 AS INT), 'pack_sequences', surv_n.n,
         IDIV(tok_n.n + {budget} - 1, {budget}), tok_n.n
  FROM surv_n, tok_n
) t"""


def curate_pack(
    spark: SparkSession,
    sf_dir: str,
    budget: int = PACK_BUDGET,
    augment: bool = True,
) -> DataFrame:
    """The funnel's OUTPUT: every surviving document with its scrubbed
    hash, redaction count, and scheduled place in the packed token
    stream. Spark side = the shared CTE chain (Catalyst SQL) feeding
    the DISTRIBUTED two-phase prefix sum (packing.blocked_prefix_sum —
    no single-partition global window); the oracle restates the prefix
    sum as the plain global window DuckDB can afford at gate scale."""
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    base = spark.sql(
        to_spark(
            f"WITH {_docs_cte(augment)},\n{survivors_ctes()}\n"
            "SELECT doc_id, n_tokens, n_redactions, scrubbed_md5 FROM tok"
        )
    )
    c = blocked_prefix_sum(base, order_col="doc_id", value_col="n_tokens")
    return c.select(
        "doc_id",
        "n_tokens",
        "n_redactions",
        "scrubbed_md5",
        F.col("start_tok").cast("long").alias("start_tok"),
        *pack_position_cols(budget),
    )


def curate_pack_oracle_sql(
    budget: int = PACK_BUDGET, augment: bool = True
) -> str:
    """Independent DuckDB restatement: identical funnel CTEs, prefix
    sum as one global window (exclusive ROWS frame)."""
    return f"""
WITH {_docs_cte(augment)},
{survivors_ctes()},
c AS (
  SELECT doc_id, n_tokens, n_redactions, scrubbed_md5,
         CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS start_tok
  FROM tok
)
SELECT doc_id, n_tokens, n_redactions, scrubbed_md5, start_tok,
       IDIV(start_tok, {budget}) AS pack_first,
       IDIV(start_tok + n_tokens - 1, {budget}) AS pack_last,
       CAST(start_tok % {budget} AS INT) AS offset_in_pack,
       CAST(IDIV(start_tok + n_tokens - 1, {budget})
            - IDIV(start_tok, {budget}) + 1 AS INT) AS packs_spanned
FROM c"""


def run_curation(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    run_id: str = "curation-1",
    budget: int = PACK_BUDGET,
    augment: bool = False,
) -> dict[str, int]:
    """Operational capstone: run the funnel over the REAL documents
    table (augment=False — no gate fixture variants; pass augment=True
    only to reproduce the gate corpus) and COMMIT both artifacts — the
    curated/packed document table and its ledger — as IceLite tables
    (atomic manifest commit, idempotent by run_id: a replayed run is a
    no-op, same exactly-once discipline as the pipeline's sink
    writes). Returns {table: rows_committed}."""
    from skewer_spark.icelite import IceLiteTable

    packed = curate_pack(spark, sf_dir, budget=budget, augment=augment)
    ledger = spark.sql(to_spark(curation_ledger_sql(budget, augment=augment)))
    out: dict[str, int] = {}
    for name, df in (("curated_docs", packed), ("curation_ledger", ledger)):
        t = IceLiteTable(out_dir, name)
        t.append(df, run_id=run_id)
        out[name] = t.read(spark).count()
    return out
