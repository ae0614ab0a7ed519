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


def _src_ctes(augment: bool, where: str | None) -> tuple[str, str]:
    """(CTE text, source relation name): docs_src, optionally
    restricted to a batch predicate (the day-N slice of the corpus).
    where=None yields exactly the unrestricted text the gate pins."""
    base = _docs_cte(augment)
    if where is None:
        return base, "docs_src"
    return (
        base
        + f""",
batch AS (SELECT doc_id, lang, text FROM docs_src WHERE {where})""",
        "batch",
    )


def _kept_winners_ctes(src: str) -> str:
    """quality -> kept -> fingerprint -> per-fingerprint winner, the
    front half shared by the full funnel and the incremental one."""
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
)"""


def _tok_cte() -> str:
    """surv -> scrubbed hash + redaction count + token count."""
    return f"""tok AS (
  SELECT doc_id,
         md5({_SCRUB}) AS scrubbed_md5,
         {_N_RED} AS n_redactions,
         CAST(ASIZE(SPLIT({_SCRUB}, ' ')) AS BIGINT) AS n_tokens
  FROM surv
)"""


def survivors_ctes(src: str = "docs_src") -> str:
    """The shared funnel CTE chain over ``src``:

      kept    — docs whose quality reason is 'kept'
      normed  — kept + normalization fingerprint
      winners — min doc_id per fingerprint (dedup canonical)
      surv    — the surviving documents (winners' bodies)
      tok     — scrubbed hash + redaction count + token count

    Pure macro-SQL; identical text runs on Spark and DuckDB."""
    return f"""{_kept_winners_ctes(src)},
surv AS (
  SELECT n.doc_id, n.text
  FROM normed n JOIN winners w ON n.doc_id = w.keep_id
),
{_tok_cte()}"""


def funnel_tok_df(
    spark: SparkSession,
    sf_dir: str | None,
    augment: bool = True,
    where: str | None = None,
    keep_fp: bool = False,
) -> DataFrame:
    """SINGLE-PASS Spark-side evaluation of the survivors funnel — the
    scale form of ``survivors_ctes`` (same verdicts, pinned by
    tests/test_curation.py::test_single_pass_funnel_matches_macro and
    the cross-engine gate, which now compares two INDEPENDENT
    formulations: this one on Spark vs the relational restatement on
    DuckDB).

    Why not run the shared macro text on Spark too: the relational
    form re-reads the corpus once per CTE reference (cls joins back on
    doc_id, winners joins back on keep_id), so the scan + the
    array/regex feature expressions — the DRAM-heaviest work in the
    whole capstone — execute 3-4x per row. Measured at 2.7 M docs that
    recomputation dominates the funnel wall AND collapses its 2-vs-8
    core scaling (the duplicated array churn saturates memory
    bandwidth before it saturates cores). This form instead:

      one scan -> one projection computing the quality CASE
      (corpus_ops.quality_case_inline — same fragments as the macro),
      norm_fp, scrubbed_md5, n_redactions, n_tokens -> filter kept ->
      ONE hash aggregate: min_by(value, doc_id) per fingerprint.

    Bodies are never shuffled (only 32-byte digests + ints), there is
    no self-join at all, and every per-row expression evaluates
    exactly once. The scrub trio is computed for kept-but-duplicate
    docs whose values are then discarded by min_by — a bounded waste
    (the duplicate fraction) traded for never traversing the scan
    twice; at 10^12 docs that trade wins by the width of the text
    column. min_by is deterministic here because doc_id is unique."""
    if sf_dir is not None:
        spark.read.parquet(
            f"{sf_dir}/documents.parquet"
        ).createOrReplaceTempView("documents")
    ctes, src = _src_ctes(augment, where)
    fp_col = ",\n       norm_fp" if keep_fp else ""
    return spark.sql(
        to_spark(
            f"""WITH {ctes},
kt AS (
  SELECT doc_id, {C.NORM_FP_EXPR} AS norm_fp,
         md5({_SCRUB}) AS scrubbed_md5,
         {_N_RED} AS n_redactions,
         CAST(ASIZE(SPLIT({_SCRUB}, ' ')) AS BIGINT) AS n_tokens
  FROM {src}
  WHERE ({C.quality_case_inline()}) = 'kept'
)
SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
       min_by(n_tokens, doc_id) AS n_tokens,
       min_by(n_redactions, doc_id) AS n_redactions,
       min_by(scrubbed_md5, doc_id) AS scrubbed_md5{fp_col}
FROM kt GROUP BY norm_fp"""
        )
    )


def increment_ctes(src: str) -> str:
    """Funnel CTE chain for a NEW batch curated against the COMMITTED
    corpus: identical quality/normalization/winner stages, plus the
    frozen-snapshot exclusion — a batch winner survives only if its
    fingerprint is absent from ``corpus_fps`` (the committed
    fingerprint table, registered as a temp view by curate_increment).
    This is dedup_incremental's scale discipline applied to the whole
    funnel: the historical side is a DISTINCT fingerprint projection
    equi-joined against the (small) batch — historical BODIES are
    never re-read, never re-shuffled."""
    return f"""{_kept_winners_ctes(src)},
fresh AS (
  SELECT w.norm_fp, w.keep_id FROM winners w
  LEFT JOIN corpus_fps c ON w.norm_fp = c.norm_fp
  WHERE c.norm_fp IS NULL
),
surv AS (
  SELECT n.doc_id, n.text
  FROM normed n JOIN fresh f ON n.doc_id = f.keep_id
),
{_tok_cte()}"""


def curation_ledger_sql(
    budget: int = PACK_BUDGET,
    augment: bool = True,
    where: str | None = None,
) -> str:
    """The row-accounting ledger: one row per funnel stage with
    (rows_in, rows_out, metric). metric is stage-specific — docs
    dropped for the two filtering stages, total redactions for the
    scrub, total tokens for the packer (whose rows_out is the number
    of packs the token stream cuts into). rows_out of stage N equals
    rows_in of stage N+1 BY CONSTRUCTION of the shared CTE chain; the
    gate hashes the whole table cross-engine."""
    ctes, src = _src_ctes(augment, where)
    return f"""
WITH {ctes},
{survivors_ctes(src)},
raw_n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM {src}),
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
    where: str | None = None,
) -> DataFrame:
    """The funnel's OUTPUT: every surviving document with its scrubbed
    hash, redaction count, and scheduled place in the packed token
    stream. Spark side = the single-pass funnel (funnel_tok_df — one
    scan, one narrow aggregate, bodies never shuffled) feeding the
    DISTRIBUTED two-phase prefix sum (packing.blocked_prefix_sum — no
    single-partition global window); the oracle independently restates
    the funnel relationally (winners join) and the prefix sum as the
    plain global window DuckDB can afford at gate scale.

    The funnel output is MATERIALIZED (localCheckpoint) before the
    prefix sum: the sum's window leg and block-totals leg are
    differently-pruned projections of the same input, so Catalyst
    cannot reuse the funnel's aggregate exchange between them
    (verified: without the cut the plan holds TWO FileScans — the
    whole scan+regex funnel executes twice). Cutting lineage here is
    exactly packing.py's documented trade: the two prefix-sum
    traversals then re-read ~4 narrow materialized columns, not two
    tokenizations. Plan-gated (test_curate_pack_plan_shape: zero
    FileScans downstream of the cut). At real scale stage the narrow
    frame to parquet instead; localCheckpoint is the single-host
    spelling of the same move (same note as run_curation)."""
    base = funnel_tok_df(
        spark, sf_dir, augment=augment, where=where
    ).localCheckpoint()
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


def _meta_path(out_dir: str) -> str:
    import os

    return os.path.join(out_dir, "curation_meta.json")


def _read_meta(out_dir: str) -> dict:
    import json
    import os

    path = _meta_path(out_dir)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def _write_meta(out_dir: str, meta: dict) -> None:
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    tmp = _meta_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _meta_path(out_dir))


def _check_budget(out_dir: str, budget: int) -> None:
    """Persist the pack budget on first use; refuse a different one
    later — pack columns tiled at mixed boundaries would silently
    corrupt the committed table."""
    meta = _read_meta(out_dir)
    if "budget" in meta:
        if meta["budget"] != budget:
            raise ValueError(
                f"budget {budget} != committed budget {meta['budget']} "
                f"(pinned in {_meta_path(out_dir)}); pack boundaries must "
                "be uniform across runs of one warehouse"
            )
        return
    meta["budget"] = budget
    _write_meta(out_dir, meta)


def _record_raw_bound(
    out_dir: str, batch_max_id: int | None, run_id: str
) -> None:
    """Track the highest RAW doc_id any committed batch has covered —
    the id bound the overlap guard compares against (the curated max
    is NOT usable: a batch whose trailing docs were all filtered out
    would leave a hole the guard could not see). The bound is recorded
    PER RUN (``raw_bounds[run_id]``), not just as a global max: the
    guard must ignore the bound a run itself wrote, or a crash between
    this write and the first table append would make the rerun of the
    SAME run_id refuse its own raw range forever (ADVICE r4 #1 — the
    rerun's min_id <= its own recorded max_id always). ``max_raw_id``
    is kept as the legacy aggregate for warehouses predating the
    per-run field."""
    if batch_max_id is None:
        return
    meta = _read_meta(out_dir)
    if "raw_bounds" not in meta and "max_raw_id" in meta:
        # migrating a legacy warehouse: its unattributed aggregate is
        # some OTHER run's coverage — keep it as a synthetic entry so
        # the exclusion arithmetic never forgets committed legacy runs
        meta["raw_bounds"] = {"__legacy__": meta["max_raw_id"]}
    bounds = meta.setdefault("raw_bounds", {})
    if bounds.get(run_id) == int(batch_max_id):
        return
    bounds[run_id] = int(batch_max_id)
    meta["max_raw_id"] = max(meta.get("max_raw_id", -1), int(batch_max_id))
    _write_meta(out_dir, meta)


def _committed_bound_excluding(out_dir: str, run_id: str) -> int | None:
    """The highest raw doc_id recorded by any OTHER run — what the
    overlap guard compares a new batch against. Mirrors
    curation_stream's replay recognition: a bound this run itself
    wrote (then crashed before appending) must not block its rerun.
    Returns None when no other run has recorded a bound; legacy
    warehouses (meta has max_raw_id but no raw_bounds attribution)
    fall back to the unattributed aggregate — over-refusal on a
    crashed legacy rerun is the safe direction."""
    meta = _read_meta(out_dir)
    bounds = meta.get("raw_bounds")
    if bounds is None:
        return meta.get("max_raw_id")
    other = [v for k, v in bounds.items() if k != run_id]
    return max(other) if other else None


def run_curation(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    run_id: str = "curation-1",
    budget: int = PACK_BUDGET,
    augment: bool = False,
    where: str | None = None,
) -> dict[str, int]:
    """Operational capstone: run the funnel over the REAL documents
    table (augment=False — no gate fixture variants; pass augment=True
    only to reproduce the gate corpus), optionally restricted to a
    ``where`` batch predicate, and COMMIT three artifacts as IceLite
    tables — the curated/packed documents, the ledger, and the
    survivor FINGERPRINTS (``curated_fps``: what curate_increment
    needs to dedup future batches without re-reading bodies). Atomic
    manifest commits, idempotent by run_id: a replayed run is a no-op,
    same exactly-once discipline as the pipeline's sink writes.
    The committed ledger carries a ``run_id`` column (appended after
    the gate-pinned SQL) so per-run rows are attributable and
    curate_increment can derive the committed token offset from the
    ledger alone. The pack ``budget`` is persisted to
    ``<out_dir>/curation_meta.json`` on the first run; later runs and
    increments refuse a different budget (mixed-boundary pack columns
    would silently corrupt the table). Returns
    {table: rows_committed}."""
    from skewer_spark.icelite import IceLiteTable

    _check_budget(out_dir, budget)
    # full mode restarts pack tiling at token 0 and dedups only within
    # its own slice — appending it into a warehouse that already holds
    # OTHER runs would silently corrupt both; that job is
    # curate_increment's (a replay of this run's own id stays a no-op)
    docs_t = IceLiteTable(out_dir, "curated_docs")
    prior_runs = docs_t.committed_runs() if docs_t.snapshots() else set()
    if prior_runs and run_id not in prior_runs:
        raise ValueError(
            f"warehouse {out_dir} already holds run(s) {sorted(prior_runs)}"
            " — full-mode run_curation would restart pack tiling at 0;"
            " use curate_increment for follow-on batches"
        )
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    ctes, src = _src_ctes(augment, where)
    # ONE funnel execution, in the single-pass form (funnel_tok_df —
    # one scan, no self-joins): the narrow (digests + ints, no text)
    # survivor frame is materialized once and feeds the packed table,
    # the fingerprint table, and the prefix sum's two legs. At real
    # scale stage this frame to parquet instead (packing.py docstring);
    # localCheckpoint is the single-host spelling of the same move.
    base = funnel_tok_df(
        spark, None, augment=augment, where=where, keep_fp=True
    ).localCheckpoint()
    c = blocked_prefix_sum(
        base.drop("norm_fp"), order_col="doc_id", value_col="n_tokens"
    )
    packed = c.select(
        "doc_id",
        "n_tokens",
        "n_redactions",
        "scrubbed_md5",
        F.col("start_tok").cast("long").alias("start_tok"),
        *pack_position_cols(budget),
    )
    fps = base.select("norm_fp", "doc_id")
    # the ledger is the gate-pinned SQL (the compliance artifact must
    # equal the registered query), run_id-stamped for attribution —
    # its funnel re-execution is the price of that equality
    ledger = spark.sql(
        to_spark(curation_ledger_sql(budget, augment=augment, where=where))
    ).withColumn("run_id", F.lit(run_id))
    raw_max = spark.sql(
        to_spark(f"WITH {ctes}\nSELECT max(doc_id) AS m FROM {src}")
    ).collect()[0]["m"]
    _record_raw_bound(out_dir, raw_max, run_id)  # before appends
    out: dict[str, int] = {}
    for name, df in (
        ("curated_docs", packed),
        ("curation_ledger", ledger),
        ("curated_fps", fps),
    ):
        t = IceLiteTable(out_dir, name)
        t.append(df, run_id=run_id)
        out[name] = t.read(spark).count()
    return out


def curate_increment(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    run_id: str,
    where: str,
    budget: int = PACK_BUDGET,
    augment: bool = False,
) -> dict[str, int]:
    """Day-N curation: curate a NEW batch (the ``where`` slice of the
    corpus) against the already-committed tables in ``out_dir`` and
    append the results. The steady-state shape of a 10^12-doc
    pipeline — per batch the committed corpus contributes only

      * its fingerprint table (``curated_fps``) — digests, not
        bodies — for the frozen-snapshot dedup exclusion, and
      * one column-pruned aggregate, sum(n_tokens) over
        ``curated_docs``, so packing CONTINUES at the committed token
        offset (new docs extend the pack stream instead of restarting
        it).

    Equivalence contract (pytest-pinned): if batch doc_ids are all
    greater than committed doc_ids — the natural case for append-only
    corpora — then day-1 run + day-2 increment produces EXACTLY the
    same curated_docs table as one full run over both slices: the
    min-doc_id winner rule and the doc_id packing order both compose
    across the split. The precondition is ENFORCED (ValueError when
    the batch overlaps committed ids) rather than assumed.

    Crash-rerun contract: all three appends are idempotent by run_id,
    and every derived quantity is computed from state that EXCLUDES
    this run (the committed offset comes from ledger rows with
    run_id != this one, never from curated_docs — which on a rerun
    after a partial commit would already contain this batch), so a
    rerun after any partial failure commits exactly the rows the
    uninterrupted run would have."""
    from skewer_spark.icelite import IceLiteTable

    docs_t = IceLiteTable(out_dir, "curated_docs")
    fps_t = IceLiteTable(out_dir, "curated_fps")
    led_t = IceLiteTable(out_dir, "curation_ledger")
    # precondition BEFORE _check_budget pins the budget into
    # curation_meta.json (ADVICE r4 #4): an increment needs a committed
    # corpus to curate against — on a fresh warehouse the failure used
    # to surface as read_excluding_run's FileNotFoundError after the
    # meta write side effect. (A half-committed prior run — docs but
    # no ledger — falls through to the orphaned-run check below, which
    # names the run_id to rerun.)
    if not docs_t.snapshots() and not led_t.snapshots():
        raise ValueError(
            f"increment requires a prior full run in this warehouse "
            f"({out_dir} has no committed curated_docs/curation_ledger "
            "snapshots) — run run_curation first"
        )
    _check_budget(out_dir, budget)
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )

    # cross-table consistency: every OTHER run committed in
    # curated_docs must have its ledger row — a run that crashed
    # between its docs and ledger appends left the warehouse
    # half-committed, and starting a NEW batch on top would tile new
    # tokens over the orphaned run's range (its tokens are invisible
    # to the ledger-derived offset). Rerun the crashed run_id first.
    docs_runs = docs_t.committed_runs() if docs_t.snapshots() else set()
    led_runs = led_t.committed_runs() if led_t.snapshots() else set()
    orphaned = docs_runs - led_runs - {run_id}
    if orphaned:
        raise ValueError(
            f"run(s) {sorted(orphaned)} committed curated_docs but no "
            "ledger row (crashed mid-commit) — rerun those run_ids to "
            "heal the warehouse before starting a new batch"
        )

    # ALL committed-state reads exclude this run's own snapshots
    # (rerun-safe: after a partial failure curated_docs/curated_fps
    # may already hold this batch — feeding them back would exclude
    # the whole batch as "duplicates" and double-count its tokens)
    prior_toks = int(
        led_t.read_excluding_run(spark, run_id)
        .where(F.col("stage") == "pack_sequences")
        .agg(F.coalesce(F.sum("metric"), F.lit(0)).alias("t"))
        .collect()[0]["t"]
    )
    fps_t.read_excluding_run(spark, run_id).select(
        "norm_fp"
    ).createOrReplaceTempView("corpus_fps")

    ctes, src = _src_ctes(augment, where)
    # front half only (no scrub regexes, no packing): batch size,
    # quality survivors, and the id bound for the precondition guard
    front = spark.sql(
        to_spark(
            f"WITH {ctes},\n{_kept_winners_ctes(src)}\n"
            f"SELECT CAST((SELECT count(*) FROM {src}) AS BIGINT) AS raw_n,"
            " CAST((SELECT count(*) FROM kept) AS BIGINT) AS kept_n,"
            f" CAST((SELECT min(doc_id) FROM {src}) AS BIGINT) AS min_id,"
            f" CAST((SELECT max(doc_id) FROM {src}) AS BIGINT) AS max_id"
        )
    ).collect()[0]
    if run_id not in docs_t.committed_runs() and front["raw_n"] > 0:
        # guard on the RAW id bound each committed batch covered
        # (curation_meta.json) — the curated max is not usable: a
        # prior batch whose trailing docs were all filtered out would
        # leave a hole the guard could not see. The bound EXCLUDES
        # this run's own record so a rerun after a crash between the
        # bound write and the first append passes its own guard
        # (ADVICE r4 #1). Curated max is the legacy fallback for
        # warehouses predating the meta field entirely.
        bound = _committed_bound_excluding(out_dir, run_id)
        if bound is None and "raw_bounds" not in _read_meta(out_dir):
            bound = docs_t.read(spark).agg(F.max("doc_id")).collect()[0][0]
        if bound is not None and front["min_id"] <= bound:
            raise ValueError(
                f"batch overlaps committed raw ids (batch min"
                f" {front['min_id']} <= committed bound {bound}): the"
                " min-doc_id winner rule and packing order would silently"
                " diverge from a full run — curate overlapping slices in"
                " one run instead"
            )

    # ONE full-funnel execution, materialized narrow (see run_curation)
    base = spark.sql(
        to_spark(
            f"WITH {ctes},\n{increment_ctes(src)}\n"
            "SELECT t.doc_id, t.n_tokens, t.n_redactions, t.scrubbed_md5,"
            " f.norm_fp FROM tok t JOIN fresh f ON t.doc_id = f.keep_id"
        )
    ).localCheckpoint()
    aggs = base.agg(
        F.count(F.lit(1)).cast("long").alias("surv_n"),
        F.coalesce(F.sum("n_redactions"), F.lit(0)).cast("long").alias("red_n"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long").alias("tok_n"),
    ).collect()[0]

    c = blocked_prefix_sum(
        base.drop("norm_fp"), order_col="doc_id", value_col="n_tokens"
    )
    packed = c.withColumn(
        "start_tok",
        (F.col("start_tok") + F.lit(prior_toks)).cast("long"),
    ).select(
        "doc_id",
        "n_tokens",
        "n_redactions",
        "scrubbed_md5",
        "start_tok",
        *pack_position_cols(budget),
    )
    fresh_fps = base.select("norm_fp", "doc_id")

    # batch ledger: same 4 stages; stage 2 is the incremental dedup
    # (drops = in-batch dups + vs-corpus dups); the pack stage reports
    # the NEW total pack count after this batch's tokens append
    total_packs = (prior_toks + aggs["tok_n"] + budget - 1) // budget
    from pyspark.sql import types as T

    ledger_schema = T.StructType(
        [
            T.StructField("stage_idx", T.IntegerType()),
            T.StructField("stage", T.StringType()),
            T.StructField("rows_in", T.LongType()),
            T.StructField("rows_out", T.LongType()),
            T.StructField("metric", T.LongType()),
            T.StructField("run_id", T.StringType()),
        ]
    )
    ledger = spark.createDataFrame(
        [
            (1, "quality_filter", front["raw_n"], front["kept_n"],
             front["raw_n"] - front["kept_n"], run_id),
            (2, "dedup_incremental", front["kept_n"], aggs["surv_n"],
             front["kept_n"] - aggs["surv_n"], run_id),
            (3, "pii_scrub", aggs["surv_n"], aggs["surv_n"],
             aggs["red_n"], run_id),
            (4, "pack_sequences", aggs["surv_n"], total_packs,
             aggs["tok_n"], run_id),
        ],
        schema=ledger_schema,
    )

    # bound FIRST, appends after: a crash in between leaves a bound
    # that over-refuses (safe); the reverse order could let the next
    # batch overlap this one's raw range unseen
    _record_raw_bound(out_dir, front["max_id"], run_id)
    out: dict[str, int] = {}
    for name, t, df in (
        ("curated_docs", docs_t, packed),
        ("curation_ledger", led_t, ledger),
        ("curated_fps", fps_t, fresh_fps),
    ):
        t.append(df, run_id=run_id)
        out[name] = t.read(spark).count()
    return out
