"""Gate-shaped + invariant tests for the curation capstone
(ops/curation.py): the end-to-end funnel quality filter -> normalized
dedup -> PII scrub -> token packing with its row-accounting ledger.

curation_ledger / curate_pack sit in PENDING_FIRST_WINDOW (the round-4
driver window was already saturated), so these tests run the SAME
Spark-vs-DuckDB comparison the driver gate will run next round."""
from __future__ import annotations

import duckdb
import pytest

from skewer_spark.ops import curation as CU
from skewer_spark.ops.packing import PACK_BUDGET
from skewer_spark.ops.portable import to_duck, to_spark

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    return con


@pytest.fixture(scope="module")
def ledger_rows(spark, duck):
    spark.read.parquet(f"{SF}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    got = sorted(
        map(tuple, spark.sql(to_spark(CU.curation_ledger_sql())).collect())
    )
    want = sorted(
        map(tuple, duck.execute(to_duck(CU.curation_ledger_sql())).fetchall())
    )
    assert got == want, "ledger diverges between Spark and DuckDB"
    return got


@pytest.fixture(scope="module")
def pack_rows(spark, duck):
    got = sorted(map(tuple, CU.curate_pack(spark, SF).collect()))
    want = sorted(
        map(tuple, duck.execute(to_duck(CU.curate_pack_oracle_sql())).fetchall())
    )
    assert got == want, "pack output diverges between Spark and DuckDB"
    return got


def test_ledger_matches_duckdb_and_chains(ledger_rows):
    by_idx = {r[0]: r for r in ledger_rows}
    assert [by_idx[i][1] for i in (1, 2, 3, 4)] == [
        "quality_filter", "dedup_normalized", "pii_scrub", "pack_sequences",
    ]
    # rows_out of stage N == rows_in of stage N+1: every document is
    # accounted for exactly once
    for i in (1, 2, 3):
        assert by_idx[i][3] == by_idx[i + 1][2], f"stage {i} does not chain"
    # each filtering stage actually fires on the gate corpus
    assert by_idx[1][2] > by_idx[1][3] > 0  # quality drops some
    assert by_idx[2][2] > by_idx[2][3] > 0  # dedup drops some
    assert by_idx[3][4] > 0  # scrub redacts something
    # pack stage: rows_out is the pack count for metric total tokens
    toks = by_idx[4][4]
    assert by_idx[4][3] == (toks + PACK_BUDGET - 1) // PACK_BUDGET
    # metric bookkeeping: drops attributed exactly
    assert by_idx[1][4] == by_idx[1][2] - by_idx[1][3]
    assert by_idx[2][4] == by_idx[2][2] - by_idx[2][3]


def test_pack_output_matches_duckdb_and_is_contiguous(pack_rows, ledger_rows):
    # (doc_id, n_tokens, n_redactions, scrubbed_md5, start_tok,
    #  pack_first, pack_last, offset_in_pack, packs_spanned)
    rows = sorted(pack_rows)  # doc_id order == packing order
    pos = 0
    for r in rows:
        assert r[4] == pos, f"doc {r[0]} start_tok {r[4]} != running {pos}"
        assert r[5] == r[4] // PACK_BUDGET
        assert r[6] == (r[4] + r[1] - 1) // PACK_BUDGET
        assert r[7] == r[4] % PACK_BUDGET
        assert r[8] == r[6] - r[5] + 1 >= 1
        pos += r[1]
    # totals agree with the ledger's pack stage
    by_idx = {x[0]: x for x in ledger_rows}
    assert pos == by_idx[4][4]
    assert len(rows) == by_idx[4][2]


def test_stage_semantics_on_variants(pack_rows):
    ids = {r[0] for r in pack_rows}
    by_id = {r[0]: r for r in pack_rows}
    # the case/punct-mangled variants (+300000) must NEVER survive when
    # their source did (identical normalization fingerprint, higher id)
    both = [i for i in ids if i >= 300000 and i < 600000 and i - 300000 in ids]
    assert not both, f"mangled variants survived next to sources: {both}"
    # PII variants (+600000) survive dedup (extra words change the
    # fingerprint) and each carries exactly 3 redactions (email+ip+host)
    pii = [i for i in ids if i >= 600000]
    assert pii, "no PII variant survived to the scrub stage"
    for i in pii:
        assert by_id[i][2] == 3, f"doc {i}: n_redactions {by_id[i][2]} != 3"
    # originals carry zero redactions (clean word-salad corpus)
    assert all(by_id[i][2] == 0 for i in ids if i < 300000)


def test_run_curation_commits_idempotently(spark, tmp_path):
    out = str(tmp_path / "curated")
    first = CU.run_curation(spark, SF, out, run_id="r1")
    again = CU.run_curation(spark, SF, out, run_id="r1")  # replay no-op
    assert first == again
    assert set(first) == {"curated_docs", "curation_ledger", "curated_fps"}
    assert first["curation_ledger"] == 4
    assert first["curated_docs"] > 0
    # one fingerprint per committed document (winners ARE the corpus)
    assert first["curated_fps"] == first["curated_docs"]
    from skewer_spark.icelite import IceLiteTable

    for name in first:
        assert len(IceLiteTable(out, name).snapshots()) == 1
    # the operational default curates the REAL table: no gate-fixture
    # variant ids may leak into the committed corpus
    max_id = (
        IceLiteTable(out, "curated_docs").read(spark).agg({"doc_id": "max"})
        .collect()[0][0]
    )
    assert max_id < 300000, "gate fixture variants leaked into production run"


def test_run_curation_ledger_matches_gate_sql(spark, tmp_path):
    """run_curation derives its committed ledger from the materialized
    kernel-funnel output (one tiny aggregate, no funnel re-execution);
    the compliance contract is that those derived values EQUAL the
    gate-registered curation_ledger_sql rows for the same corpus."""
    from skewer_spark.icelite import IceLiteTable

    out = str(tmp_path / "curated")
    CU.run_curation(spark, SF, out, run_id="r1", augment=True)
    committed = sorted(
        map(
            tuple,
            IceLiteTable(out, "curation_ledger")
            .read(spark)
            .drop("run_id")
            .collect(),
        )
    )
    spark.read.parquet(f"{SF}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    gate = sorted(
        map(tuple, spark.sql(to_spark(CU.curation_ledger_sql())).collect())
    )
    assert committed == gate


def _table_rows(spark, out, name):
    from skewer_spark.icelite import IceLiteTable

    return sorted(map(tuple, IceLiteTable(out, name).read(spark).collect()))


@pytest.mark.parametrize("split", [60, 250, 430])
def test_increment_equals_full_run(spark, tmp_path, split):
    # THE incremental contract: day-1 run + day-2 increment must equal
    # one full run over both slices, byte for byte — min-doc_id winner
    # selection and doc_id packing order both compose across the split
    # when batch ids exceed committed ids (append-only corpora).
    # augment=True so dedup/scrub do real cross-slice work: day-2
    # carries mangled variants (+300000) of day-1 sources that ONLY
    # the committed-fingerprint exclusion can drop. Parametrized split
    # points cover a tiny day-1, a balanced split, and a tiny day-2
    # (the pack-boundary and dedup distributions differ at each).
    full = str(tmp_path / "full")
    inc = str(tmp_path / "inc")
    CU.run_curation(spark, SF, full, run_id="all", augment=True)
    CU.run_curation(
        spark, SF, inc, run_id="day1", augment=True,
        where=f"doc_id < {split}",
    )
    res2 = CU.curate_increment(
        spark, SF, inc, run_id="day2", where=f"doc_id >= {split}",
        augment=True,
    )
    assert _table_rows(spark, inc, "curated_docs") == _table_rows(
        spark, full, "curated_docs"
    )
    assert _table_rows(spark, inc, "curated_fps") == _table_rows(
        spark, full, "curated_fps"
    )
    # cross-slice dedup actually fired: some day-2 docs were dropped
    # because their fingerprint was committed on day 1
    led = {
        (r[0], r[1]): r
        for r in _table_rows(spark, inc, "curation_ledger")
        if r[1] == "dedup_incremental"
    }
    assert led[(2, "dedup_incremental")][4] > 0, "no vs-corpus drops"
    # increment replay is a no-op
    again = CU.curate_increment(
        spark, SF, inc, run_id="day2", where=f"doc_id >= {split}",
        augment=True,
    )
    assert again == res2


def test_increment_ledger_packs_continue(spark, tmp_path):
    out = str(tmp_path / "cont")
    CU.run_curation(spark, SF, out, run_id="d1", where="doc_id < 250")
    CU.curate_increment(spark, SF, out, run_id="d2", where="doc_id >= 250")
    rows = _table_rows(spark, out, "curation_ledger")
    pack_rows = sorted(
        (r for r in rows if r[1] == "pack_sequences"), key=lambda r: r[3]
    )
    assert len(pack_rows) == 2  # one per committed run
    total_toks = pack_rows[0][4] + pack_rows[1][4]
    # day-2's reported pack count (the larger) covers the CUMULATIVE
    # token stream, not just its own batch
    assert pack_rows[1][3] == (total_toks + PACK_BUDGET - 1) // PACK_BUDGET
    # committed docs tile the cumulative stream contiguously across
    # the day boundary (packing truly continued, no restart at 0)
    docs = sorted(_table_rows(spark, out, "curated_docs"))
    pos = 0
    for r in docs:
        assert r[4] == pos
        pos += r[1]
    assert pos == total_toks


def test_curate_pack_plan_shape(spark):
    from tests.test_plans import plan_of

    plan = plan_of(CU.curate_pack(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # dedup + pack run without any Python stage
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # the funnel is materialized BEFORE the prefix sum (curate_pack
    # docstring): the sum's two legs must re-read the narrow
    # checkpointed frame, never the parquet corpus — without the cut
    # the whole scan+regex funnel executes twice (two FileScans)
    assert "FileScan" not in plan, "prefix-sum leg re-reads the corpus"


def test_single_pass_funnel_matches_macro(spark):
    """funnel_tok_df (one scan, one aggregate, quality rules evaluated
    in the Arrow funnel kernel) must produce exactly the macro
    chain's survivors — same docs, same fingerprints, same scrubbed
    hashes and token counts."""
    from skewer_spark.ops.portable import to_spark

    spark.read.parquet(f"{SF}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    ctes, src = CU._src_ctes(True, None)
    macro = spark.sql(
        to_spark(
            f"WITH {ctes},\n{CU.survivors_ctes(src)}\n"
            "SELECT t.doc_id, t.n_tokens, t.n_redactions, t.scrubbed_md5,"
            " w.norm_fp FROM tok t JOIN winners w ON t.doc_id = w.keep_id"
        )
    )
    fast = CU.funnel_tok_df(spark, SF, keep_fp=True)
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, macro.collect())
    )


def test_single_pass_funnel_plan_is_one_scan_no_joins(spark):
    """The production funnel (augment=False, so no gate-fixture union)
    must be: ONE corpus scan -> ONE Arrow stage (mapInArrow — the
    RE2/numpy row kernel; deliberate, see curation_kernel docstring)
    -> JVM md5 projection -> aggregate on the 32-byte fingerprint. No
    self-join back on doc_id (the macro form's shape), no row-at-a-time
    Python (ArrowEval/BatchEval), and the aggregate map-side combines
    (partial_ before the exchange) so only digests+ints ever shuffle."""
    from tests.test_plans import plan_of

    plan = plan_of(CU.funnel_tok_df(spark, SF, augment=False))
    assert plan.count("FileScan") == 1
    assert "Join" not in plan
    assert plan.count("MapInArrow") == 1, "expected exactly one Arrow stage"
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "partial_min_by" in plan, "dedup aggregate lost map-side combine"


# ----------------------------- macro-layer quoting regression pins
# (the curation PII literals were the first macro args containing
# commas/parens INSIDE string literals — '{2,}' used to split the
# arg list and mis-balance the paren scan)
def test_macro_args_with_commas_in_string_literals():
    from skewer_spark.ops.portable import to_duck, to_spark

    src = "RREPLACE(x, '[a-z]{2,}', 'y')"
    assert to_spark(src) == "regexp_replace(x, '[a-z]{2,}', 'y')"
    assert to_duck(src) == "regexp_replace(x, '[a-z]{2,}', 'y', 'g')"


def test_macro_args_with_parens_and_escaped_quotes_in_literals():
    from skewer_spark.ops.portable import to_duck, to_spark

    src = "RCOUNT(x, '([0-9]{1,3}[.]){3}')"
    assert to_spark(src) == "regexp_count(x, '([0-9]{1,3}[.]){3}')"
    assert to_duck(src) == "len(regexp_extract_all(x, '([0-9]{1,3}[.]){3}'))"
    # SQL-escaped quote inside a literal: '' must not desync the scan
    src2 = "RREPLACE(x, 'don''t (', 'y')"
    assert to_spark(src2) == "regexp_replace(x, 'don''t (', 'y')"


def test_macro_quoting_roundtrips_through_both_engines(spark):
    # the semantic check: the hostile literal survives translation and
    # both engines agree on the replacement result
    import duckdb

    from skewer_spark.ops.portable import to_duck, to_spark

    expr = "RREPLACE('aa,bb(cc', '[,(]{1,}', '-')"
    got = spark.sql(f"SELECT {to_spark(expr)} AS v").collect()[0]["v"]
    want = duckdb.connect().execute(f"SELECT {to_duck(expr)} AS v").fetchone()[0]
    assert got == want == "aa-bb-cc"


def test_macro_quoting_fuzz_cross_engine(spark):
    # hypothesis fuzz over hostile literal content: any mix of commas,
    # parens, braces, macro names, and doubled quotes inside a string
    # literal must survive translation UNTOUCHED on both engines (the
    # replacement string is matched verbatim via a no-op regex subject)
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from skewer_spark.ops.portable import to_duck, to_spark

    con = duckdb.connect()
    cases: list[str] = []

    @settings(max_examples=60, deadline=None)
    @given(st.text(alphabet="ab,(){}.SPLIT IDIV'%*+", min_size=0, max_size=14))
    def collect(lit):
        cases.append(lit)

    collect()
    for lit in cases:
        sql_lit = lit.replace("'", "''")  # SQL-escape for embedding
        # replacement-side: the literal must come back verbatim
        expr = f"RREPLACE('xx', 'xx', '{sql_lit}')"
        got = spark.sql(f"SELECT {to_spark(expr)} AS v").collect()[0]["v"]
        want = con.execute(f"SELECT {to_duck(expr)} AS v").fetchone()[0]
        assert got == want == lit, f"literal mangled: {lit!r} -> {got!r}/{want!r}"


def test_rreplace_rejects_divergent_replacement_literals():
    # '$' and backslash mean different things in Java-regex vs RE2
    # replacements — the macro must refuse them loudly, per engine
    with pytest.raises(ValueError, match="diverge"):
        to_spark("RREPLACE(x, 'a', '<USD$>')")
    with pytest.raises(ValueError, match="diverge"):
        to_duck("RREPLACE(x, 'a', '$1')")
    # '$' in the PATTERN (end anchor) stays legal
    assert "regexp_replace" in to_spark("RREPLACE(x, 'a$', 'b')")


def test_increment_guards_budget_and_overlap(spark, tmp_path):
    out = str(tmp_path / "guards")
    CU.run_curation(spark, SF, out, run_id="d1", where="doc_id < 250")
    # a different pack budget would tile inconsistent pack columns
    with pytest.raises(ValueError, match="budget"):
        CU.curate_increment(
            spark, SF, out, run_id="d2", where="doc_id >= 250", budget=1024
        )
    # an overlapping batch slice violates the equivalence precondition
    with pytest.raises(ValueError, match="overlaps committed"):
        CU.curate_increment(
            spark, SF, out, run_id="d2", where="doc_id >= 200"
        )


def test_increment_rerun_after_partial_commit_is_exact(spark, tmp_path):
    # crash simulation: day-2 commits curated_docs and curated_fps but
    # the ledger append is lost. The rerun must commit the SAME ledger
    # row the uninterrupted run would have — i.e. prior tokens must
    # come from ledger rows of OTHER runs, never from curated_docs
    # (which already holds day-2's rows on the rerun).
    from skewer_spark.icelite import IceLiteTable

    out = str(tmp_path / "crash")
    CU.run_curation(spark, SF, out, run_id="d1", where="doc_id < 250")
    CU.curate_increment(spark, SF, out, run_id="d2", where="doc_id >= 250")
    led_t = IceLiteTable(out, "curation_ledger")
    want = sorted(map(tuple, led_t.read(spark).collect()))
    # lose the day-2 ledger snapshot (manifest surgery = the crash)
    import shutil

    keep, dropped = [], []
    for s in led_t._read_manifest():
        (keep if s["run_id"] != "d2" else dropped).append(s)
    led_t._commit_manifest(keep)
    for s in dropped:
        shutil.rmtree(f"{led_t.dir}/data/{s['snapshot_id']}", ignore_errors=True)
    assert len(led_t.read(spark).collect()) == 4  # only day-1 rows left
    CU.curate_increment(spark, SF, out, run_id="d2", where="doc_id >= 250")
    got = sorted(map(tuple, led_t.read(spark).collect()))
    assert got == want, "rerun after partial commit rewrote a different ledger"


def test_full_mode_refuses_nonempty_warehouse(spark, tmp_path):
    out = str(tmp_path / "fullguard")
    CU.run_curation(spark, SF, out, run_id="d1", where="doc_id < 250")
    # a forgotten --increment must not restart pack tiling at 0
    with pytest.raises(ValueError, match="full-mode"):
        CU.run_curation(spark, SF, out, run_id="d2", where="doc_id >= 250")
    # replaying the SAME run_id stays a legal no-op
    CU.run_curation(spark, SF, out, run_id="d1", where="doc_id < 250")


def test_overlap_guard_uses_raw_bound_not_curated_max(spark, tmp_path):
    # doc 14 fails the quality filter at sf0.001, so a day-1 slice
    # ending at 14 commits curated max 13 — the curated-max guard
    # would wave an overlapping 'doc_id >= 14' batch through; the
    # RAW bound (curation_meta.json) must refuse it
    out = str(tmp_path / "rawbound")
    CU.run_curation(spark, SF, out, run_id="d1", where="doc_id <= 14")
    from skewer_spark.icelite import IceLiteTable

    max_curated = (
        IceLiteTable(out, "curated_docs").read(spark)
        .agg({"doc_id": "max"}).collect()[0][0]
    )
    assert max_curated < 14  # the scenario premise: trailing doc dropped
    with pytest.raises(ValueError, match="overlaps committed raw ids"):
        CU.curate_increment(
            spark, SF, out, run_id="d2", where="doc_id >= 14"
        )
    # the non-overlapping continuation is accepted
    CU.curate_increment(spark, SF, out, run_id="d2", where="doc_id >= 15")


def test_increment_refuses_orphaned_half_committed_run(spark, tmp_path):
    # a run that committed curated_docs but lost its ledger append
    # makes its tokens invisible to the ledger-derived offset; a NEW
    # batch must refuse until the crashed run is rerun
    from skewer_spark.icelite import IceLiteTable

    out = str(tmp_path / "orphan")
    CU.run_curation(spark, SF, out, run_id="d1", where="doc_id < 200")
    CU.curate_increment(spark, SF, out, run_id="d2", where="doc_id >= 200 AND doc_id < 400")
    led_t = IceLiteTable(out, "curation_ledger")
    import shutil

    keep = [s for s in led_t._read_manifest() if s["run_id"] != "d2"]
    led_t._commit_manifest(keep)
    with pytest.raises(ValueError, match="crashed mid-commit"):
        CU.curate_increment(spark, SF, out, run_id="d3", where="doc_id >= 400")
    # healing path: rerun the crashed run, then d3 proceeds
    CU.curate_increment(spark, SF, out, run_id="d2", where="doc_id >= 200 AND doc_id < 400")
    CU.curate_increment(spark, SF, out, run_id="d3", where="doc_id >= 400")


def test_read_excluding_run_preserves_schema_and_refuses_compacted(spark, tmp_path):
    from pyspark.sql import Row

    from skewer_spark.icelite import IceLiteTable

    t = IceLiteTable(str(tmp_path), "tbl")
    t.append(spark.createDataFrame([Row(a=1, b="x")]), run_id="r1")
    # excluding the only run still yields the TABLE schema, empty
    df = t.read_excluding_run(spark, "r1")
    assert df.columns == ["a", "b"] and df.count() == 0
    # post-compaction the run's rows cannot be separated — refuse
    assert t.compact(spark, min_files=1) is not None
    with pytest.raises(ValueError, match="absorbed"):
        t.read_excluding_run(spark, "r1")


def test_increment_rerun_after_bound_write_crash(spark, tmp_path):
    # ADVICE r4 #1: a crash between the raw-bound write and the first
    # table append must not brick the SAME run_id's rerun — the guard
    # compares against bounds recorded by OTHER runs only
    out = str(tmp_path / "boundcrash")
    ctrl = str(tmp_path / "boundctrl")
    from skewer_spark.icelite import IceLiteTable

    for w in (out, ctrl):
        CU.run_curation(spark, SF, w, run_id="d1", where="doc_id < 250")
    # simulate d2 crashing right after its bound write: the bound is
    # in curation_meta.json but no table holds a d2 row
    CU._record_raw_bound(out, 499, "d2")
    assert not IceLiteTable(out, "curated_docs").committed_runs() - {"d1"}
    got = CU.curate_increment(
        spark, SF, out, run_id="d2", where="doc_id >= 250 AND doc_id < 500"
    )
    want = CU.curate_increment(
        spark, SF, ctrl, run_id="d2", where="doc_id >= 250 AND doc_id < 500"
    )
    assert got == want
    a = sorted(map(tuple, IceLiteTable(out, "curated_docs").read(spark).collect()))
    b = sorted(map(tuple, IceLiteTable(ctrl, "curated_docs").read(spark).collect()))
    assert a == b, "rerun after bound-write crash diverged from clean run"
    # a DIFFERENT run overlapping d2's recorded range is still refused
    with pytest.raises(ValueError, match="overlaps committed raw ids"):
        CU.curate_increment(spark, SF, out, run_id="d3", where="doc_id >= 400")


def test_increment_fresh_warehouse_precondition(spark, tmp_path):
    # ADVICE r4 #4: a clear error BEFORE any meta side effect
    import os

    out = str(tmp_path / "fresh")
    with pytest.raises(ValueError, match="prior full run"):
        CU.curate_increment(spark, SF, out, run_id="d1", where="doc_id >= 0")
    assert not os.path.exists(CU._meta_path(out)), (
        "failed precondition must not pin a budget into curation_meta.json"
    )


def test_legacy_warehouse_guard_survives_own_bound_write_crash(spark, tmp_path):
    # the two prior scenarios composed: a warehouse whose committed run
    # predates raw bounds entirely (meta holds NEITHER max_raw_id NOR
    # raw_bounds), where the first attempt of a new run writes its own
    # bound then crashes before any append. The rerun must still refuse
    # an overlap with the LEGACY committed range — the run's own
    # raw_bounds entry must not switch off the curated-max fallback.
    out = str(tmp_path / "legacycrash")
    CU.run_curation(spark, SF, out, run_id="d1", where="doc_id < 250")
    meta = CU._read_meta(out)
    CU._write_meta(out, {"budget": meta["budget"]})  # pre-bound warehouse
    # d2's first attempt: bound recorded, crash before the first append
    CU._record_raw_bound(out, 499, "d2")
    assert set(CU._read_meta(out)["raw_bounds"]) == {"d2"}
    # rerun of d2 with a slice overlapping d1's committed docs: refused
    with pytest.raises(ValueError, match="overlaps committed raw ids"):
        CU.curate_increment(spark, SF, out, run_id="d2", where="doc_id >= 200")
    # a clean rerun of d2 on the correct disjoint slice still works
    CU.curate_increment(
        spark, SF, out, run_id="d2", where="doc_id >= 250 AND doc_id < 500"
    )


def test_raw_bound_legacy_meta_migration(spark, tmp_path):
    # a warehouse written before per-run bound attribution (meta holds
    # only the unattributed max_raw_id) must keep refusing overlaps
    # with its legacy range after a new-code run migrates the meta
    out = str(tmp_path / "legacy")
    CU.run_curation(spark, SF, out, run_id="d1", where="doc_id < 250")
    meta = CU._read_meta(out)
    legacy_max = meta["raw_bounds"]["d1"]
    CU._write_meta(out, {"budget": meta["budget"], "max_raw_id": legacy_max})
    # new-code increment over a fresh slice migrates raw_bounds...
    CU.curate_increment(spark, SF, out, run_id="d2", where="doc_id >= 250 AND doc_id < 400")
    assert CU._read_meta(out)["raw_bounds"]["__legacy__"] == legacy_max
    # ...and a batch overlapping the LEGACY range is still refused
    with pytest.raises(ValueError, match="overlaps committed raw ids"):
        CU.curate_increment(spark, SF, out, run_id="d3", where="doc_id >= 200")


# ------------------------- ledger-invariant property fuzz (VERDICT r4 #7)
# The chain contract (stage N rows_out == stage N+1 rows_in; every drop
# attributed to exactly one stage) and the pack-contiguity contract were
# pinned on fixtures; here hypothesis generates hostile corpora — empty
# corpora, 0-word and whitespace docs, unicode/quote words, PII tokens,
# all-duplicate slices, slices where every stage drops to zero — and the
# invariants are asserted structurally. The fuzz engine is DuckDB (the
# macro-SQL text is identical cross-engine BY CONSTRUCTION of
# ops/portable and that equality is driver-gate-pinned at sf0.01;
# per-example Spark jobs would make 200 examples minutes-slow), plus a
# canned hostile-corpus Spark==DuckDB parity test below.

_FUZZ_WORDS = [
    "the", "and", "alpha", "beta", "gamma", "delta", "zzz",
    "user7@example.com", "10.0.0.1", "host-42",          # PII: all three
    "Alpha,", "ALPHA", "naïve", "x'y", "!!!", "",        # case/punct/quote
]
_FUZZ_BUDGET = 7  # tiny so docs span packs constantly


def _fuzz_run(corpus):
    import duckdb as _duck

    con = _duck.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, lang VARCHAR, text VARCHAR)")
    if corpus:
        con.executemany("INSERT INTO documents VALUES (?, ?, ?)", corpus)
    led = con.execute(
        to_duck(CU.curation_ledger_sql(budget=_FUZZ_BUDGET, augment=False))
    ).df()
    pack = con.execute(
        to_duck(CU.curate_pack_oracle_sql(budget=_FUZZ_BUDGET, augment=False))
    ).df()
    con.close()
    return led, pack


def _assert_funnel_invariants(corpus, led, pack):
    b = _FUZZ_BUDGET
    led = led.sort_values("stage_idx").reset_index(drop=True)
    assert list(led["stage"]) == [
        "quality_filter", "dedup_normalized", "pii_scrub", "pack_sequences"
    ]
    # chain: stage N rows_out == stage N+1 rows_in
    assert led["rows_in"][0] == len(corpus)
    for i in range(3):
        assert led["rows_out"][i] == led["rows_in"][i + 1], (i, led)
    # every drop attributed exactly once (scrub and pack drop nothing)
    assert led["metric"][0] == led["rows_in"][0] - led["rows_out"][0]
    assert led["metric"][1] == led["rows_in"][1] - led["rows_out"][1]
    assert led["rows_out"][2] == led["rows_in"][2]
    assert (
        led["rows_in"][0] - led["rows_out"][2]
        == led["metric"][0] + led["metric"][1]
    )
    # pack stage: rows_out == ceil(total_tokens / budget)
    toks = int(led["metric"][3])
    assert led["rows_out"][3] == (toks + b - 1) // b
    # pack table: one row per survivor, contiguous token tiling
    assert len(pack) == led["rows_in"][3]
    p = pack.sort_values("doc_id").reset_index(drop=True)
    expect_start = 0
    for r in p.itertuples():
        assert r.n_tokens >= 1
        assert r.start_tok == expect_start, "token tiling has a gap/overlap"
        expect_start += r.n_tokens
        end = r.start_tok + r.n_tokens - 1
        assert r.pack_first == r.start_tok // b
        assert r.pack_last == end // b
        assert r.offset_in_pack == r.start_tok % b
        assert r.packs_spanned == r.pack_last - r.pack_first + 1
    assert expect_start == toks, "pack tokens != ledger token metric"


def test_ledger_invariants_fuzz():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    texts = st.lists(
        st.sampled_from(_FUZZ_WORDS), min_size=0, max_size=15
    ).map(" ".join)

    @st.composite
    def corpora(draw):
        base = draw(st.lists(texts, min_size=0, max_size=20))
        docs = list(base)
        # duplicate amplification: verbatim copies and the gate's
        # case/punct mangle (same normalization-fingerprint family)
        for t in base:
            mode = draw(st.integers(0, 3))
            if mode == 1:
                docs.append(t)
            elif mode == 2:
                docs.append(t.upper() + " !!!")
        return [
            (i, draw(st.sampled_from(["en", "de", "xx"])), t)
            for i, t in enumerate(docs)
        ]

    @settings(max_examples=220, deadline=None)
    @given(corpora())
    def run(corpus):
        led, pack = _fuzz_run(corpus)
        _assert_funnel_invariants(corpus, led, pack)

    run()


# --------------- Arrow kernel vs macro-SQL semantics fuzz (round 5)
# The funnel's row stage moved to an Arrow/RE2 kernel
# (curation_kernel.py); its contract is byte-identical outputs to the
# macro SQL. The fixture-corpus equality test covers the gate data;
# here the kernel itself (a pure pyarrow function — no Spark job
# needed) is fuzzed per-example against the macro chain running on
# DuckDB, over hostile vocabularies the gate corpus never produces:
# tabs/newlines inside and at the edges of words (trim() strips ONLY
# spaces), multi-byte unicode (the byte-vs-char replacement question),
# NULL texts, empty strings, PII tokens, duplicate families.

_KERNEL_FUZZ_WORDS = _FUZZ_WORDS + [
    "tab\there", "end\t", "\tstart", "new\nline", "café", "ß",
    "İstanbul", "🙂", "𝕏y", "a,,b", "''", ",",
]


def _kernel_vs_macro_duck(corpus):
    """corpus: list of (doc_id, lang, text) with text possibly None.
    Returns (kernel_rows, macro_rows) — the funnel survivor table
    (doc_id, n_tokens, n_redactions, scrubbed_md5, norm_fp, fp_rows)
    computed (a) by curation_kernel.funnel_batch + the dedup aggregate
    restated in DuckDB over the kernel's output, and (b) by the macro
    CTE chain entirely in DuckDB."""
    import duckdb as _duck
    import pyarrow as pa

    from skewer_spark.ops import curation_kernel as K

    con = _duck.connect()
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array([c[0] for c in corpus], type=pa.int64()),
            pa.array([c[1] for c in corpus], type=pa.string()),
            pa.array([c[2] for c in corpus], type=pa.string()),
        ],
        schema=pa.schema(
            [("doc_id", pa.int64()), ("lang", pa.string()),
             ("text", pa.string())]
        ),
    )
    kout = pa.Table.from_batches(
        [K.funnel_batch(batch)], schema=K.FUNNEL_SCHEMA
    )
    con.register("k", kout)
    kernel_rows = sorted(map(tuple, con.execute(
        """WITH h AS (
  SELECT doc_id, md5(norm_text) AS norm_fp, md5(scrub_text) AS s_md5,
         n_redactions, n_tokens FROM k
)
SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
       arg_min(n_tokens, doc_id) AS n_tokens,
       arg_min(n_redactions, doc_id) AS n_redactions,
       arg_min(s_md5, doc_id) AS scrubbed_md5,
       norm_fp, CAST(count(*) AS BIGINT) AS fp_rows
FROM h GROUP BY norm_fp"""
    ).fetchall()))
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, lang VARCHAR, text VARCHAR)"
    )
    if corpus:
        con.executemany("INSERT INTO documents VALUES (?, ?, ?)", corpus)
    macro_rows = sorted(map(tuple, con.execute(to_duck(
        f"""WITH {CU.real_docs_cte()},
{CU.survivors_ctes()},
w2 AS (
  SELECT norm_fp, CAST(min(doc_id) AS BIGINT) AS keep_id,
         CAST(count(*) AS BIGINT) AS fp_rows
  FROM normed GROUP BY norm_fp
)
SELECT t.doc_id, t.n_tokens, t.n_redactions, t.scrubbed_md5,
       w.norm_fp, w.fp_rows
FROM tok t JOIN w2 w ON t.doc_id = w.keep_id"""
    )).fetchall()))
    con.close()
    return kernel_rows, macro_rows


def test_kernel_semantics_fuzz_vs_macro():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    texts = st.one_of(
        st.none(),
        st.lists(
            st.sampled_from(_KERNEL_FUZZ_WORDS), min_size=0, max_size=12
        ).map(" ".join),
    )

    @st.composite
    def corpora(draw):
        base = draw(st.lists(texts, min_size=0, max_size=16))
        docs = list(base)
        for t in base:
            if t is not None and draw(st.booleans()):
                docs.append(t.upper() + " !!!")  # dup family
        return [
            (i, draw(st.sampled_from(["en", "de", "xx"])), t)
            for i, t in enumerate(docs)
        ]

    @settings(max_examples=250, deadline=None)
    @given(corpora())
    def run(corpus):
        got, want = _kernel_vs_macro_duck(corpus)
        assert got == want, f"kernel diverges from macro on {corpus!r}"

    run()


def test_kernel_handles_large_string_and_sliced_arrays():
    """Layout robustness: under
    spark.sql.execution.arrow.useLargeVarTypes mapInArrow delivers
    large_string columns (64-bit offsets); the byte-level normalize
    fast path reads int32 offsets and would produce silently
    misaligned strings if it ever saw one. funnel_batch must fold the
    layout (or fall back to the RE2 form) and return outputs identical
    to the plain-utf8 batch; sliced arrays take the RE2 fallback."""
    import pyarrow as pa

    from skewer_spark.ops import curation_kernel as K

    corpus = [
        (0, "en", "Hello, World! the and of to in is it for on"),
        (1, "en", "a  b   c the and of to in is it for on extra"),
        (2, "en", None),
        (3, "de", "café ß one two three four five six seven eight"),
        (4, "en", "user7@example.com 10.0.0.1 host-42 the and of to in"),
    ]
    ids = pa.array([c[0] for c in corpus], type=pa.int64())
    langs = pa.array([c[1] for c in corpus])
    texts = [c[2] for c in corpus]
    schema_s = pa.schema(
        [("doc_id", pa.int64()), ("lang", pa.string()),
         ("text", pa.string())]
    )
    schema_l = pa.schema(
        [("doc_id", pa.int64()), ("lang", pa.string()),
         ("text", pa.large_string())]
    )
    plain = K.funnel_batch(pa.RecordBatch.from_arrays(
        [ids, langs, pa.array(texts, type=pa.string())], schema=schema_s
    ))
    large = K.funnel_batch(pa.RecordBatch.from_arrays(
        [ids, langs, pa.array(texts, type=pa.large_string())],
        schema=schema_l,
    ))
    assert large.schema == K.FUNNEL_SCHEMA
    assert large.to_pydict() == plain.to_pydict()
    # sliced (offset != 0) string array through _normalize directly
    arr = pa.array(texts, type=pa.string())
    sliced = arr.slice(1)
    assert sliced.offset == 1
    got = K._normalize(sliced).to_pylist()
    want = K._normalize(pa.array(texts[1:], type=pa.string())).to_pylist()
    assert got == want


def test_kernel_matches_spark_macro_on_hostile_rows(spark):
    """Same hostile families, cross-checked against the SPARK macro
    (funnel_over vs survivors_ctes on Spark itself): nulls, tabs at
    word edges, multi-byte unicode, PII, all-dup, empty corpus."""
    corpus = [
        (0, "en", None),
        (1, "en", ""),
        (2, "en", "end\t \tstart tab\there new\nline café ß İstanbul"),
        (3, "en", "🙂 𝕏y a,,b '' , the and of to in is"),
        (4, "en", "the and user7@example.com 10.0.0.1 host-42 x'y naïve"),
        (5, "de", "alpha beta gamma delta zzz the alpha beta gamma"),
        (6, "de", "ALPHA BETA GAMMA DELTA ZZZ THE ALPHA BETA GAMMA !!!"),
        (7, "en", "the the the the the the"),
    ]
    sdf = spark.createDataFrame(corpus, "doc_id long, lang string, text string")
    sdf.createOrReplaceTempView("documents")
    got = sorted(
        map(
            tuple,
            CU.funnel_over(
                sdf, keep_fp=True, with_counts=True
            ).collect(),
        )
    )
    want = sorted(map(tuple, spark.sql(to_spark(
        f"""WITH {CU.real_docs_cte()},
{CU.survivors_ctes()},
w2 AS (
  SELECT norm_fp, CAST(min(doc_id) AS BIGINT) AS keep_id,
         CAST(count(*) AS BIGINT) AS fp_rows
  FROM normed GROUP BY norm_fp
)
SELECT t.doc_id, t.n_tokens, t.n_redactions, t.scrubbed_md5,
       w.fp_rows, w.norm_fp
FROM tok t JOIN w2 w ON t.doc_id = w.keep_id"""
    )).collect()))
    assert got == want


def test_funnel_hostile_corpus_matches_duckdb(spark):
    # the canned hard cases from the fuzz family, run CROSS-ENGINE:
    # Spark and DuckDB must agree row-for-row on ledger AND pack
    cases = [
        [],                                                  # empty corpus
        [(0, "en", ""), (1, "en", "   "), (2, "xx", "!!!")],  # all filtered
        [(i, "en", "the and alpha beta gamma zzz") for i in range(6)]
        + [(9, "en", "THE AND ALPHA BETA GAMMA ZZZ !!!")],   # all-dup slice
        [(0, "en", "the and user7@example.com 10.0.0.1 host-42 x'y naïve"),
         (1, "de", "alpha beta gamma delta zzz the"),
         (2, "en", "the the the the the the")],              # PII + repetitive
    ]
    for corpus in cases:
        sdf = spark.createDataFrame(
            corpus or [(0, "en", "x")],
            "doc_id long, lang string, text string",
        )
        if not corpus:
            sdf = sdf.where("doc_id < 0")
        sdf.createOrReplaceTempView("documents")
        got_led = sorted(map(tuple, spark.sql(
            to_spark(CU.curation_ledger_sql(budget=_FUZZ_BUDGET, augment=False))
        ).collect()))
        got_pack = sorted(map(tuple, spark.sql(
            to_spark(CU.curate_pack_oracle_sql(budget=_FUZZ_BUDGET, augment=False))
        ).collect()))
        led, pack = _fuzz_run(corpus)
        want_led = sorted(map(tuple, led.itertuples(index=False, name=None)))
        want_pack = sorted(map(tuple, pack.itertuples(index=False, name=None)))
        assert got_led == want_led, f"ledger diverges on {corpus!r}"
        assert got_pack == want_pack, f"pack diverges on {corpus!r}"
        _assert_funnel_invariants(corpus, led, pack)
