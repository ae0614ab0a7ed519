"""Registered vectorized filter hooks (routing/filter_hooks.py): the
arbitrary-logic FilterMessage escape hatch (vm.go:399-442), mirroring
the parser registry on the routing side. Pins: tri-state preserved,
mutation-on-PASS-only (dropped/rejected rows keep original bytes —
the twin of test_route_mutation_is_per_rule_and_pass_only), RouteRule
integration, and loud failure on unknown hook names."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from skewer_spark.routing import filter_hooks as FH
from skewer_spark.routing.rules import RouteRule, route_fanout

ROWS = [
    # appname app1: 4 clean rows -> first 3 pass, 4th dropped
    ("c1", 0, "app1", "msg 111 one", False),
    ("c1", 1, "app1", "msg 222 two", False),
    ("c2", 0, "app1", "msg 333 three", False),
    ("c2", 1, "app1", "msg 444 four", False),
    # appname app2: an error row INSIDE the first-K window consumes a
    # slot but is rejected; 2 clean rows pass
    ("c3", 0, "app2", "bad 555", True),
    ("c3", 1, "app2", "ok 666", False),
    ("c3", 2, "app2", "ok 777", False),
]
SCHEMA = "conv_id string, turn_idx int, appname string, message string, parse_error boolean"


def _hooked(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    return FH.apply_filter_hook(df, "rate_limit_mask").collect()


def test_tristate_and_pass_only_mutation(spark):
    got = {(r["conv_id"], r["turn_idx"]): r for r in _hooked(spark)}
    st = {k: v["hook_status_rate_limit_mask"] for k, v in got.items()}
    assert st == {
        ("c1", 0): "passing", ("c1", 1): "passing", ("c2", 0): "passing",
        ("c2", 1): "dropped",                      # rate limit K=3
        ("c3", 0): "rejected",                     # parse_error wins
        ("c3", 1): "passing", ("c3", 2): "passing",
    }
    for k, r in got.items():
        # original column NEVER mutated, for any status
        orig = dict(((c, t), m) for c, t, _, m, _ in
                    [(a, b, c, d, e) for a, b, c, d, e in ROWS])[k]
        assert r["message"] == orig
        mutated = r["hook_rate_limit_mask_message"]
        if r["hook_status_rate_limit_mask"] == "passing":
            assert "#" in mutated and not any(ch.isdigit() for ch in mutated)
        else:
            assert mutated == orig  # dropped/rejected untouched


def test_route_rule_filter_hook_integration(spark):
    # a RouteRule selecting the hook must route ONLY hook-passing rows
    # and forward the hook's rewritten message; a hook-free rule on the
    # same frame still sees original bytes
    df = spark.createDataFrame(ROWS, SCHEMA)
    rules = (
        RouteRule("sink_limited", "'limited'", "TRUE",
                  partition_key_expr="'pk'",
                  filter_hook="rate_limit_mask"),
        RouteRule("sink_all", "'everything'", "TRUE",
                  partition_key_expr="'pk'"),
    )
    routed = route_fanout(FH.apply_hooks_for_rules(df, rules), rules)
    rows = routed.collect()
    limited = [r for r in rows if r["sink"] == "sink_limited"]
    everything = [r for r in rows if r["sink"] == "sink_all"]
    assert len(limited) == 5 and len(everything) == len(ROWS)
    assert all("#" in r["message"] for r in limited)
    orig_msgs = {m for _, _, _, m, _ in ROWS}
    assert all(r["message"] in orig_msgs for r in everything)


def test_narrow_hook_preserves_rows(spark):
    # rate_limit_mask declares key_cols -> the NARROW path: only
    # key+group+reads+mutates round-trip through Python and the verdict
    # joins back on (conv_id, turn_idx). The join-back must preserve
    # every input row exactly once and keep the full original width.
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = FH.apply_filter_hook(df, "rate_limit_mask")
    assert set(SCHEMA.replace(",", " ").split()[::2]) <= set(out.columns)
    rows = out.collect()
    keys = [(r["conv_id"], r["turn_idx"]) for r in rows]
    assert sorted(keys) == sorted((c, t) for c, t, *_ in ROWS)
    # full-width passthrough: every original column keeps its bytes
    orig = {(c, t): (a, m, e) for c, t, a, m, e in ROWS}
    for r in rows:
        a, m, e = orig[(r["conv_id"], r["turn_idx"])]
        assert (r["appname"], r["message"], r["parse_error"]) == (a, m, e)


def test_narrow_hook_keeps_null_key_rows(spark):
    # the verdict join-back must be NULL-SAFE: a row with a NULL key
    # component still gets its verdict instead of vanishing (the
    # module contract says rows are never swallowed)
    rows = ROWS + [(None, 9, "app9", "null conv 999", False)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = FH.apply_filter_hook(df, "rate_limit_mask").collect()
    assert len(got) == len(rows)
    nullrow = [r for r in got if r["conv_id"] is None]
    assert len(nullrow) == 1
    assert nullrow[0]["hook_status_rate_limit_mask"] == "passing"
    assert nullrow[0]["hook_rate_limit_mask_message"] == "null conv #"


def test_narrow_hook_validate_keys_catches_nullsafe_duplicates(spark):
    # the null-safe join treats (NULL, 9) == (NULL, 9): two such rows
    # would cross-match and multiply. validate_keys=True fails fast on
    # keys that are non-unique under null-safe equality; unique frames
    # (including a single NULL-keyed row) pass validation unchanged.
    dup = ROWS + [(None, 9, "app9", "x 1", False),
                  (None, 9, "app9", "y 2", False)]
    df = spark.createDataFrame(dup, SCHEMA)
    with pytest.raises(ValueError, match="not unique"):
        FH.apply_filter_hook(df, "rate_limit_mask", validate_keys=True)
    ok = spark.createDataFrame(
        ROWS + [(None, 9, "app9", "x 1", False)], SCHEMA
    )
    got = FH.apply_filter_hook(ok, "rate_limit_mask", validate_keys=True)
    assert got.count() == len(ROWS) + 1


def test_wide_hook_without_key_cols(spark):
    # a hook with NO key_cols takes the wide path (whole frame through
    # the kernel, no join) — the original behavior must keep working
    FH.register_filter_hook(FH.FilterHook(
        name="_wide_evens",
        kernel=lambda pdf: pdf.assign(
            route_status=pd.Series(
                ["passing" if t % 2 == 0 else "dropped" for t in pdf["turn_idx"]],
                index=pdf.index,
            )
        ),
    ))
    df = spark.createDataFrame(ROWS, SCHEMA)
    rows = FH.apply_filter_hook(df, "_wide_evens").collect()
    assert len(rows) == len(ROWS)
    for r in rows:
        want = "passing" if r["turn_idx"] % 2 == 0 else "dropped"
        assert r["hook_status__wide_evens"] == want
        assert r["message"]  # full width preserved


def test_unknown_hook_raises(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(KeyError, match="unknown filter hook"):
        FH.apply_filter_hook(df, "no_such_hook")


def test_kernel_row_count_contract(spark):
    # kernels classify rows; adding/swallowing rows is an error
    FH.register_filter_hook(FH.FilterHook(
        name="_bad_swallow",
        kernel=lambda pdf: pdf.head(0).assign(route_status=pd.Series(dtype=object)),
        group_cols=("appname",),
    ))
    df = spark.createDataFrame(ROWS, SCHEMA)
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises((PythonException, Py4JJavaError)):
        FH.apply_filter_hook(df, "_bad_swallow").collect()


def test_approx_percentiles_within_rank_tolerance(spark, sf_dir):
    # VERDICT r2 #3: the production approx_percentile twin must land
    # inside the exact ±1 rank-percent window for every event type
    from skewer_spark.queries import build_queries

    rows = build_queries()["value_percentiles_approx"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["p50_in_rank_tol"] and r["p95_in_rank_tol"] and r["p99_in_rank_tol"], r


def test_pipeline_runs_hooked_rules_end_to_end(spark, sf_dir, tmp_path):
    # Pipeline.run applies the hook stage automatically when a rule
    # names one: the hooked sink gets only hook-passing rows with the
    # rewritten message; a plain sink on the same run sees all passing
    # rows with original bytes
    from skewer_spark.pipeline import Pipeline
    from skewer_spark.queries import load_transcripts

    rules = (
        RouteRule("sink_limited", "'limited'", "TRUE",
                  filter_hook="rate_limit_mask"),
        RouteRule("sink_default", "'default-topic'", "TRUE"),
    )
    tr = load_transcripts(spark, sf_dir)
    pipe = Pipeline(spark, str(tmp_path / "wh"), rules=rules)
    res = pipe.run(tr, run_id="hooked")
    assert res.sink_rows["sink_default"] > res.sink_rows["sink_limited"] > 0
    lim = pipe.table("sink_limited").read(spark)
    n_appnames = lim.select("appname").distinct().count()
    # rate limit: at most K=3 rows per appname reach the hooked sink
    assert res.sink_rows["sink_limited"] <= 3 * n_appnames
    masked = lim.where(F.col("message").rlike("[0-9]")).count()
    assert masked == 0  # digit runs rewritten on every routed row


def test_grouped_hook_hot_group_salting(spark):
    # the grouped-hook skew hazard: group_cols on a hot key (here one
    # appname holding 50% of all rows) funnels that whole group into
    # ONE applyInPandas task. A kernel whose statefulness unit is
    # finer than the group (per-conv counters) declares
    # salt_within_group and the wrapper bounds per-task input by
    # spreading the hot group over salt_buckets tasks while keeping
    # every conv whole — verdicts must equal the unsalted run's
    # exactly, and the measured max kernel-batch size must be a small
    # fraction of the hot group.
    import numpy as np

    n, hot_share = 20000, 0.5
    n_hot = int(n * hot_share)
    rows = []
    for i in range(n_hot):  # hot appname: 200 convs x 50 turns
        rows.append(("hot", f"h{i % 200}", i // 200, 0))
    for i in range(n - n_hot):  # the rest: 50 cold appnames
        rows.append((f"app{i % 50}", f"c{i % 500}", i // 500, 0))
    df = spark.createDataFrame(
        rows, "appname string, conv_id string, turn_idx long, batch_rows long"
    ).repartition(32)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        # per-conv running index: passes the first 2 turns of each
        # conv — stateful WITHIN conv, never across convs, so the
        # hook is salt-splittable by conv_id
        pdf = pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        rn = pdf.groupby("conv_id").cumcount()
        pdf["route_status"] = np.where(rn < 2, "passing", "dropped")
        pdf["batch_rows"] = len(pdf)  # measurement: kernel input size
        return pdf

    common = dict(
        kernel=kernel,
        mutates=("batch_rows",),
        group_cols=("appname",),
        reads=("conv_id", "turn_idx"),
    )
    FH.register_filter_hook(FH.FilterHook(name="_conv_cap_flat", **common))
    FH.register_filter_hook(
        FH.FilterHook(
            name="_conv_cap_salted",
            salt_within_group="conv_id",
            salt_buckets=16,
            **common,
        )
    )
    key = ("appname", "conv_id", "turn_idx")

    def run(name):
        out = FH.apply_filter_hook(df, name).select(
            *key, FH.status_col(name), FH.mutated_col(name, "batch_rows")
        ).collect()
        verdicts = {tuple(r[k] for k in key): r[FH.status_col(name)]
                    for r in out}
        batch = max(
            r[FH.mutated_col(name, "batch_rows")] for r in out
            if r[FH.status_col(name)] == "passing"
        )
        return verdicts, batch

    flat_v, flat_max = run("_conv_cap_flat")
    salt_v, salt_max = run("_conv_cap_salted")
    assert salt_v == flat_v  # salting never changes a verdict
    assert len(flat_v) == n
    # unsalted: the hot group is one task's input — the documented cap
    assert flat_max == n_hot
    # salted: bounded per-task input. 200 convs over 16 hash buckets
    # -> ~12.5 convs (~625 rows) per task; allow generous imbalance
    # but demand a real bound (< a quarter of the hot group)
    assert salt_max <= n_hot // 4, salt_max


def test_null_message_on_passing_row_stays_null(spark):
    # oracle semantics: regexp_replace(NULL, ...) IS NULL — the kernel
    # must skip None instead of TypeError-ing the whole Arrow batch
    rows = [("cN", 0, "appN", None, False)] + ROWS
    df = spark.createDataFrame(rows, SCHEMA)
    got = {(r["conv_id"], r["turn_idx"]): r
           for r in FH.apply_filter_hook(df, "rate_limit_mask").collect()}
    r = got[("cN", 0)]
    assert r["hook_status_rate_limit_mask"] == "passing"
    assert r["message"] is None
    assert r["hook_rate_limit_mask_message"] is None


def test_kernel_reset_index_still_aligns_correctly(spark):
    # Arrow batches always arrive with a fresh RangeIndex, so a kernel
    # that sorts + reset_index's is UNDETECTABLE by index comparison —
    # the wrapper aligns by the injected _hook_rowid sentinel instead,
    # so verdicts land on the right rows even for reindexing kernels
    import numpy as np

    FH.register_filter_hook(FH.FilterHook(
        name="_reset_index_even",
        kernel=lambda pdf: pdf.sort_values("turn_idx", ascending=False)
        .reset_index(drop=True)
        .assign(
            route_status=lambda d: np.where(
                d["turn_idx"].to_numpy() % 2 == 0, "passing", "dropped"
            )
        ),
        group_cols=("appname",),
    ))
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = FH.apply_filter_hook(df, "_reset_index_even").collect()
    assert len(got) == len(ROWS)
    for r in got:
        want = "passing" if r["turn_idx"] % 2 == 0 else "dropped"
        assert r["hook_status__reset_index_even"] == want, r


def test_kernel_dropping_sentinel_fails_loudly(spark):
    # a kernel that builds a FRESH frame (dropping input columns, and
    # with them the _hook_rowid sentinel) loses row identity — the
    # wrapper must reject it, not mis-align silently
    FH.register_filter_hook(FH.FilterHook(
        name="_bad_fresh_frame",
        kernel=lambda pdf: pd.DataFrame({
            "turn_idx": pdf["turn_idx"].to_numpy(),
            "route_status": "passing",
        }),
        group_cols=("appname",),
    ))
    df = spark.createDataFrame(ROWS, SCHEMA)
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises((PythonException, Py4JJavaError), match="_hook_rowid"):
        FH.apply_filter_hook(df, "_bad_fresh_frame").collect()


def test_sparse_expression_default_fills_jvm_side(spark):
    # the expression-form default exists so data-proportional statuses
    # (parse errors) never ride the broadcast. Proof: a kernel whose
    # verdict frame is ENTIRELY filtered out (every status equals its
    # per-row default under default_status_fn) must still yield the
    # expression's per-row statuses — they can only have come from the
    # JVM-side fill, not the broadcast.
    import numpy as np

    FH.register_filter_hook(FH.FilterHook(
        name="_sparse_expr_probe",
        kernel=lambda pdf: pdf.assign(
            route_status=np.where(
                pdf["parse_error"].to_numpy(dtype=bool), "rejected", "dropped"
            )
        ),
        group_cols=(),
        reads=("parse_error",),
        key_cols=("conv_id", "turn_idx"),
        default_status="CASE WHEN parse_error THEN 'rejected' ELSE 'dropped' END",
        default_status_fn=lambda pdf: np.where(
            pdf["parse_error"].to_numpy(dtype=bool), "rejected", "dropped"
        ),
    ))
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {(r["conv_id"], r["turn_idx"]): r["hook_status__sparse_expr_probe"]
           for r in FH.apply_filter_hook(df, "_sparse_expr_probe").collect()}
    for c, t, _, _, err in ROWS:
        assert got[(c, t)] == ("rejected" if err else "dropped")


def test_sparse_expression_default_requires_pandas_twin(spark):
    FH.register_filter_hook(FH.FilterHook(
        name="_sparse_no_fn",
        kernel=lambda pdf: pdf.assign(route_status="dropped"),
        key_cols=("conv_id", "turn_idx"),
        default_status="CASE WHEN parse_error THEN 'rejected' ELSE 'dropped' END",
    ))
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError, match="default_status_fn"):
        FH.apply_filter_hook(df, "_sparse_no_fn")


def test_hook_rejected_rows_reach_dead_letter(spark):
    # NACK parity: a hook's 'rejected' verdict must dead-letter the row
    # even when the pipeline tri-state says 'passing' — previously such
    # rows matched no sink and were silently swallowed (unnoticed only
    # because the demo hook's rejects coincide with parse_error)
    import numpy as np

    FH.register_filter_hook(FH.FilterHook(
        name="_reject_turn1",
        kernel=lambda pdf: pdf.assign(
            route_status=np.where(
                pdf["turn_idx"].to_numpy() == 1, "rejected", "passing"
            )
        ),
        group_cols=("appname",),
    ))
    df = spark.createDataFrame(ROWS, SCHEMA).withColumn(
        "route_status", F.lit("passing")
    )
    rules = (
        RouteRule("sink_hooked", "'hooked'", "TRUE",
                  partition_key_expr="'pk'", filter_hook="_reject_turn1"),
    )
    routed = route_fanout(
        FH.apply_hooks_for_rules(df, rules), rules, status_aware=True
    )
    by_sink = {}
    for r in routed.collect():
        by_sink.setdefault(r["sink"], []).append((r["conv_id"], r["turn_idx"]))
    rejected = sorted(k for k in [(c, t) for c, t, *_ in ROWS] if k[1] == 1)
    assert sorted(by_sink.get("dead_letter", [])) == rejected
    assert sorted(by_sink["sink_hooked"]) == sorted(
        k for k in [(c, t) for c, t, *_ in ROWS] if k[1] != 1
    )


def test_stacked_narrow_hooks_compose(spark):
    # two narrow hooks named by one rule set: verdicts from both must
    # land on every row (the wrapper cuts lineage between them with a
    # lazy localCheckpoint so hook N+1 doesn't re-run hook N's join on
    # both of its own join sides)
    import numpy as np

    FH.register_filter_hook(FH.FilterHook(
        name="_narrow_even",
        kernel=lambda pdf: pdf.assign(
            route_status=np.where(
                pdf["turn_idx"].to_numpy() % 2 == 0, "passing", "dropped"
            )
        ),
        key_cols=("conv_id", "turn_idx"),
    ))
    FH.register_filter_hook(FH.FilterHook(
        name="_narrow_app2",
        kernel=lambda pdf: pdf.assign(
            route_status=np.where(
                pdf["appname"].to_numpy() == "app2", "rejected", "passing"
            )
        ),
        reads=("appname",),
        key_cols=("conv_id", "turn_idx"),
    ))
    rules = (
        RouteRule("s1", "'t1'", "TRUE", filter_hook="_narrow_even"),
        RouteRule("s2", "'t2'", "TRUE", filter_hook="_narrow_app2"),
    )
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = FH.apply_hooks_for_rules(df, rules)
    rows = out.collect()
    assert len(rows) == len(ROWS)
    for r in rows:
        assert r["hook_status__narrow_even"] == (
            "passing" if r["turn_idx"] % 2 == 0 else "dropped"
        )
        assert r["hook_status__narrow_app2"] == (
            "rejected" if r["appname"] == "app2" else "passing"
        )
