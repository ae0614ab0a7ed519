"""Registered vectorized filter hooks: the FilterMessage escape hatch.

The reference's filter is an arbitrary-logic JS function per config
environment (/root/reference/javascript/vm.go:399-442): it classifies
every message PASS/DROPPED/REJECTED and may MUTATE the message, with
the mutations copied back only on PASS (:427-436). The repo's
``RouteRule`` filters are portable-SQL expressions — deliberately, so
Catalyst codegens them — but a user porting a nontrivial JS filter
needs an escape hatch with the same contract. This module is that
hatch, mirroring ``parsing/registry.py`` on the routing side:

- a named registry of VECTORIZED filter kernels (pandas in, pandas
  out — Arrow-batched, never per-row Python);
- per-group kernels (``group_cols``) run under ``applyInPandas`` so a
  kernel can implement stateful-within-group logic (rate limiting,
  ordering-dependent rewrites) no single SQL expression expresses;
- tri-state outcomes preserved: the kernel emits ``route_status`` in
  {passing, dropped, rejected} for EVERY input row (rows are never
  swallowed — DROPPED is a countable verdict, forwarder.go:192-208);
- mutation-on-PASS only: the wrapper keeps the ORIGINAL columns and
  exposes the kernel's rewrites as ``hook_<name>_<col>`` columns, so
  routing can forward mutated values for passing rows while
  dropped/rejected rows provably keep their original bytes
  (tests/test_route_hooks.py pins this, mirroring
  test_route_mutation_is_per_rule_and_pass_only).

``RouteRule.filter_hook`` selects a hook by name; ``route_fanout``
ANDs ``hook_status_<name> = 'passing'`` into that rule's filter and
forwards the hook's rewritten columns — the hook stage is ONE
applyInPandas/mapInPandas pass per distinct hook, shared by every rule
that names it.

Scale shape: a grouped hook shuffles once on its group columns (same
exchange a groupBy would need); an ungrouped hook is a mapInPandas
with zero shuffle. Kernels see Arrow record batches, not rows.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

VALID_STATUSES = {"passing", "dropped", "rejected"}


@dataclass(frozen=True)
class FilterHook:
    name: str
    # kernel: pdf -> pdf with a route_status column added and mutated
    # columns rewritten IN PLACE (the wrapper handles pass-only
    # exposure); must return exactly the input rows, in any order and
    # with any index — row identity travels on an injected
    # ``_hook_rowid`` sentinel column the wrapper aligns by, so
    # sort_values/reset_index are fine, but the kernel must CARRY the
    # input columns through (a fresh frame that drops the sentinel
    # fails loudly rather than mis-attaching verdicts)
    kernel: Callable[[pd.DataFrame], pd.DataFrame]
    # columns the kernel may rewrite; exposed as hook_<name>_<col>
    mutates: tuple[str, ...] = ()
    # non-empty -> applyInPandas grouped on these columns (stateful
    # within group); empty -> mapInPandas (per-batch, stateless)
    group_cols: tuple[str, ...] = ()
    # input columns the kernel READS beyond group_cols/mutates. Only
    # meaningful with key_cols (the narrow path below).
    reads: tuple[str, ...] = ()
    # SKEW ESCAPE for grouped hooks: names a column such that the
    # kernel's cross-row logic never crosses distinct values of it
    # (its statefulness unit is FINER than group_cols — e.g. per-conv
    # counters inside a per-appname hook). The wrapper then groups on
    # (group_cols..., pmod(hash(salt_within_group), salt_buckets)):
    # every unit stays whole inside one kernel call, but a hot group
    # spreads over up to salt_buckets tasks — the grouped-hook analog
    # of skew.salted_repartition. The per-task input bound drops from
    # max group size to ~max(group)/salt_buckets (plus the largest
    # single unit). Leave empty when the logic genuinely spans the
    # whole group (rate_limit_mask's global first-K ordering): then
    # the documented cap IS the largest group — size such groups like
    # any single window partition (see skew.blocked_row_number for the
    # two-phase shape if that ever becomes hot).
    # tests/test_route_hooks.py::test_grouped_hook_hot_group_salting
    # measures the bound under a 50%-hot group.
    salt_within_group: str = ""
    salt_buckets: int = 16
    # a UNIQUE row key (caller contract — unique under NULL-SAFE
    # equality: the verdict join-back uses <=>, so two rows sharing an
    # identical NULL-containing key tuple would cross-match and
    # silently MULTIPLY; pass validate_keys=True to apply_filter_hook
    # to fail fast on that instead). Non-empty enables the NARROW
    # path: only key+group+reads+mutates round-trip through Python and
    # the verdict joins back on the key, so the wide columns stay
    # JVM-side. The join-back ships mutations COMPRESSED (NULL when a
    # column is unchanged, coalesced back to the original after the
    # join), so a kernel that rewrites few rows returns almost-empty
    # mutation columns; consequence: a narrow-path kernel cannot
    # mutate a value TO NULL (it reads as "unchanged" — the wide path
    # has no such limit). The input lineage (including any parse UDF)
    # runs on BOTH join sides — measured cheaper at 10M rows than
    # materializing it (localCheckpoint/cache of the wide frame costs
    # more than the second parse; BENCH/BASELINE.md r4). Empty -> the
    # whole frame passes through the kernel once (correct for any
    # schema and any non-unique keying, pays full-width Arrow
    # transfer; measured 2.5x slower e2e at 10M rows).
    key_cols: tuple[str, ...] = ()
    # SPARSE-VERDICT escape (narrow path only): the status almost
    # every row gets. Either a bare status literal ('dropped') or a
    # portable SQL EXPRESSION over JVM-visible columns evaluating to a
    # status per row ("CASE WHEN parse_error THEN 'rejected' ELSE
    # 'dropped' END") — the expression form exists so data-proportional
    # verdicts the JVM can recompute (parse errors!) never ride the
    # broadcast. When set, the kernel stage returns ONLY rows whose
    # status differs from their per-row default or that carry a real
    # mutation, and the verdict frame BROADCASTS back onto the wide
    # side as a left join — the wide side never shuffles, which is the
    # difference between "adds a 10^12-row exchange" and "adds a
    # per-executor map probe" at scale. Registrant contract: the
    # non-default row count must be broadcastable BY CONSTRUCTION
    # (rate limiting passes K rows per group; a 50%-pass filter must
    # leave this empty and take the shuffled hash join instead) — and
    # by construction means bounded by group/key cardinality, NOT by a
    # data-proportional rate like parse errors; push those into the
    # expression form.
    default_status: str = ""
    # pandas twin of an expression-form default_status (required then;
    # ignored for the literal form): pdf -> array of statuses, one per
    # row. The wrapper uses it to decide which kernel rows are
    # redundant; the JVM expression fills them in at join-back. The
    # two must agree on every row — the oracle hash pins that.
    default_status_fn: Callable[[pd.DataFrame], "np.ndarray"] | None = None


_HOOKS: dict[str, FilterHook] = {}


def register_filter_hook(hook: FilterHook) -> None:
    _HOOKS[hook.name] = hook


def get_filter_hook(name: str) -> FilterHook:
    if name not in _HOOKS:
        raise KeyError(
            f"unknown filter hook {name!r}; registered: {sorted(_HOOKS)}"
        )
    return _HOOKS[name]


def status_col(name: str) -> str:
    return f"hook_status_{name}"


def mutated_col(name: str, col: str) -> str:
    return f"hook_{name}_{col}"


def apply_filter_hook(
    df: DataFrame, name: str, validate_keys: bool = False
) -> DataFrame:
    """Run one registered hook over df: adds ``hook_status_<name>``
    plus ``hook_<name>_<col>`` for each declared mutated column.
    Original columns are passed through UNTOUCHED; the mutated copies
    equal the originals on non-passing rows (enforced here, not
    trusted from the kernel — the reference only copies mutations back
    on PASS).

    ``validate_keys=True`` (narrow path only) runs one extra
    aggregation asserting key_cols are unique under NULL-SAFE equality
    before trusting the join-back — a duplicated key tuple would
    otherwise silently multiply rows. Off by default: it costs a
    shuffle-sized job, and production callers pin uniqueness
    upstream."""
    hook = get_filter_hook(name)
    narrow = bool(hook.key_cols)
    if hook.default_status and not narrow:
        raise ValueError(
            f"hook {name!r}: default_status requires key_cols (the "
            "sparse-verdict path is a join-back optimization)"
        )
    literal_default = hook.default_status in VALID_STATUSES
    if hook.default_status and not literal_default and hook.default_status_fn is None:
        raise ValueError(
            f"hook {name!r}: default_status {hook.default_status!r} is "
            f"not a bare status in {sorted(VALID_STATUSES)}, so it is "
            "treated as a SQL expression and needs default_status_fn "
            "(the pandas twin) to filter redundant kernel rows"
        )
    if narrow and validate_keys:
        dup = (
            df.groupBy(*hook.key_cols)
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"hook {name!r}: key_cols {hook.key_cols} are not unique "
                f"under null-safe equality (e.g. {tuple(dup[0])[:-1]}) — "
                "the narrow verdict join-back would multiply rows; fix "
                "the key or use the wide path (key_cols=())"
            )
    if "_hook_rowid" in df.columns:
        raise ValueError(
            f"hook {name!r}: input already has a _hook_rowid column, "
            "which collides with the wrapper's row-identity sentinel — "
            "rename it before applying the hook"
        )
    if narrow:
        seen: dict[str, None] = {}
        extra = (hook.salt_within_group,) if hook.salt_within_group else ()
        for c in (*hook.key_cols, *hook.group_cols, *extra,
                  *hook.reads, *hook.mutates):
            seen.setdefault(c)
        work = df.select(*seen)
    else:
        work = df
    in_fields = list(work.schema.fields)
    by_name = {f.name: f for f in in_fields}
    pass_fields = (
        [by_name[c] for c in hook.key_cols] if narrow else in_fields
    )
    out_schema = StructType(
        pass_fields
        + [StructField(status_col(name), StringType())]
        + [
            StructField(mutated_col(name, c), by_name[c].dataType)
            for c in hook.mutates
        ]
    )
    pass_cols = [f.name for f in pass_fields]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        # Row identity travels on an INJECTED sentinel column, not the
        # pandas index: Arrow batches always arrive with a fresh
        # 0..n-1 RangeIndex, so a kernel that sorts and reset_index's
        # produces an index SET-EQUAL to the input — undetectable, and
        # index-based alignment would silently attach every verdict to
        # the wrong row. The sentinel survives any reorder/reindex as
        # long as the kernel keeps input columns (the one thing we can
        # check loudly).
        pin = pdf.copy()
        pin["_hook_rowid"] = np.arange(len(pin), dtype=np.int64)
        out = hook.kernel(pin)
        bad = set(out["route_status"].unique()) - VALID_STATUSES
        if bad:
            raise ValueError(f"hook {name!r} emitted invalid statuses {bad}")
        if len(out) != len(pdf):
            raise ValueError(
                f"hook {name!r} returned {len(out)} rows for {len(pdf)} in — "
                "kernels classify rows, they never add or swallow them"
            )
        if "_hook_rowid" not in out.columns:
            raise ValueError(
                f"hook {name!r} kernel dropped the _hook_rowid sentinel — "
                "kernels may reorder rows freely but must carry every "
                "input column through (build on the input frame, don't "
                "construct a fresh one)"
            )
        rid = out["_hook_rowid"].to_numpy(dtype=np.int64)
        if not np.array_equal(np.sort(rid), np.arange(len(pdf), dtype=np.int64)):
            raise ValueError(
                f"hook {name!r} kernel duplicated or rewrote _hook_rowid — "
                "it must remain a permutation of the input rows"
            )
        # EVERY pass-through column comes from the ORIGINAL batch
        # (aligned to the kernel's row order via the sentinel) — a
        # kernel edit to an undeclared column, or to a column that
        # happens to collide with an upstream name (e.g. the
        # pipeline's own route_status tri-state), can never leak
        # downstream
        res = pdf.iloc[rid].loc[:, pass_cols].copy()
        passing = (out["route_status"] == "passing").to_numpy()
        statuses = out["route_status"].to_numpy()
        res[status_col(name)] = statuses
        for c in hook.mutates:
            # positional (numpy) alignment throughout — pandas would
            # re-align these Series by index, undoing the rid mapping
            orig = pd.Series(pdf[c].to_numpy()[rid])
            out_c = pd.Series(out[c].to_numpy())
            if narrow:
                # ship mutations compressed: NULL = unchanged (the
                # join-back coalesces to the original), so a kernel
                # rewriting few rows sends almost-empty columns.
                # Pass-only mutation falls out: non-passing rows are
                # forced to NULL -> original after coalesce.
                same = (out_c.eq(orig) | (out_c.isna() & orig.isna()))
                changed = passing & ~same.to_numpy(dtype=bool)
                vals = out_c.to_numpy(dtype=object, copy=True)
                vals[~changed] = None
                res[mutated_col(name, c)] = vals
            else:
                # pass-only mutation: dropped/rejected keep originals
                res[mutated_col(name, c)] = out_c.where(
                    passing, orig
                ).to_numpy()
        if hook.default_status:
            # sparse-verdict path: only non-default rows return from
            # the kernel stage (the join-back fills the default — per
            # row via the SQL expression form, or the constant)
            if hook.default_status_fn is not None:
                defaults = np.asarray(
                    hook.default_status_fn(pdf.iloc[rid]), dtype=object
                )
            else:
                defaults = np.full(len(out), hook.default_status, dtype=object)
            keep = statuses != defaults
            for c in hook.mutates:
                keep = keep | res[mutated_col(name, c)].notna().to_numpy()
            res = res[keep]
        return res

    if hook.group_cols:
        if hook.salt_within_group:
            if "_hook_salt" in work.columns:
                raise ValueError(
                    f"hook {name!r}: input already has a _hook_salt "
                    "column; it would be overwritten and dropped — "
                    "rename it before applying the hook"
                )
            salted = work.withColumn(
                "_hook_salt",
                F.pmod(
                    F.hash(F.col(hook.salt_within_group)),
                    F.lit(hook.salt_buckets),
                ),
            )
            verdicts = salted.groupBy(
                *hook.group_cols, "_hook_salt"
            ).applyInPandas(
                lambda _key, pdf: run(pdf.drop(columns=["_hook_salt"])),
                out_schema,
            )
        else:
            verdicts = work.groupBy(*hook.group_cols).applyInPandas(
                lambda _key, pdf: run(pdf), out_schema
            )
    else:

        def run_batches(it):
            for pdf in it:
                if len(pdf):
                    yield run(pdf)

        verdicts = work.mapInPandas(run_batches, out_schema)

    if not narrow:
        return verdicts
    # join the narrow verdict frame back on the declared unique key;
    # the join preserves every row because the kernel is length- and
    # key-preserving (checked above) and the key is unique (caller
    # contract, pinned by test_narrow_hook_preserves_rows). NULL-SAFE
    # equality (<=>) so a row with a NULL key component keeps its
    # verdict instead of being silently swallowed by NULL != NULL —
    # still a hash equi-join, and "rows are never swallowed" is this
    # module's contract (test_narrow_hook_keeps_null_key_rows).
    v = verdicts.alias("_hook_v")
    cond = None
    for c in hook.key_cols:
        eq = df[c].eqNullSafe(v[c])
        cond = eq if cond is None else cond & eq
    if hook.default_status:
        # sparse verdicts: broadcast-left-join the few non-default
        # rows; the wide side keeps its partitioning (no exchange).
        # Absent rows get their default JVM-side — a constant, or the
        # per-row SQL expression (which is how data-proportional
        # statuses stay OFF the broadcast).
        joined = df.join(F.broadcast(v), on=cond, how="left")
        default_col = (
            F.lit(hook.default_status)
            if literal_default
            else F.expr(hook.default_status)
        )
        status = F.coalesce(v[status_col(name)], default_col)
    else:
        # dense verdicts: shuffled hash join, not sort-merge — the
        # verdict side is slim and per-partition hash maps beat two
        # 10M-row sorts on string keys (measured 43.3 -> 37.9 s e2e
        # at 10M rows; AQE may still re-plan)
        joined = df.join(v.hint("shuffle_hash"), on=cond)
        status = v[status_col(name)]
    sel = [df[c] for c in df.columns]
    sel.append(status.alias(status_col(name)))
    for c in hook.mutates:
        # NULL shipped = unchanged -> restore the original JVM-side
        sel.append(
            F.coalesce(v[mutated_col(name, c)], df[c]).alias(
                mutated_col(name, c)
            )
        )
    return joined.select(*sel)


def apply_hooks_for_rules(df: DataFrame, rules) -> DataFrame:
    """One hook stage per DISTINCT hook named by the rules (shared by
    every rule that selects it), applied before the fan-out
    projection.

    Lineage discipline: a narrow hook's verdict join-back re-executes
    the input lineage on both join sides (measured cheaper than
    materializing for ONE hook — see FilterHook.key_cols). STACKED
    narrow hooks would compound that 2x per hook (hook N+1 re-runs
    hook N's join on both of ITS sides: 2^H parse executions), so from
    the second narrow hook on we cut lineage with a lazy
    localCheckpoint — each subsequent hook then re-reads materialized
    partitions instead of recomputing the whole prefix."""
    applied_narrow = False
    for name in sorted({r.filter_hook for r in rules if getattr(r, "filter_hook", "")}):
        narrow = bool(get_filter_hook(name).key_cols)
        if narrow and applied_narrow:
            df = df.localCheckpoint(eager=False)
        df = apply_filter_hook(df, name)
        applied_narrow = applied_narrow or narrow
    return df


# ----------------------------------------------------------------- demo
# A hook no single SQL expression can express Spark-side: per-appname
# rate limiting (stateful within the group — requires ordering and a
# running count) combined with a regex-captures rewrite on PASS.
# The ORACLE still states the same semantics in window SQL
# (rate_limit_mask_oracle_sql in queries.py), which is exactly the
# correctness contract: arbitrary Python on the Spark side, an
# independent declarative restatement on the DuckDB side.

RATE_LIMIT_K = 3
_DIGIT_RUN = "[0-9]+"  # ASCII class, byte-identical semantics in DuckDB's RE2


def _rate_limit_mask_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    import re

    import numpy as np

    pdf = pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    rn = np.arange(1, len(pdf) + 1)
    err = pdf["parse_error"].to_numpy(dtype=bool)
    pdf["route_status"] = np.where(
        err, "rejected", np.where(rn <= RATE_LIMIT_K, "passing", "dropped")
    )
    digit_run = re.compile(_DIGIT_RUN)
    passing = (~err) & (rn <= RATE_LIMIT_K)
    msgs = pdf["message"].to_numpy(dtype=object, copy=True)
    for i in np.nonzero(passing)[0]:
        # NULL message stays NULL, matching the oracle's
        # regexp_replace(NULL, ...) -> NULL (sub(None) would TypeError
        # the whole Arrow batch)
        if msgs[i] is not None:
            msgs[i] = digit_run.sub("#", msgs[i])
    pdf["message"] = msgs
    return pdf


register_filter_hook(
    FilterHook(
        name="rate_limit_mask",
        kernel=_rate_limit_mask_kernel,
        mutates=("message",),
        group_cols=("appname",),
        reads=("parse_error",),
        key_cols=("conv_id", "turn_idx"),
        # sparse by construction: ONLY the K passing rows per appname
        # ride the broadcast (bounded by appname cardinality). Parse
        # errors are data-proportional, so their 'rejected' verdict is
        # recomputed JVM-side by the expression default instead of
        # shipping ~error_rate * N rows through a broadcast that must
        # never exceed the driver/executor memory.
        default_status="CASE WHEN parse_error THEN 'rejected' ELSE 'dropped' END",
        default_status_fn=lambda pdf: np.where(
            pdf["parse_error"].to_numpy(dtype=bool), "rejected", "dropped"
        ),
    )
)
