"""Driver-contract gates for the query registry (VERDICT r3 #1/#2/#8).

Two invariants the external driver imposes that plain correctness runs
cannot see:

1. **Scalar-only output schemas.** The driver's canonicalizer sorts
   result columns via pandas before hashing; an ArrayType/MapType/
   StructType column throws ``unhashable type: 'list'`` and burns the
   query's verification slot (CORRECTNESS_r03 ``frame_sample`` err).
   Every ``queries()`` output schema must therefore be scalar-typed.

2. **Rotation coverage.** The driver caps its artifact at the FIRST 50
   registry entries; with 100+ queries each name is verified at best
   every other round, and the original one-artifact rule (green in the
   LATEST artifact or in-window) became arithmetically unsatisfiable
   at 103 registered names vs green_latest(50) + window(50) = 100
   (VERDICT r4 "What's missing" #2). The widened rule: every registry
   name must be green in the union of the last TWO artifacts or sit
   inside the current first-50 window — satisfiable up to
   3 * DRIVER_CAP names, with a hard registry ceiling asserted so
   growth can't silently outrun the cadence again. A name can now go
   at most two rounds without a driver row.
"""
from __future__ import annotations

import glob
import json
import os
import re

import pytest
from pyspark.sql import types as T

DRIVER_CAP = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def test_query_output_schemas_are_scalar_only(spark, sf_dir):
    """Build every registered query's DataFrame (sf0.001 — schemas are
    scale-independent) and assert no complex-typed output column."""
    from skewer_spark.queries import build_queries

    offenders = {}
    for name, q in build_queries().items():
        schema = q(spark, sf_dir).schema
        bad = [f.name for f in schema.fields if isinstance(f.dataType, _COMPLEX)]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "query outputs must be scalar columns only (driver canonicalizer "
        f"cannot hash list/map/struct cells): {offenders}"
    )


def test_registry_rotation_covers_every_query():
    """No query may go MORE than two rounds without a driver-side row:
    each name is green in one of the last TWO artifacts, or in the
    first DRIVER_CAP slots (so the upcoming round's artifact covers
    it), or is explicitly PENDING_FIRST_WINDOW (registered after the
    window filled, awaiting its first slot — allowed only if it has
    NEVER had an artifact row, so a regression can't hide behind the
    pending label). The registry ceiling keeps the cadence satisfiable:
    window(50) + two prior artifacts (2 x 50 distinct at best) bounds
    coverable names at 3 * DRIVER_CAP."""
    from skewer_spark.queries import (
        PENDING_FIRST_WINDOW,
        PENDING_SINCE_ROUND,
        TWIN_EXEMPT,
        build_queries,
    )

    paths = sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    )
    arts = [json.load(open(p)) for p in paths]
    if not arts:
        pytest.skip("no CORRECTNESS artifacts yet (round 1)")
    latest_round = int(re.search(r"_r(\d+)", paths[-1]).group(1))
    green_recent = {
        n
        for art in arts[-2:]
        for n, row in art.items()
        if row.get("err") is None and row.get("rows_match")
    }
    # the pending exemption is TIME-BOUND: it lapses as soon as an
    # artifact newer than the registration round exists
    pending = (
        PENDING_FIRST_WINDOW if latest_round <= PENDING_SINCE_ROUND else set()
    )
    reg = list(build_queries())
    assert len(reg) <= 3 * DRIVER_CAP, (
        f"registry has {len(reg)} queries — beyond 3 x DRIVER_CAP the "
        "two-artifact green window can no longer cover every name; "
        "consolidate twins before registering more"
    )
    stale = [
        n for pos, n in enumerate(reg)
        if pos >= DRIVER_CAP
        and n not in green_recent
        and n not in pending
        and n not in TWIN_EXEMPT
    ]
    assert not stale, (
        "these queries were not green in either of the last two "
        f"CORRECTNESS artifacts and are outside the driver's "
        f"first-{DRIVER_CAP} window — move them into ROTATION_HEAD: "
        f"{stale}"
    )
    recent3_green = {
        n
        for art in arts[-3:]
        for n, row in art.items()
        if row.get("err") is None and row.get("rows_match")
    }
    # the twin exemption covers ONE extra round of cadence, never first
    # verification and never forever: an exempted name must have its
    # own green row within the last THREE artifacts (one round older
    # than the normal two-artifact rule), and its pinning twin's
    # recency is enforced by test_twin_exempt_names_have_live_pins —
    # so if rotation resumes, exempt names must re-enter the window
    # within a round
    stale_twins = sorted(TWIN_EXEMPT - recent3_green)
    assert not stale_twins, (
        "TWIN_EXEMPT names with no green row in the last three "
        f"artifacts — rotate them into the window: {stale_twins}"
    )
    ever_seen = {n for art in arts for n in art}
    not_pending = sorted(PENDING_FIRST_WINDOW & ever_seen)
    assert not not_pending, (
        "these names already had a driver row — they are rotation "
        f"candidates, not pending; remove from PENDING_FIRST_WINDOW: "
        f"{not_pending}"
    )


def test_rotation_head_names_exist():
    from skewer_spark.queries import ROTATION_HEAD, build_queries

    reg = set(build_queries())
    unknown = [n for n in ROTATION_HEAD if n not in reg]
    assert not unknown, f"ROTATION_HEAD names not in registry: {unknown}"
    assert len(ROTATION_HEAD) == len(set(ROTATION_HEAD)), "duplicate names"
    assert len(ROTATION_HEAD) <= DRIVER_CAP


def test_twin_exempt_names_have_live_pins():
    """TWIN_EXEMPT names sit out the driver window on the claim that
    another query transitively pins their semantics — enforce the
    claim: each exempted name's pinning twin must itself be in the
    current window or green in one of the LAST TWO artifacts (the same
    recency rule the rotation gate applies to every name), and an
    exempted name must actually be outside the window (else the
    exemption is moot and should be deleted)."""
    from skewer_spark.queries import TWIN_EXEMPT, build_queries

    pins = {
        "value_percentiles": "value_percentiles_approx",
        "dedup_simhash_canonical": "dedup_simhash_pairs",
        "dedup_apply": "dedup_canonical",
        "embed_canonical": "embed_neardup",
    }
    assert set(pins) == TWIN_EXEMPT, "keep the pin map in sync"
    reg = list(build_queries())
    assert TWIN_EXEMPT <= set(reg)
    window = set(reg[:DRIVER_CAP])
    assert not (TWIN_EXEMPT & window), "exempt name inside the window"
    paths = sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    )
    if not paths:
        pytest.skip("no CORRECTNESS artifacts yet")
    green = {
        n
        for p in paths[-2:]
        for n, row in json.load(open(p)).items()
        if row.get("err") is None and row.get("rows_match")
    }
    dead = {n: t for n, t in pins.items() if t not in window | green}
    assert not dead, f"pinning twin neither in-window nor green: {dead}"
