"""Arrow-vectorized row kernel for the curation funnel.

Why this exists (measured, not guessed): the funnel's per-row work is
regex-heavy — the normalization fingerprint's ``[^a-z0-9 ]`` class and
the PII scrub trio. Spark's JVM ``regexp_replace`` (java.util.regex on
JDK 17's lambda-compiled Pattern) measured ~265 us-core/doc on 300-byte
docs when the class rarely matches — the scan loop, not the replace,
is the cost — versus ~2 us/doc for the same pattern under Arrow's RE2
(``pyarrow.compute.replace_substring_regex``). That 100x gap made the
single-pass funnel's 2-vs-8-core scaling meaningless: the wall was one
pathological JVM regex, not the data. This is the same conclusion the
parse spine reached (parsing/arrowparse.py — Arrow/RE2 is its default
kernel), applied to the curation path.

The kernel runs under ``DataFrame.mapInArrow`` — one Python stage,
RecordBatch in / RecordBatch out, zero pandas materialization. It
evaluates the quality CASE, drops non-kept rows, and emits the
NORMALIZED and SCRUBBED text plus redaction/token counts; md5 hashing
and the min_by dedup aggregate stay JVM-side (md5 measured cheap), so
the exchange still carries only 32-byte digests and ints, never
bodies.

Semantics contract: byte-identical outputs to the macro-SQL funnel
(``curation.survivors_ctes`` / ``corpus_ops.quality_cls_ctes``), pinned
by tests/test_curation.py::test_single_pass_funnel_matches_macro and
the hypothesis ledger fuzz. The mirrored fine points:

- ``SPLIT(text, ' ')`` keeps leading/trailing empty strings (Java
  ``split(re, -1)``); so do ``str.split`` and ``pc.split_pattern``.
- ``trim()`` strips only ASCII spaces -> ``pc.utf8_trim(characters=' ')``,
  NOT ``utf8_trim_whitespace`` (which would also strip tabs).
- NULL text: every CASE predicate is NULL -> falls through to 'kept'
  with NULL norm/scrub/counts (Arrow kernels propagate nulls).
- redaction counts run on the ORIGINAL text (``_N_RED`` semantics),
  the replaces run sequentially (email -> ip -> host).
- RE2 vs java.util.regex agree on these patterns: all three are
  backtracking-free greedy char-class forms where leftmost-first and
  leftmost-longest coincide.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# PII patterns — canonical here; curation.py re-exports them so the
# SQL oracle text and this kernel are built from the same literals.
# Backslash-free so the identical strings parse in Spark and DuckDB.
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PII_IP = "([0-9]{1,3}[.]){3}[0-9]{1,3}"
PII_HOST = "host-[0-9]+"

# quality-rule constants; corpus_ops builds its SQL fragments from
# these same values (tests/test_curation.py pins the rendering parity)
STOP_WORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")
MIN_WORDS = 5
MAX_WORDS = 5000
MIN_DISTINCT_RATIO = 0.30
MIN_STOP_RATIO = 0.01

FUNNEL_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("norm_text", pa.string()),
        ("scrub_text", pa.string()),
        ("n_redactions", pa.int64()),
        ("n_tokens", pa.int64()),
    ]
)
# Spark-side DDL for mapInArrow(schema=...)
FUNNEL_SCHEMA_DDL = (
    "doc_id bigint, norm_text string, scrub_text string, "
    "n_redactions bigint, n_tokens bigint"
)

_STOP_ARR = pa.array(STOP_WORDS, type=pa.string())


def _np(a: pa.Array) -> np.ndarray:
    return a.to_numpy(zero_copy_only=False)


def _quality_kept(
    text: pa.Array, lang: pa.Array, null_mask: np.ndarray
) -> np.ndarray:
    """Boolean keep-mask reproducing the first-failing-rule CASE of
    corpus_ops.quality_cls_ctes. For keep/drop the first-failing order
    collapses to 'no rule fires'; NULL text rows fall through every
    NULL predicate to 'kept' exactly as in SQL."""
    n = len(text)
    tf = pc.fill_null(text, "")
    words = pc.split_pattern(tf, pattern=" ")
    n_words = _np(pc.list_value_length(words)).astype(np.int64)
    # distinct-word count per row without per-row Python: dictionary-
    # encode the flattened words (C++ hash), then count unique
    # (row, code) pairs. Natural-language corpora have small
    # vocabularies, so the fast path scatters into an n x dict_size
    # presence matrix — O(words), no sort; adversarial vocabularies
    # (every word unique -> matrix would be quadratic) fall back to
    # one sort over the batch via np.unique.
    flat = pc.list_flatten(words)
    dc = flat.dictionary_encode()
    codes = _np(dc.indices).astype(np.int64)
    row_ids = np.repeat(np.arange(n, dtype=np.int64), n_words)
    d = len(dc.dictionary)
    if n * d <= 64_000_000:
        seen = np.zeros((n, d), dtype=bool)
        seen[row_ids, codes] = True
        distinct = seen.sum(axis=1)
    else:
        uniq = np.unique((row_ids << 32) | codes)
        distinct = np.bincount((uniq >> 32).astype(np.int64), minlength=n)
    stop_dict = _np(pc.is_in(dc.dictionary, value_set=_STOP_ARR))
    stop_rows = row_ids[stop_dict[codes]]
    stop_cnt = np.bincount(stop_rows, minlength=n)
    nw = n_words.astype(np.float64)
    is_en = _np(pc.equal(pc.fill_null(lang, ""), "en"))
    dropped = (
        (n_words < MIN_WORDS)
        | (n_words > MAX_WORDS)
        | ((distinct / nw) < MIN_DISTINCT_RATIO)
        | (is_en & ((stop_cnt / nw) < MIN_STOP_RATIO))
    )
    return ~dropped | null_mask


# lowercase-ASCII-alnum byte classes for the normalization mask
_ALNUM = np.zeros(256, dtype=bool)
_ALNUM[ord("a"): ord("z") + 1] = True
_ALNUM[ord("0"): ord("9") + 1] = True


def _normalize_re2(lo: pa.Array) -> pa.Array:
    """Reference form of the post-lower normalization (RE2), kept as
    the fallback for arrays the byte path doesn't handle."""
    s = pc.replace_substring_regex(lo, pattern="[^a-z0-9 ]", replacement=" ")
    s = pc.replace_substring_regex(s, pattern=" +", replacement=" ")
    return pc.utf8_trim(s, characters=" ")


def _normalize_bytes(arr: pa.Array) -> pa.Array:
    """Byte-level [^a-z0-9 ]->' ' + run collapse + space trim over a
    zero-offset, null-free utf8 array. EXACT char-level equivalence:
    UTF-8 is self-synchronizing — every byte of a multi-byte codepoint
    is >= 0x80, so after proper unicode lowercasing no non-ASCII char
    can contribute an ASCII alnum byte; its k bytes become k spaces,
    which the run collapse reduces to the same single space the
    char-level regex produces (pinned by the kernel-vs-macro fuzz).
    This exists because the ' +' collapse regex — a match every few
    characters — was the normalize stage's dominant cost (~3.6 s of
    4.5 s per 500k docs single-core under RE2)."""
    n = len(arr)
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], np.int32, n + 1)
    nbytes = int(off[-1])
    if nbytes == 0:
        return arr
    b = np.frombuffer(bufs[2], np.uint8, nbytes)
    alnum = _ALNUM[b]
    out = np.where(alnum, b, np.uint8(32))
    space = ~alnum  # out == 32 exactly where not alnum
    # collapse: drop a space whose predecessor byte is a space. The
    # predecessor shift deliberately crosses row boundaries — it can
    # only misfire on a row's FIRST byte (dropping a leading space),
    # and utf8_trim below strips leading/trailing spaces anyway, so
    # the final string is unaffected; this avoids any per-row index
    # machinery (measured: arange/accumulate/repeat for an in-numpy
    # trailing trim cost more than the whole RE2 form).
    prev_space = np.empty(nbytes, dtype=bool)
    prev_space[1:] = space[:-1]
    prev_space[0] = True
    keep = ~(space & prev_space)
    cs = np.concatenate((np.zeros(1, dtype=np.int64), np.cumsum(keep)))
    new_off = cs[off].astype(np.int32)
    collapsed = pa.StringArray.from_buffers(
        n,
        pa.py_buffer(new_off.tobytes()),
        pa.py_buffer(out[keep].tobytes()),
    )
    return pc.utf8_trim(collapsed, characters=" ")


def _normalize(text: pa.Array) -> pa.Array:
    """lower -> [^a-z0-9 ] -> ' ' -> collapse runs -> trim spaces;
    byte-equal to corpus_ops.NORM_FP_EXPR's pre-md5 string."""
    lo = pc.utf8_lower(text)
    if isinstance(lo, pa.ChunkedArray):  # pragma: no cover - 1 batch in
        lo = lo.combine_chunks()
    null_mask = pc.is_null(lo)
    filled = pc.fill_null(lo, "")
    # The byte path reads the int32 offset buffer of a zero-offset
    # plain-utf8 array directly; any other layout (large_string under
    # spark.sql.execution.arrow.useLargeVarTypes, a sliced array) must
    # take the RE2 form — misreading int64 offsets as int32 would
    # produce silently misaligned strings, not an error.
    if not pa.types.is_string(filled.type) or filled.offset != 0:
        return _normalize_re2(lo)
    norm = _normalize_bytes(filled)
    if not pc.any(null_mask).as_py():
        return norm
    return pc.if_else(null_mask, pa.nulls(len(text), pa.string()), norm)


def _scrub(text: pa.Array) -> tuple[pa.Array, pa.Array, pa.Array]:
    """(scrubbed, n_redactions, n_tokens) — curation._SCRUB/_N_RED
    semantics: counts on the original text, replaces sequential."""
    s = pc.replace_substring_regex(
        text, pattern=PII_EMAIL, replacement="<EMAIL>"
    )
    s = pc.replace_substring_regex(s, pattern=PII_IP, replacement="<IP>")
    s = pc.replace_substring_regex(s, pattern=PII_HOST, replacement="<HOST>")
    nred = pc.cast(
        pc.add(
            pc.add(
                pc.count_substring_regex(text, pattern=PII_EMAIL),
                pc.count_substring_regex(text, pattern=PII_IP),
            ),
            pc.count_substring_regex(text, pattern=PII_HOST),
        ),
        pa.int64(),
    )
    ntok = pc.cast(
        pc.list_value_length(pc.split_pattern(s, pattern=" ")), pa.int64()
    )
    return s, nred, ntok


def funnel_batch(batch: pa.RecordBatch) -> pa.RecordBatch:
    """One RecordBatch through quality-filter -> normalize -> scrub."""
    text = batch.column("text")
    if pa.types.is_large_string(text.type):
        # arrow.useLargeVarTypes sessions deliver large_string; fold to
        # plain utf8 up front (loud overflow error past 2 GB, which
        # maxRecordsPerBatch makes unreachable) so every downstream
        # kernel and the output schema see one layout.
        text = pc.cast(text, pa.string())
    lang = batch.column("lang")
    doc_id = pc.cast(batch.column("doc_id"), pa.int64())
    null_mask = _np(pc.is_null(text))
    kept = _quality_kept(text, lang, null_mask)
    idx = pa.array(np.nonzero(kept)[0])
    t_k = pc.take(text, idx)
    norm = _normalize(t_k)
    scrub, nred, ntok = _scrub(t_k)
    return pa.RecordBatch.from_arrays(
        [pc.take(doc_id, idx), norm, scrub, nred, ntok],
        schema=FUNNEL_SCHEMA,
    )


def funnel_kernel(
    batches: Iterator[pa.RecordBatch],
) -> Iterator[pa.RecordBatch]:
    """mapInArrow entrypoint."""
    for batch in batches:
        if batch.num_rows:
            yield funnel_batch(batch)
