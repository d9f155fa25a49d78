"""Tokenizer / normalizer column expressions.

Reproduces the reference tokenizer semantics exactly
(``/root/reference/main.c++:100-128``):

  * lines are read one at a time (``getline``, main.c++:98), and each
    line's FIRST token comes from ``strtok_r(line, " \\n\\t")``
    (main.c++:102) — but every SUBSEQUENT token comes from
    ``strtok_r(NULL, " ")`` (main.c++:143), whose delimiter set is a
    single space.  So a tab splits only while scanning the first token;
    a tab after that stays INSIDE its token, is erased by the
    normalizer, and JOINS the fragments: ``"a b\\tc"`` -> ``a``, ``bc``
    while ``"a\\tb c"`` -> ``a``, ``b``, ``c``;
  * normalization lowercases ``A-Z`` and deletes every char outside
    ``a-z`` (digits, punctuation, non-ASCII) *in place*, so mid-token
    punctuation JOINS the fragments: ``don't`` -> ``dont``,
    ``don't2x`` -> ``dontx`` (main.c++:110-124);
  * tokens empty after normalization are dropped (main.c++:125-128).

Everything is built-in ``pyspark.sql.functions`` -- no UDFs -- so the
whole chain stays inside WholeStageCodegen.
"""

from __future__ import annotations

import sys

from pyspark import cloudpickle
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The Arrow fast-path worker below runs in Python workers; ship this
# module's functions by value so executors need no package import
# (same rationale as operators/multimodal.py).
cloudpickle.register_pickle_by_value(sys.modules[__name__])

# One line's strtok head: optional leading [ \t] run, the first token,
# and at most ONE terminating delimiter (strtok consumes exactly one).
_STRTOK_HEAD = "^[ \t]*[^ \t]*[ \t]?"

# ASCII-only case fold.  NOT F.lower: the reference normalizer is a
# bytewise `c + 32` on A-Z (main.c++:110-124), while Unicode lower()
# folds some non-ASCII chars INTO [a-z] — U+212A KELVIN SIGN -> 'k',
# U+0130 -> 'i' + combining dot — which the reference (and the Arrow
# byte path) deletes instead.  translate() folds exactly A-Z and
# leaves every other char for the [^a-z] delete, byte-faithful to the
# reference on any input.
_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LOWER = "abcdefghijklmnopqrstuvwxyz"


def ascii_lower(col: Column) -> Column:
    """Fold A-Z to a-z and nothing else (reference main.c++:115-118)."""
    return F.translate(col, _UPPER, _LOWER)


def normalize_word(col: Column) -> Column:
    """ASCII-lowercase then strip every non-[a-z] char (reference
    main.c++:110-124)."""
    return F.regexp_replace(ascii_lower(col), "[^a-z]", "")


def _strtok_line(line: Column) -> Column:
    """Rewrite one line so a uniform whitespace split reproduces the
    reference's asymmetric strtok_r delimiters (main.c++:102,143): keep
    the head (leading delims + first token + its one terminator) as-is,
    and DELETE tabs from the tail — tail tabs are not delimiters for
    ``strtok_r(NULL, " ")``; they survive inside tokens until the
    normalizer erases them, joining the fragments."""
    head = F.regexp_extract(line, _STRTOK_HEAD, 0)
    tail = F.regexp_replace(line, _STRTOK_HEAD, "")
    return F.concat(head, F.translate(tail, "\t", ""))


def tokens_of(text: Column) -> Column:
    """Array of normalized non-empty words from a text column.

    Per-line strtok rewrite (above), then the normalizer runs as ONE
    whole-line pass — ``regexp_replace(ascii_lower(text), "[^a-z \\n\\t]", "")``
    — before a single split on the ``" \\n\\t"`` delimiter set, dropping
    empties.  Deleting chars disjoint from the delimiter set commutes
    with splitting on that set, so this is exactly the reference's
    per-token normalize (main.c++:110-124) with one regex invocation
    per LINE instead of per token (~25% faster on tokenize-heavy
    queries; the per-token form pays regex setup ~n_tokens times).
    ``\\r``/``\\f``/``\\xa0`` never split (not in any strtok delimiter
    set): they are erased by the normalizer and join their neighbors,
    exactly as in the reference.
    """
    # The strtok rewrite is the identity on tab-free text, and tabs are
    # rare in real corpora — gate the per-line pass on a cheap contains
    # so the common path is a single split (measured 2x on the
    # tokenize-heavy queries).
    fixed = F.when(
        text.contains("\t"),
        F.concat_ws("\n", F.transform(F.split(text, "\n"), _strtok_line)),
    ).otherwise(text)
    cleaned = F.regexp_replace(ascii_lower(fixed), "[^a-z \n\t]", "")
    return F.filter(F.split(cleaned, "[ \n\t]+"), lambda w: F.length(w) > 0)


def tokenize_documents(
    documents: DataFrame, extra_cols: list[str] | None = None
) -> DataFrame:
    """(doc_id, word[, extra...]) stream: one row per token occurrence.

    Column-prunes to (doc_id, text) — plus any ``extra_cols`` the
    caller carries through, e.g. ``lang`` — before the explode so a
    parquet scan reads only the used columns at 100 TB.
    """
    return documents.select(
        "doc_id",
        *(extra_cols or []),
        F.explode(tokens_of(F.col("text"))).alias("word"),
    )


def tokenize_documents_distinct(
    documents: DataFrame, extra_cols: list[str] | None = None
) -> DataFrame:
    """Per-document DISTINCT token stream — (doc_id, word) emitted
    exactly once per pair — with the dedup run ARRAY-LOCALLY
    (``array_distinct`` before the explode), not as a downstream
    shuffle or aggregation probe.

    PRECONDITION: equivalent to ``tokenize_documents(...).distinct()``
    only when input rows are unique per doc_id (whole-document rows).
    Fed line-grained rows (``read_corpus`` line mode emits one row per
    LINE, duplicating doc_id), the stream keeps cross-line duplicate
    (doc_id, word) pairs — fine for ``build_index``'s ``collect_set``
    (set semantics re-dedup), silently wrong for a count(*)-style
    consumer.
    But the plan is very different at scale: ``.distinct()`` exchanges
    the full occurrence stream on (doc_id, word), and explode +
    ``collect_set`` pushes every occurrence through the aggregation
    hash table — while here repeated tokens die inside one array pass
    in the scan stage, so the explode emits per-doc VOCABULARY rows
    (Zipf-sublinear) instead of corpus token volume.  Measured on the
    8.3 GiB race corpus: the full index pipeline's steady-state
    wall-clock drops ~1.35x (29-34 s -> 23-24 s) from this change
    alone; the tokenize+aggregate stage it targets shrinks more.
    """
    return documents.select(
        "doc_id",
        *(extra_cols or []),
        F.explode(F.array_distinct(tokens_of(F.col("text")))).alias("word"),
    )


# --------------------------------------------------------------------------
# Arrow fast path: C-speed per-doc distinct tokens for the bulk pipeline
# --------------------------------------------------------------------------

# bytes.translate machinery precomputed once: uppercase folds to
# lowercase; every byte whose folded value is outside [a-z \n\t] is
# DELETED (bytes.translate deletes first, then maps — the delete set is
# therefore computed against the fold).  Deleting multibyte UTF-8
# sequences byte-by-byte equals deleting the character, and the
# expression path's fold is ASCII-only (``ascii_lower``, not Unicode
# lower()), so the two paths agree on ANY input — including chars
# whose Unicode lowercase lands in [a-z] (U+212A, U+0130), which both
# paths delete like the reference does.
_FOLD = bytes((b + 32) if 0x41 <= b <= 0x5A else b for b in range(256))
_KEEP = frozenset(range(0x61, 0x7B)) | {0x20, 0x0A, 0x09}
_DELETE = bytes(b for b in range(256) if _FOLD[b] not in _KEEP)


def _strtok_fix_bytes(line: bytes) -> bytes:
    """Byte-level twin of ``_strtok_line``: keep the head (leading
    delims + first token + its one terminator), delete tabs from the
    tail (reference main.c++:102,143 — tail tabs are not delimiters)."""
    i = 0
    n = len(line)
    while i < n and line[i] in (0x20, 0x09):
        i += 1
    while i < n and line[i] not in (0x20, 0x09):
        i += 1
    if i < n:
        i += 1
    return line[:i] + line[i:].replace(b"\t", b"")


def _distinct_token_batches(batches):
    """mapInPandas worker: per document, normalize + tokenize + dedup
    at C speed (bytes.translate / bytes.split / set) and emit one
    (doc_id, word) row per distinct token."""
    import pandas as pd

    # Flush the output frame every ~1M rows: an Arrow input batch is
    # bounded by the scan partition (~128 MB of text), but a
    # pathological all-unique-token corpus could otherwise accumulate
    # the whole partition's vocabulary in one Python list.
    flush_rows = 1_000_000
    for pdf in batches:
        ids: list = []
        words: list = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            if text is None:
                continue  # null text yields no tokens (expression-path parity)
            b = text.encode("utf-8")
            if b"\t" in b:
                b = b"\n".join(_strtok_fix_bytes(ln) for ln in b.split(b"\n"))
            toks = set(b.translate(_FOLD, _DELETE).split())
            ids.extend([doc_id] * len(toks))
            words.extend(w.decode("ascii") for w in toks)
            if len(ids) >= flush_rows:
                yield pd.DataFrame({"doc_id": ids, "word": words})
                ids, words = [], []
        if ids:
            yield pd.DataFrame({"doc_id": ids, "word": words})


def tokenize_documents_distinct_arrow(documents: DataFrame) -> DataFrame:
    """``tokenize_documents_distinct`` on the Arrow fast path: the
    normalize/split/dedup loop runs as ``bytes.translate`` +
    ``bytes.split`` + ``set`` inside a ``mapInPandas`` worker — C-speed
    memchr scans instead of a JVM regex pass plus per-token string
    allocation.  Semantics are IDENTICAL to the expression form
    (strtok tab asymmetry included — ``_strtok_fix_bytes``), pinned by
    a cross-path equivalence test and the byte-level race harness.

    This is the BULK-build path (the drop-in manifest pipeline / CLI),
    fed by whole-document rows (``read_corpus(wholetext=True)``) so the
    per-row Python overhead is paid per document, not per line.
    Measured at 8.33 GiB: the full index pipeline drops from ~24 s
    (expression tokenizer) to ~14 s — effective PARITY with the
    compiled -O2 pthreads reference (see BASELINE.md).  Registered
    oracle queries keep the declarative expression form so their plans
    stay whole-stage-codegen and pushdown-transparent; use this one
    where tokenization throughput IS the workload.  Narrow (no
    shuffle); Arrow batches are bounded by the scan partition size.
    """
    return documents.select("doc_id", "text").mapInPandas(
        _distinct_token_batches, "doc_id long, word string"
    )


# DuckDB-side equivalents (kept adjacent so the two dialects stay in sync).
# DuckDB regexp_replace needs the 'g' flag for global replacement; the
# backslash escapes are interpreted by RE2, not the SQL string literal.
SQL_TOKENS = (
    "list_filter(list_transform(regexp_split_to_array("
    "  array_to_string(list_transform(string_split({col}, chr(10)),"
    "    l -> regexp_extract(l, '^[ \\t]*[^ \\t]*[ \\t]?')"
    "         || replace(regexp_replace(l, '^[ \\t]*[^ \\t]*[ \\t]?', ''), chr(9), '')),"
    "  chr(10)),"
    " '[ \\n\\t]+'),"
    " t -> regexp_replace(translate(t,"
    " 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'),"
    " '[^a-z]', '', 'g')), w -> length(w) > 0)"
)


def sql_tokens(col: str = "text") -> str:
    return SQL_TOKENS.format(col=col)


# --------------------------------------------------------------------------
# Unicode canonicalization for homoglyph-aware dedup
# --------------------------------------------------------------------------

# Zero-width characters that make visually-identical texts hash apart
# (ZWSP, ZWNJ, ZWJ, BOM) and the common Cyrillic->Latin confusable
# pairs from the public Unicode confusables table (UTS #39) — the
# homoglyph classes that dominate crawled spam/plagiarism twins.
ZERO_WIDTH = "\u200b\u200c\u200d\ufeff"
CONFUSABLES = {
    "а": "a",  # CYRILLIC SMALL A
    "е": "e",  # CYRILLIC SMALL IE
    "о": "o",  # CYRILLIC SMALL O
    "р": "p",  # CYRILLIC SMALL ER
    "с": "c",  # CYRILLIC SMALL ES
    "х": "x",  # CYRILLIC SMALL HA
    "у": "y",  # CYRILLIC SMALL U
}


def canonical_text(col: F.Column) -> F.Column:
    """Homoglyph/zero-width canonical form, entirely JVM-side: one
    ``translate`` maps confusables to their Latin skeleton, a second
    deletes zero-width characters (``translate`` drops source chars
    with no replacement).  Pure codegen — no UDF, no regex backtracking
    — so it fuses into the scan at 100 TB."""
    c = F.translate(col, "".join(CONFUSABLES), "".join(CONFUSABLES.values()))
    return F.translate(c, ZERO_WIDTH, "")


def sql_canonical(col: str = "text") -> str:
    """The exact DuckDB equivalent as a nested ``replace`` chain (same
    character map, applied one-for-one), kept adjacent so the dialects
    cannot drift."""
    expr = col
    for src, dst in CONFUSABLES.items():
        expr = f"replace({expr}, '{src}', '{dst}')"
    for zw in ZERO_WIDTH:
        expr = f"replace({expr}, chr({ord(zw)}), '')"
    return expr
