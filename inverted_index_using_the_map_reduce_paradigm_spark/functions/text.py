"""Tokenizer / normalizer column expressions.

Reproduces the reference tokenizer semantics exactly
(``/root/reference/main.c++:100-128``):

  * a token is a maximal whitespace-separated run (``strtok_r`` on
    ``" \\n\\t"`` -- main.c++:102,143);
  * normalization lowercases ``A-Z`` and deletes every char outside
    ``a-z`` (digits, punctuation, non-ASCII) *in place*, so mid-token
    punctuation JOINS the fragments: ``don't`` -> ``dont``,
    ``don't2x`` -> ``dontx`` (main.c++:110-124);
  * tokens empty after normalization are dropped (main.c++:125-128).

Everything is built-in ``pyspark.sql.functions`` -- no UDFs -- so the
whole chain stays inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_word(col: Column) -> Column:
    """lowercase then strip every non-[a-z] char (reference main.c++:110-124)."""
    return F.regexp_replace(F.lower(col), "[^a-z]", "")


def tokens_of(text: Column) -> Column:
    """Array of normalized non-empty words from a text column.

    Split on the reference's EXACT delimiter set ``" \\n\\t"``
    (strtok_r, main.c++:102,143) — not ``\\s``: a mid-token ``\\r`` or
    ``\\f`` is erased by the normalizer and JOINS its neighbors in the
    reference, so it must not split here either.  Normalize each token,
    drop empties — ``filter`` after ``transform`` keeps it all in one
    projection.
    """
    return F.filter(
        F.transform(F.split(text, "[ \n\t]+"), normalize_word),
        lambda w: F.length(w) > 0,
    )


def tokenize_documents(documents: DataFrame) -> DataFrame:
    """(doc_id, word) stream: one row per token occurrence.

    Column-prunes to (doc_id, text) before the explode so a parquet scan
    reads only two columns at 100 TB.
    """
    return documents.select(
        "doc_id", F.explode(tokens_of(F.col("text"))).alias("word")
    )


# DuckDB-side equivalents (kept adjacent so the two dialects stay in sync).
# DuckDB regexp_replace needs the 'g' flag for global replacement.
SQL_TOKENS = (
    "list_filter(list_transform(regexp_split_to_array({col}, '[ \\n\\t]+'),"
    " t -> regexp_replace(lower(t), '[^a-z]', '', 'g')), w -> length(w) > 0)"
)


def sql_tokens(col: str = "text") -> str:
    return SQL_TOKENS.format(col=col)
