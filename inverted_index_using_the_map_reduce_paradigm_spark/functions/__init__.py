"""Reusable column-expression helpers (all JVM-side, codegen-friendly)."""

from .text import normalize_word, tokens_of
from .vectors import cosine_similarity, dot, l2_norm

__all__ = ["normalize_word", "tokens_of", "cosine_similarity", "dot", "l2_norm"]
