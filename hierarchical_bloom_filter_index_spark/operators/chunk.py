"""Document chunking: fixed-size overlapping windows with provenance.

The preprocessing step between a raw corpus and an embedding / RAG /
context-window pipeline: split every document into chunks of bounded
size with a configurable overlap, keeping (doc_id, chunk_idx,
char_start) provenance so any downstream hit maps back to its source
span. Entirely JVM-side — sequence() for the start offsets, substring /
slice for the cut, one explode — zero shuffles, no Python in the row
path, so a 100 TB chunking pass is one codegen'd scan (the same shape
as operators/pii.redact_pii).

Two modes sharing one geometry: ``chunk_by_chars`` (byte-offset spans —
substring provenance is exact) and ``chunk_by_words`` (whitespace-token
windows rejoined with single spaces — the RAW single-space discipline of
operators/text.py, so word offsets are exact prefix positions). Both are
deterministic pure functions of (text, size, overlap) and both have
DuckDB twins (generate_series + substr / list slicing), so the driver
gates are value equalities.

Geometry: starts = 0, stride, 2*stride, ... for stride = size - overlap,
over every start < length; the final chunk is allowed to run short
(never empty). Empty documents produce NO chunks (there is no span to
point back to) — documented, not silent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _check_geometry(size: int, overlap: int) -> int:
    if size < 1:
        raise ValueError(f"chunk: size must be >= 1, got {size}")
    if overlap < 0 or overlap >= size:
        raise ValueError(
            f"chunk: need 0 <= overlap < size, got overlap={overlap} "
            f"size={size}")
    return size - overlap


def chunk_by_chars(
    docs: DataFrame,
    size: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_idx, char_start, chunk): character-window chunks.
    char_start is 0-based; chunk = text[char_start : char_start + size]
    (short tail allowed). One sequence+explode projection, zero
    shuffles."""
    stride = _check_geometry(size, overlap)
    t = F.col(text_col)
    starts = F.sequence(
        F.lit(0), F.greatest(F.length(t) - 1, F.lit(0)), F.lit(stride))
    return (
        docs.filter(F.length(t) > 0)
        .select(
            F.col(id_col).alias("doc_id"), t.alias("_t"),
            F.posexplode(starts).alias("chunk_idx", "char_start"))
        .select(
            "doc_id",
            "chunk_idx",
            "char_start",
            # substring is 1-based
            F.substring(F.col("_t"), F.col("char_start") + 1, size
                        ).alias("chunk"))
    )


def chunk_by_words(
    docs: DataFrame,
    size: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_idx, word_start, chunk, n_words): word-window
    chunks — ``size`` whitespace tokens per chunk, ``overlap`` tokens
    shared between neighbors, rejoined with single spaces (the corpus
    word discipline). word_start is the 0-based index into the doc's
    word sequence. Documents with no words produce no chunks."""
    stride = _check_geometry(size, overlap)
    t = F.col(text_col)
    ws = F.filter(F.split(t, " "), lambda w: w != F.lit(""))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(F.col("_ws")) - 1, F.lit(0)),
        F.lit(stride))
    return (
        docs.select(F.col(id_col).alias("doc_id"), ws.alias("_ws"))
        .filter(F.size("_ws") > 0)
        .select(
            "doc_id", "_ws",
            F.posexplode(starts).alias("chunk_idx", "word_start"))
        .select(
            "doc_id",
            "chunk_idx",
            "word_start",
            # slice is 1-based
            F.array_join(
                F.slice(F.col("_ws"), F.col("word_start") + 1, size), " "
            ).alias("chunk"),
            F.least(
                F.size("_ws") - F.col("word_start"), F.lit(size)
            ).alias("n_words"))
    )
