"""Column-expression helpers — all JVM-side built-ins (whole-stage codegen),
no Python UDFs. The per-row work (tokenize, window-id arithmetic, n-grams)
stays inside Catalyst so the scan→explode→agg pipeline is fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def codepoint_tokens(text_col) -> Column:
    """UTF codepoints of a string as array<int> — the deterministic,
    engine-agnostic tokenizer shared with the DuckDB oracles.

    Analog of the reference's char-stream ingestion
    (utilities/DatasetReader.java + utilities/StringKeyMapper.java): every
    character becomes one integer token.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.transform(F.split(c, ""), lambda ch: F.ascii(ch))


def window_id(pos_col, span: int) -> Column:
    """Dyadic window id: floor(pos / span). Pure integer arithmetic — the
    implicit-tree geometry of tree/TreeLayout.java:21-35 with no tree object."""
    p = F.col(pos_col) if isinstance(pos_col, str) else pos_col
    return (p / F.lit(span)).cast("long")


def with_positions(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """Explode tokens to one row per (doc, pos, token). posexplode keeps the
    0-based in-doc position."""
    other = [c for c in df.columns if c != tokens_col]
    return df.select(*other, F.posexplode(tokens_col).alias("pos", "token"))


def ngram_struct(tokens_col, n: int) -> Column:
    """Sliding n-grams of an int array as array<array<int>> (JVM-side):
    element i = slice(tokens, i+1, n). Used by oracle-parity queries; the
    sketch-build path packs n-grams in numpy instead (hashing.pack_ngrams_u64)."""
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    # guard: sequence(0, negative) would generate a DESCENDING sequence
    return F.when(
        F.size(t) >= n,
        F.transform(F.sequence(F.lit(0), F.size(t) - n), lambda i: F.slice(t, i + 1, n)),
    ).otherwise(F.array().cast("array<array<int>>"))


def subsequence_positions(tokens_col, pattern: list[int]) -> Column:
    """Exact 0-based start positions of ``pattern`` inside an int array —
    pure SQL higher-order functions, whole-stage codegen'd.

    This is the brute-force oracle (role of PMIndex/RegexIndex.java:10-69)
    AND the verification primitive for surviving windows
    (search/VerifierLinearLeafProbe.java:16-150).
    """
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    m = len(pattern)
    pat = F.array(*[F.lit(int(x)) for x in pattern])
    # guard: sequence(0, negative) would generate a DESCENDING sequence
    return F.when(
        F.size(t) >= m,
        F.filter(F.sequence(F.lit(0), F.size(t) - m), lambda i: F.slice(t, i + 1, m) == pat),
    ).otherwise(F.array().cast("array<int>"))


def hamming_positions(tokens_col, pattern: list[int], d: int) -> Column:
    """0-based start positions where ``pattern`` matches with at most ``d``
    token MISMATCHES (Hamming distance over the aligned window) — the
    verification primitive of the k-mismatch searches and their brute-force
    oracle. Pure SQL higher-order functions: per candidate start, zip the
    length-m slice against the pattern and count inequalities. Only full
    windows qualify (a start within m of the end is never a match)."""
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    m = len(pattern)
    pat = F.array(*[F.lit(int(x)) for x in pattern])

    def near(i):
        diffs = F.zip_with(F.slice(t, i + 1, m), pat, lambda x, y: x != y)
        return F.size(F.filter(diffs, lambda b: b)) <= F.lit(int(d))

    # guard: sequence(0, negative) would generate a DESCENDING sequence
    return F.when(
        F.size(t) >= m,
        F.filter(F.sequence(F.lit(0), F.size(t) - m), near),
    ).otherwise(F.array().cast("array<int>"))


def wildcard_subsequence_positions(tokens_col, pattern: list) -> Column:
    """Exact 0-based start positions of a pattern with WILDCARDS (``None``
    entries match any single token) and CHARACTER CLASSES (a list/tuple/set
    entry matches any of its members — regex-lite ``[abc]``) inside an int
    array — the verification primitive of wildcard_pattern_search and its
    brute-force oracle. Pure SQL higher-order functions: per candidate
    start, a conjunction of equality (literal) / isin (class) conditions;
    wildcard offsets impose no condition."""
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    m = len(pattern)
    lits, classes = [], []
    for j, v in enumerate(pattern):
        if v is None:
            continue
        if isinstance(v, (list, tuple, set, frozenset)):
            classes.append((j, sorted(int(x) for x in v)))
        else:
            lits.append((j, int(v)))

    def matches(i):
        cond = F.lit(True)
        for j, v in lits:
            cond = cond & (F.element_at(t, (i + j + 1).cast("int")) == F.lit(v))
        for j, vs in classes:
            cond = cond & F.element_at(t, (i + j + 1).cast("int")).isin(vs)
        return cond

    # guard: sequence(0, negative) would generate a DESCENDING sequence
    return F.when(
        F.size(t) >= m,
        F.filter(F.sequence(F.lit(0), F.size(t) - m), matches),
    ).otherwise(F.array().cast("array<int>"))
