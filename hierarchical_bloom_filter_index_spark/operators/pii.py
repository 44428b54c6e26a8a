"""PII detection and redaction over document corpora.

Training-data pipelines scrub personally identifiable information before
anything else touches the text. This module does it ENTIRELY JVM-side:
detection is ``regexp_count`` and rewriting is ``regexp_replace`` — both
codegen'd string expressions, zero shuffles, no Python in the row path —
so a 100 TB redaction pass is exactly one corpus scan.

Cross-engine contract: every built-in pattern stays inside the regex
subset where java.util.regex (Spark) and RE2 (DuckDB) agree — literal
classes, ``\\d``/``\\b``, bounded ``{m,n}`` repetition, alternation,
greedy leftmost-first matching; NO lookaround, NO backreferences (RE2
lacks them). Kinds are applied in a FIXED order (the PII_PATTERNS order),
each kind counted on the text state produced by the previous kinds'
replacements, so both engines produce byte-identical clean text and
counts — the driver oracle is an equality, not an approximation.

Reference parity: the reference engine has no PII surface; this is part
of the LLM-pipeline extension mandated by the build brief (same family as
operators/contamination.py scrubbing, which rewrites by byte-span; this
rewrites by pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

# Fixed application order: URLs first (an email-shaped substring inside a
# query string must be swallowed by the URL token, not half-redacted),
# then emails, then dotted-quad IPs, then dashed phone numbers. Every
# pattern is Java/RE2-common (see module docstring).
PII_PATTERNS: dict[str, str] = {
    "url": r"https?://[^\s]+",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}(\.\d{1,3}){3}\b",
    "phone": r"\b\d{3}[- ]\d{3}[- ]\d{4}\b",
}


def _check_kinds(kinds) -> list[str]:
    ks = list(PII_PATTERNS) if kinds is None else list(kinds)
    bad = [k for k in ks if k not in PII_PATTERNS]
    if bad or not ks or len(set(ks)) != len(ks):
        raise ValueError(
            f"pii: kinds must be unique members of {list(PII_PATTERNS)}, "
            f"got {ks}")
    # re-impose the canonical order regardless of caller order: application
    # order changes the output on overlapping matches, and a silent
    # caller-order dependence would make twin queries unreproducible
    return [k for k in PII_PATTERNS if k in ks]


def redact_pii(
    docs: DataFrame,
    kinds: list[str] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_fmt: str = "<{kind}>",
) -> DataFrame:
    """Per-document PII redaction: returns (doc_id, clean_text,
    n_<kind>...) where each kind's matches are replaced by its token
    (e.g. ``<EMAIL>``) and counted. Counting happens on the text state
    BEFORE that kind's own replacement but AFTER all earlier kinds' — the
    sequential semantics both engines reproduce exactly. One codegen'd
    projection; zero shuffles; no Python in the row path."""
    ks = _check_kinds(kinds)
    cur: Column = F.col(text_col)
    out = [F.col(id_col).alias("doc_id")]
    counts = []
    for k in ks:
        pat = PII_PATTERNS[k]
        counts.append(
            F.regexp_count(cur, F.lit(pat)).cast("int").alias(f"n_{k}"))
        cur = F.regexp_replace(cur, pat, token_fmt.format(kind=k.upper()))
    return docs.select(*out, cur.alias("clean_text"), *counts)


def pii_totals_by_source(
    docs: DataFrame,
    kinds: list[str] | None = None,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Corpus PII dashboard: per-source totals of each kind plus the count
    of documents carrying ANY PII — the triage view deciding which sources
    need scrubbing before training. One map-side-combined groupBy over the
    per-doc counts (the only exchange moves one row per source)."""
    ks = _check_kinds(kinds)
    # reuse redact_pii's sequential fold verbatim (id_col carries the
    # source); Catalyst prunes the unused clean_text away, so this costs
    # exactly the count expressions
    per = redact_pii(docs, ks, text_col=text_col, id_col=source_col)
    return (
        per.groupBy(F.col("doc_id").alias("source"))
        .agg(*[F.sum(f"n_{k}").cast("long").alias(f"n_{k}") for k in ks],
             F.sum(
                 (sum(F.col(f"n_{k}") for k in ks) > 0).cast("long")
             ).alias("n_docs_with_pii"))
    )


def redact_pii_stream(
    stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    kinds: list[str] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """STREAMING ingest-time PII scrub: arriving doc files drained through
    a file stream, each micro-batch redacted via foreachBatch with the
    shared replay guard (at-least-once -> exactly-once appends). redact_pii
    is stateless per document, so the output minus batch_id equals the
    batch run over everything ingested — the driver parity gate. Returns
    the started availableNow query."""
    from ..streaming.incremental import replay_guarded_append

    ks = _check_kinds(kinds)

    def _do(batch_df: DataFrame) -> DataFrame:
        return redact_pii(batch_df, ks, text_col=text_col, id_col=id_col)

    return (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: replay_guarded_append(out_path, bdf, bid, _do)
        )
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def pseudonymize_numeric(
    df: DataFrame, col: str, seed: int, out_col: str | None = None
) -> DataFrame:
    """Deterministic keyed pseudonymization of a BIGINT identifier:
    ``out_col`` = fixed-width lowercase hex of hash64(value, seed).
    hash64 is a BIJECTION on the 64-bit domain (seeded xor + the SplitMix64
    permutation), so pseudonyms are COLLISION-FREE: joinability and
    group-by cardinalities survive exactly — the tokenization step before
    training data leaves the trust boundary.

    Threat model, honestly: SplitMix64 is not a cryptographic MAC — an
    adversary holding the derived seed constant can invert it; the
    contract here is cross-run/cross-engine deterministic linkage (the
    DuckDB twin reproduces every pseudonym bit-for-bit), not resistance
    to a key-holding attacker. Swap a keyed crypto hash for adversarial
    settings; the pipeline shape is identical.

    Vectorized Arrow kernel, no shuffle (a pure projection)."""
    from pyspark.sql.functions import pandas_udf

    from ..sketches.hashing import hash64

    name = out_col or f"{col}_pid"

    @pandas_udf("string")
    def pid(vals: pd.Series) -> pd.Series:
        iv = vals.to_numpy(dtype=np.int64)
        hx = hash64(iv, seed).astype(">u8").tobytes().hex()
        return pd.Series([hx[16 * i:16 * i + 16] for i in range(len(iv))])

    # NULL -> NULL handled at the PLAN level, never inside the UDF: a
    # nullable long batch reaches pandas as float64 + NaN, which both
    # crashes to_numpy(int64) AND silently rounds |id| > 2^53 for every
    # OTHER value in the batch (a value's pseudonym must not depend on its
    # batch neighbors). coalesce keeps the Arrow path int64; the outer
    # when() restores the NULLs.
    c = F.col(col).cast("long")
    return df.withColumn(
        name,
        F.when(c.isNull(), F.lit(None).cast("string"))
        .otherwise(pid(F.coalesce(c, F.lit(0)))))


def k_anonymity_report(
    df: DataFrame, qi_cols: tuple[str, ...], k: int
) -> DataFrame:
    """Quasi-identifier combinations carried by FEWER than ``k`` rows —
    the exact re-identification risk report (Sweeney k-anonymity): each
    output row (qi..., n) is a group an attacker could narrow to under k
    individuals. One groupBy over one scan; integer-exact."""
    if k < 2:
        raise ValueError("k_anonymity_report: k must be >= 2")
    if not qi_cols:
        raise ValueError("k_anonymity_report: need at least one QI column")
    return (df.groupBy(*qi_cols)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") < k))


def k_suppress(df: DataFrame, qi_cols: tuple[str, ...], k: int) -> DataFrame:
    """The suppression twin: rows whose QI combination reaches ``k``
    anonymity (violating groups removed whole — a router cannot keep a
    survivor subset without re-violating). Left-anti against the report's
    combos; the report IS the certificate of what was dropped."""
    bad = k_anonymity_report(df, qi_cols, k).select(*qi_cols)
    return df.join(bad, list(qi_cols), "left_anti")
