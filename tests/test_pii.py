"""PII redaction: sequential-fold semantics vs python re (same
leftmost-greedy subset as Java regex / RE2), cross-engine byte-parity
with DuckDB, dashboard totals, validation."""

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from hierarchical_bloom_filter_index_spark.operators.pii import (
    PII_PATTERNS, pii_totals_by_source, redact_pii)

ROWS = [
    ("a", "mail bob.smith+x@ex-corp.co.uk now", "s1"),
    ("b", "see https://ex.com/u?e=a@b.co and 10.0.0.1 or 255.255.255.255",
     "s1"),
    ("c", "call 555-123-4567 or 555 867 5309", "s2"),
    ("d", "email@at-end.io", "s2"),
    ("e", "a@b.io x@y.org 1.2.3.4 1234.5.6.7 999-99-9999", "s2"),
    ("f", "http://x a@b.c 12.34.56.78.90 edge...dots@d.org", "s3"),
    ("g", "überstraße a@b.de 10.1.1.1käse", "s3"),
    ("h", "no pii at all", "s3"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        ROWS, "doc_id string, text string, source string")


def _py_redact(text, kinds):
    cur, counts = text, {}
    for k in kinds:
        counts[k] = len(re.findall(PII_PATTERNS[k], cur))
        cur = re.sub(PII_PATTERNS[k], f"<{k.upper()}>", cur)
    return cur, counts


def test_redact_matches_python_re(spark, docs):
    ks = list(PII_PATTERNS)
    got = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert len(got) == len(ROWS)
    for did, text, _ in ROWS:
        clean, counts = _py_redact(text, ks)
        assert got[did]["clean_text"] == clean, did
        for k in ks:
            assert got[did][f"n_{k}"] == counts[k], (did, k)


def test_redact_matches_duckdb(spark, docs):
    got = {r["doc_id"]: tuple(r)[1:] for r in redact_pii(docs).collect()}
    con = duckdb.connect()
    con.execute("create table t(doc_id varchar, text varchar)")
    con.executemany("insert into t values (?, ?)",
                    [(d, t) for d, t, _ in ROWS])
    cur, counts = "text", []
    for k, pat in PII_PATTERNS.items():
        counts.append(
            f"CAST(len(regexp_extract_all({cur}, '{pat}')) AS INTEGER)"
            f" AS n_{k}")
        cur = f"regexp_replace({cur}, '{pat}', '<{k.upper()}>', 'g')"
    duck = {r[0]: tuple(r)[1:] for r in con.sql(
        f"SELECT doc_id, {cur} AS clean_text, {', '.join(counts)} FROM t"
    ).fetchall()}
    assert got == duck


def test_kind_subset_and_order_independence(spark, docs):
    # caller order must not matter: canonical application order is imposed
    a = redact_pii(docs, kinds=["phone", "email"]).collect()
    b = redact_pii(docs, kinds=["email", "phone"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    row = {r["doc_id"]: r for r in a}["b"]
    # without the url kind running first, the URL is not shielded: the
    # email-shaped query substring IS redacted (and the scheme survives)
    assert row["clean_text"].startswith("see https://ex.com/u?e=<EMAIL>")
    assert row["n_email"] == 1
    assert "10.0.0.1" in row["clean_text"]  # ipv4 kind not requested


def test_url_swallows_embedded_email(spark, docs):
    # full-kind pass: the email-shaped substring inside the URL query is
    # redacted as part of <URL>, not as a second <EMAIL>
    row = {r["doc_id"]: r for r in redact_pii(docs).collect()}["b"]
    assert row["clean_text"] == "see <URL> and <IPV4> or <IPV4>"
    assert row["n_url"] == 1 and row["n_email"] == 0 and row["n_ipv4"] == 2


def test_totals_by_source(spark, docs):
    ks = list(PII_PATTERNS)
    got = {r["source"]: r for r in pii_totals_by_source(docs).collect()}
    want = {}
    for _, text, src in ROWS:
        _, c = _py_redact(text, ks)
        w = want.setdefault(src, {k: 0 for k in ks} | {"with": 0})
        for k in ks:
            w[k] += c[k]
        w["with"] += 1 if any(c.values()) else 0
    assert set(got) == set(want)
    for s, w in want.items():
        for k in ks:
            assert got[s][f"n_{k}"] == w[k], (s, k)
        assert got[s]["n_docs_with_pii"] == w["with"], s


def test_validation(spark, docs):
    with pytest.raises(ValueError):
        redact_pii(docs, kinds=["email", "email"])
    with pytest.raises(ValueError):
        redact_pii(docs, kinds=["nope"])
    with pytest.raises(ValueError):
        redact_pii(docs, kinds=[])


def test_redact_stream_parity_and_replay(spark, docs, tmp_path):
    from hierarchical_bloom_filter_index_spark.operators.pii import (
        redact_pii_stream)

    d = docs.select("doc_id", "text")
    work = str(tmp_path)
    d.filter(F.col("doc_id") < "e").write.mode("overwrite").parquet(
        f"{work}/in")
    d.filter(F.col("doc_id") >= "e").write.mode("append").parquet(
        f"{work}/in")

    def drain(chk):
        stream = spark.readStream.schema(d.schema).option(
            "maxFilesPerTrigger", "1").parquet(f"{work}/in")
        q = redact_pii_stream(stream, f"{work}/out", chk)
        assert q.awaitTermination(120)

    drain(f"{work}/chk1")
    got = sorted(map(tuple, spark.read.parquet(f"{work}/out")
                     .drop("batch_id").collect()))
    want = sorted(map(tuple, redact_pii(d).collect()))
    assert got == want and got

    # full-replay drill: a FRESH checkpoint redelivers every batch; the
    # replay guard must leave the output byte-identical
    drain(f"{work}/chk2")
    again = sorted(map(tuple, spark.read.parquet(f"{work}/out")
                       .drop("batch_id").collect()))
    assert again == got


# ---------------------------------------------------------------------------
# privacy ops: pseudonymization + k-anonymity
# ---------------------------------------------------------------------------
def test_pseudonymize_bijective_and_deterministic(spark):
    import numpy as np

    from hierarchical_bloom_filter_index_spark.operators.pii import (
        pseudonymize_numeric,
    )
    from hierarchical_bloom_filter_index_spark.sketches.hashing import hash64

    ids = [0, 1, -1, 2**62, -2**62, 42, 42]
    df = spark.createDataFrame([(i,) for i in ids], "uid long")
    out = pseudonymize_numeric(df, "uid", seed=9, out_col="pid").collect()
    got = {r["uid"]: r["pid"] for r in out}
    # bit-exact vs the kernel, fixed-width lowercase hex
    for i in set(ids):
        want = format(int(hash64(np.asarray([i]), 9)[0]), "016x")
        assert got[i] == want
    # same value -> same pseudonym; distinct values -> distinct (bijection)
    assert len({r["pid"] for r in out}) == len(set(ids))


def test_k_anonymity_report_and_suppress(spark):
    from hierarchical_bloom_filter_index_spark.operators.pii import (
        k_anonymity_report,
        k_suppress,
    )

    rows = ([("a", "x")] * 5 + [("b", "x")] * 2 + [("c", "y")] * 1)
    df = spark.createDataFrame(rows, "u string, t string")
    rep = {(r["u"], r["t"]): r["n"]
           for r in k_anonymity_report(df, ("u", "t"), 3).collect()}
    assert rep == {("b", "x"): 2, ("c", "y"): 1}
    kept = k_suppress(df, ("u", "t"), 3).collect()
    assert len(kept) == 5 and all(r["u"] == "a" for r in kept)
    with pytest.raises(ValueError):
        k_anonymity_report(df, ("u",), 1)
    with pytest.raises(ValueError):
        k_anonymity_report(df, (), 3)


def test_pseudonymize_null_passthrough(spark):
    from hierarchical_bloom_filter_index_spark.operators.pii import (
        pseudonymize_numeric,
    )

    df = spark.createDataFrame([(1,), (None,), (2,)], "uid long")
    out = {r["uid"]: r["pid"]
           for r in pseudonymize_numeric(df, "uid", seed=3, out_col="pid").collect()}
    assert out[None] is None and out[1] is not None and out[2] is not None


def test_pseudonymize_large_ids_with_nulls_exact(spark):
    import numpy as np

    from hierarchical_bloom_filter_index_spark.operators.pii import (
        pseudonymize_numeric,
    )
    from hierarchical_bloom_filter_index_spark.sketches.hashing import hash64

    # ids above 2^53 in the SAME frame as a NULL: the float64+NaN Arrow
    # path would round them before hashing — the plan-level NULL handling
    # must keep the int64 path exact
    big = 9007199254740993  # 2^53 + 1
    df = spark.createDataFrame([(big,), (big - 1,), (None,)], "uid long")
    got = {r["uid"]: r["pid"]
           for r in pseudonymize_numeric(df, "uid", seed=5, out_col="pid").collect()}
    for v in (big, big - 1):
        want = format(int(hash64(np.asarray([v]), 5)[0]), "016x")
        assert got[v] == want, v
    assert got[None] is None and got[big] != got[big - 1]
