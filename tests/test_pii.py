"""O82 — PII scrub pattern behavior (functions/pii.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fischer_spark.functions.pii import pii_count, pii_redact, with_pii_stats

CASES = [
    # (input, expected_redacted, n_email, n_ssn, n_phone, n_ipv4)
    ("mail me at jane.doe+spam@sub.example.co.uk today",
     "mail me at <EMAIL> today", 1, 0, 0, 0),
    ("ssn 123-45-6789 phone 415-555-1234",
     "ssn <SSN> phone XXX-XXX-1234", 0, 1, 1, 0),
    ("server 192.168.0.1 and 10.0.0.255",
     "server <IP> and <IP>", 0, 0, 0, 2),
    # order: the SSN must not be half-eaten by the phone pattern
    ("123-45-6789", "<SSN>", 0, 1, 0, 0),
    # negatives: dates, versions, bare numbers, order ids
    ("released 2024-01-01 v1.2.3 build 12345 order 12-3456",
     "released 2024-01-01 v1.2.3 build 12345 order 12-3456", 0, 0, 0, 0),
    # a dotted-quad "host" is not an email (no alphabetic TLD) — the
    # address part survives, the IP inside it is still scrubbed
    ("x@1.2.3.4 rest", "x@<IP> rest", 0, 0, 0, 1),
    ("no pii here", "no pii here", 0, 0, 0, 0),
]


def test_pii_redact_and_counts(spark):
    df = spark.createDataFrame([(t,) for t, *_ in CASES], "text string")
    out = with_pii_stats(df, "text").toPandas()
    by = {r.text: r for r in out.itertuples()}
    for text, want, ne, ns, np_, ni in CASES:
        r = by[text]
        assert r.text_redacted == want, (text, r.text_redacted)
        assert (r.n_email, r.n_ssn, r.n_phone, r.n_ipv4) == (ne, ns, np_, ni), text


def test_pii_full_drop_mode(spark):
    df = spark.createDataFrame([("call 415-555-1234",)], "text string")
    got = df.select(pii_redact("text", keep_last4=False).alias("r")).first().r
    assert got == "call <PHONE>"


def test_pii_stays_jvm_side(spark):
    df = spark.createDataFrame([("a@b.co",)], "text string")
    plan = (
        with_pii_stats(df, "text")._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan  # pure regexp codegen, no UDF


def test_pii_count_matches_redaction(spark):
    """Counting and replacing must agree on what matches."""
    df = spark.createDataFrame(
        [("a@b.co c@d.io 1.2.3.4 415-555-0000 123-45-6789",)], "text string"
    )
    r = df.select(
        pii_redact("text").alias("red"),
        *(pii_count("text", k).alias(k) for k in ("email", "ssn", "phone", "ipv4")),
    ).first()
    assert r.red.count("<EMAIL>") == r.email == 2
    assert r.red.count("<SSN>") == r.ssn == 1
    assert r.red.count("XXX-XXX-") == r.phone == 1
    assert r.red.count("<IP>") == r.ipv4 == 1
