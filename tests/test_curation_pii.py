"""PII redaction: detection counts and masking on crafted text, plus the
derived-enrichment invariant (every doc gains exactly one email/IP/phone)."""

import pytest

from document_processor_spark.operators import curation


@pytest.fixture(scope="module")
def pii_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("pii")
    rows = [
        (1, "mail me at a.b+c@sub.example.org or call +44-123-4567", "en",
         "web"),
        (2, "server 192.168.0.1 and 8.8.8.8 uptime", "en", "web"),
        (3, "plain prose with no identifiers at all", "en", "web"),
    ]
    df = spark.createDataFrame(
        [(i, t, l, s, len(t)) for i, t, l, s in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint")
    df.coalesce(1).write.mode("overwrite").parquet(str(root / "documents.parquet"))
    return str(root)


def test_pii_counts_and_masking(spark, pii_dir):
    out = {r["doc_id"]: r for r in
           curation.q_cur_pii_redact(spark, pii_dir).collect()}
    # enrichment adds exactly one of each; doc text contributes the rest
    assert (out["1"]["n_emails"], out["1"]["n_phones"]) == (2, 2)
    assert out["2"]["n_ips"] == 3
    assert (out["3"]["n_emails"], out["3"]["n_ips"], out["3"]["n_phones"]) \
        == (1, 1, 1)
    for r in out.values():  # nothing unmasked survives in the tail
        assert "@" not in r["redacted_tail"]
        assert "<EMAIL>" in r["redacted_tail"] or "<PHONE>" in r["redacted_tail"]
