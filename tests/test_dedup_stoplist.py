"""Hot-shingle stoplist of the n-gram Jaccard inverted index: the default
threshold is above any fixture posting length (results exact), and dropping
is never silent — the dropped-shingle count is logged."""

import logging

from document_processor_spark.operators import dedup

SF_DIR = "/root/testdata/sf0.001"


def _pairs(df):
    return sorted((r["d1"], r["d2"], r["jaccard"]) for r in df.collect())


def test_default_threshold_is_above_fixture_and_exact(spark, caplog):
    with caplog.at_level(logging.WARNING, logger=dedup.__name__):
        got = _pairs(dedup.q_dedup_ngram_jaccard(spark, SF_DIR))
    assert not [r for r in caplog.records if "stoplist" in r.message]
    # a sky-high threshold (no stoplist possible) gives the identical result
    unlimited = _pairs(dedup.q_dedup_ngram_jaccard(
        spark, SF_DIR, hot_shingle_max=10**12))
    assert got == unlimited


def test_stoplist_triggers_and_logs(spark, caplog):
    with caplog.at_level(logging.WARNING, logger=dedup.__name__):
        out = dedup.q_dedup_ngram_jaccard(spark, SF_DIR, hot_shingle_max=0)
        n = out.count()
    recs = [r for r in caplog.records if "stoplist" in r.getMessage()]
    assert len(recs) == 1
    assert "dropping" in recs[0].getMessage()
    # threshold 0 stop-lists every shingle -> empty inverted index
    assert n == 0
