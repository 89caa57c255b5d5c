"""Winnowing fingerprint (ta_winnow) vs an independent pure-Python
implementation of Schleimer et al.'s local-minima selection."""

import hashlib

from document_processor_spark.operators import text_analysis as ta

SF_DIR = "/root/testdata/sf0.001"


def py_winnow(text: str) -> list[int]:
    t = text.lower()
    k, w, p = ta.WINNOW_K, ta.WINNOW_W, ta.WINNOW_P
    if len(t) >= k:
        hs = [int(hashlib.md5(t[i:i + k].encode()).hexdigest()[:15], 16) % p
              for i in range(len(t) - k + 1)]
    else:
        hs = []
    if len(hs) >= w:
        fps = {min(hs[j:j + w]) for j in range(len(hs) - w + 1)}
    else:
        fps = set(hs)
    return sorted(fps)


def test_winnow_matches_python_reference(spark):
    import pyarrow.parquet as pq
    texts = {r["doc_id"]: r["text"]
             for r in pq.read_table(f"{SF_DIR}/documents.parquet").to_pylist()}
    out = {r["doc_id"]: r for r in ta.q_winnow(spark, SF_DIR).collect()}
    assert set(out) == set(texts)
    for doc_id, text in texts.items():
        fps = py_winnow(text)
        r = out[doc_id]
        assert r["n_fingerprints"] == len(fps)
        assert r["min_fp"] == (fps[0] if fps else -1)
        digest = hashlib.md5(",".join(map(str, fps)).encode()).hexdigest()
        assert r["winnow_digest"] == digest


def test_winnow_guarantee_shared_substring():
    """Any two texts sharing a substring of length >= W+K-1 share at least
    one fingerprint (the winnowing guarantee)."""
    shared = "x" * 3 + "abcdefghijklmno" + "y" * 3  # >= 11-char common run
    a = py_winnow("PREFIX-ONE " + shared)
    b = py_winnow("a totally different head " + shared + " and tail")
    assert set(a) & set(b)
