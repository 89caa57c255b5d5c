"""Fuzzy decontamination — invariants the hash gate can't see: an exact
copy of an eval document collides in EVERY band (identical shingle sets
give identical minhashes), a vocabulary-disjoint document collides in
none, and the whole screen matches a pure-Python recompute of the r=1
band contract.
"""

from __future__ import annotations

import hashlib

from document_processor_spark.operators.curation import (
    EVAL_MOD,
    q_cur_fuzzy_decontaminate,
)
from document_processor_spark.operators.dedup import (
    _MINHASH_AB,
    MINHASH_P,
    N_BANDS,
)


def _shingles(text: str) -> list[str]:
    ws = text.split(" ")
    if len(ws) < 3:
        return []
    seen, out = set(), []
    for i in range(len(ws) - 2):
        s = " ".join(ws[i:i + 3])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def _sig(text: str, band: int) -> int:
    a, b = _MINHASH_AB[band]
    xs = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MINHASH_P
          for s in _shingles(text)]
    return min((a * x + b) % MINHASH_P for x in xs)


def _python_screen(docs: dict[int, str]) -> dict[int, tuple[int, bool]]:
    eval_sigs = {(b, _sig(t, b))
                 for d, t in docs.items() if d % EVAL_MOD == 0 and _shingles(t)
                 for b in range(N_BANDS)}
    out = {}
    for d, t in docs.items():
        if d % EVAL_MOD == 0 or not _shingles(t):
            continue
        hit = sum((b, _sig(t, b)) in eval_sigs for b in range(N_BANDS))
        out[d] = (hit, hit >= 1)
    return out


def test_fuzzy_decontaminate_matches_python_recompute(spark, tmp_path):
    eval_text = "the quick brown fox jumps over the lazy dog tonight"
    docs = {
        0: eval_text,                                   # eval (0 % EVAL_MOD == 0)
        1: eval_text,                                   # exact copy -> all bands hit
        2: "zebra yak xylophone walrus vulture turtle snake rhino",  # disjoint
        3: "the quick brown fox jumps over a different dog entirely",  # partial
        4: "xx yy",                                     # < 3 words -> excluded
    }
    df = spark.createDataFrame(
        [(d, t, "en", "src0", len(t)) for d, t in docs.items()],
        "doc_id long, text string, lang string, source string, n_chars long")
    sf = tmp_path / "sf"
    sf.mkdir()
    df.coalesce(1).write.parquet(str(sf / "documents.parquet"))

    got = {r["doc_id"]: (r["n_bands_hit"], r["contaminated"])
           for r in q_cur_fuzzy_decontaminate(spark, str(sf)).collect()}
    assert got == _python_screen(docs)
    assert got[1] == (N_BANDS, True), "exact eval copy must hit every band"
    assert got[2] == (0, False), "disjoint vocabulary must not collide"
    assert 4 not in got, "sub-shingle docs are excluded, not zero-rowed"
