"""Property check for the shared cross-engine hash bit-math
(functions/hashing.py): every sketch oracle's exactness rests on Spark's
md5/conv/substring and bit operators agreeing with the plain mathematical
reading of the formulas.  The DuckDB side is covered by the oracle gate;
this pins the Spark side against an independent pure-Python reference
over a few thousand adversarially-shaped strings (empty-ish, unicode,
long, numeric) so a regression in any one primitive (substring offsets,
conv overflow, shift semantics) fails loudly here rather than as an
opaque hash mismatch in a driver row.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

HLL_P = 6
RHO_MAX = 55
BLOOM_BITS = 3968
BLOOM_BPW = 62
CMS_W = 512


def _py_u60(s: str, start: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[start - 1:start + 14], 16)


def _py_rho(u: int) -> int:
    v = u >> HLL_P
    return RHO_MAX if v == 0 else RHO_MAX - v.bit_length()


def _samples() -> list[str]:
    out = [f"w{i}-{i * i}" for i in range(4000)]
    out += ["", " ", "0", "a" * 500, "ému-ü-ß", "tab\tnl\n", "0x7fff",
            "the quick brown fox", "9" * 60]
    return out


def test_spark_bitmath_matches_python_reference(spark):
    from document_processor_spark.functions.hashing import md5_h1_h2

    words = _samples()
    df = spark.createDataFrame([(w,) for w in words], "word string")
    h1, h2 = md5_h1_h2(F.col("word"))
    got = (df.select(
        "word", h1.alias("h1"), h2.alias("h2"),
        F.expr(f"CAST(conv(substring(md5(word), 1, 15), 16, 10) AS BIGINT)"
               f" & {(1 << HLL_P) - 1}").alias("bucket"),
        F.expr(f"CASE WHEN (CAST(conv(substring(md5(word), 1, 15), 16, 10)"
               f" AS BIGINT) >> {HLL_P}) = 0 THEN {RHO_MAX} ELSE {RHO_MAX}"
               f" - length(conv(CAST(conv(substring(md5(word), 1, 15), 16,"
               f" 10) AS BIGINT) >> {HLL_P}, 10, 2)) END").alias("rho"))
        .collect())
    assert len(got) == len(words)
    for r in got:
        w = r["word"]
        u1, u2 = _py_u60(w, 1), _py_u60(w, 16)
        assert r["h1"] == u1 and r["h2"] == u2, w
        assert r["bucket"] == u1 % (1 << HLL_P), w
        assert r["rho"] == _py_rho(u1), w
        # downstream derivations are pure int math once h1/h2 agree, but
        # pin the two moduli the Bloom/CMS probes use anyway
        for i in range(3):
            pos = (u1 + i * u2) % BLOOM_BITS
            assert 0 <= pos // BLOOM_BPW < 64 and 0 <= pos % BLOOM_BPW < 62
        assert 0 <= (u1 + 3 * u2) % CMS_W < CMS_W
