"""BPE merge training and PMI collocation mining — invariants the hash
gate can't see: the doubled-space replace trick implements exact greedy
leftmost-first BPE (overlapping runs, cross-token-boundary safety), and
the integer lift is the exact cross-multiplied PMI ordering.
"""

from __future__ import annotations

from collections import Counter

from document_processor_spark.operators.text_analysis import (
    BPE_ROUNDS,
    PMI_LIFT_Q,
    PMI_MIN_COUNT,
    q_bpe_merges,
    q_pmi_collocations,
)


def _python_bpe(word_counts: dict[str, int], rounds: int):
    """Reference greedy BPE: count adjacent pairs weighted by word count,
    merge the max-count pair (lexicographic-min tie-break on 'w1 w2')
    leftmost-first within each sequence."""
    vocab = [(list(w), c) for w, c in sorted(word_counts.items())]
    merges = []
    for r in range(rounds):
        pairs = Counter()
        for seq, c in vocab:
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += c
        mc = max(pairs.values())
        w1, w2 = min((p for p, c in pairs.items() if c == mc),
                     key=lambda p: f"{p[0]} {p[1]}")
        merges.append((r, w1, w2, w1 + w2, mc))
        new_vocab = []
        for seq, c in vocab:
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == w1 and seq[i + 1] == w2:
                    out.append(w1 + w2)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_vocab.append((out, c))
        vocab = new_vocab
    return merges


def _corpus_df(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long")


def _write(df, tmp_path):
    sf = tmp_path / "sf"
    sf.mkdir()
    df.coalesce(1).write.parquet(str(sf / "documents.parquet"))
    return str(sf)


def test_bpe_matches_python_on_adversarial_vocab(spark, tmp_path):
    """Crafted corpus hits the two replace()-trick hazards: 'aaa' under
    merge a+a must resolve leftmost-first ('aa'+'a'), and 'xa b' must NOT
    trigger an a+b merge across the x|a boundary."""
    texts = [
        "aaa aaa aaa aaa ab ab ab",     # a+a dominates round 0
        "xab xab ab baa",               # 'a b' inside 'xab' must not leak
        "aaa ab xab",
    ]
    words = Counter(w for t in texts for w in t.split(" "))
    expected = _python_bpe(words, BPE_ROUNDS)
    sf = _write(_corpus_df(spark, texts), tmp_path)
    got = [(r["round"], r["w1"], r["w2"], r["merged"], r["pair_count"])
           for r in sorted(q_bpe_merges(spark, sf).collect(),
                           key=lambda r: r["round"])]
    assert got == expected
    assert got[0][1:3] == ("a", "a"), "round 0 must merge the hot pair"


def test_pmi_lift_matches_python_recompute(spark, tmp_path):
    texts = [" ".join(["hot pair"] * 6 + ["cold", "word"]),
             " ".join(["hot", "alone"] * 5 + ["pair"] * 3)]
    sf = _write(_corpus_df(spark, texts), tmp_path)
    rows = q_pmi_collocations(spark, sf).collect()
    uni = Counter(w for t in texts for w in t.split(" "))
    bg = Counter()
    for t in texts:
        ws = t.split(" ")
        for i in range(len(ws) - 1):
            bg[(ws[i], ws[i + 1])] += 1
    n = sum(bg.values())
    expected = {(w1, w2): (c, uni[w1], uni[w2],
                           (c * n * PMI_LIFT_Q) // (uni[w1] * uni[w2]))
                for (w1, w2), c in bg.items() if c >= PMI_MIN_COUNT}
    got = {(r["w1"], r["w2"]): (r["c_xy"], r["c_x"], r["c_y"], r["lift_q"])
           for r in rows}
    assert got == expected
    assert ("hot", "pair") in got
    # a genuinely associated pair scores above independence (PMI > 0)
    assert got[("hot", "pair")][3] > PMI_LIFT_Q
