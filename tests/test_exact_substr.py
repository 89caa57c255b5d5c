"""ExactSubstr dedup (Lee et al. 2022) — invariants the hash gate can't
see: winner election keeps exactly the FIRST occurrence of a duplicated
window, coverage extends to every position the window spans (not just its
start), and the whole operator matches a pure-Python recompute on a
crafted corpus with known duplicated runs.
"""

from __future__ import annotations

from document_processor_spark.operators.dedup import EXSUB_W, q_dedup_exact_substr

SF_DIR = "/root/testdata/sf0.001"


def _python_exact_substr(docs: dict[int, str], w: int) -> dict[int, tuple[str, int, int]]:
    """Independent recompute of the operator contract: duplicated w-word
    windows cut every position they cover except at the first occurrence
    (min zero-padded (doc_id, start) key)."""
    words = {d: t.split(" ") for d, t in docs.items()}
    occ: dict[str, list[str]] = {}
    starts: dict[str, list[tuple[int, int]]] = {}
    for d, ws in words.items():
        for s in range(len(ws) - w + 1):
            wtext = " ".join(ws[s:s + w])
            key = f"{d:012d}:{s:06d}"
            occ.setdefault(wtext, []).append(key)
            starts.setdefault(wtext, []).append((d, s))
    out = {}
    covered: dict[int, set[int]] = {d: set() for d in docs}
    for wtext, keys in occ.items():
        if len(keys) < 2:
            continue
        winner = min(keys)
        for key, (d, s) in zip(keys, starts[wtext]):
            if key == winner:
                continue
            covered[d].update(range(s, s + w))
    for d, ws in words.items():
        kept = [x for i, x in enumerate(ws) if i not in covered[d]]
        out[d] = (" ".join(kept), len(ws), len(ws) - len(kept))
    return out


def _run(spark, docs: dict[int, str], tmp_path):
    df = spark.createDataFrame(
        [(d, t, "en", "src0", len(t)) for d, t in docs.items()],
        "doc_id long, text string, lang string, source string, n_chars long")
    sf = tmp_path / "sf"
    sf.mkdir()
    df.coalesce(1).write.parquet(str(sf / "documents.parquet"))
    rows = q_dedup_exact_substr(spark, str(sf)).collect()
    return {r["doc_id"]: (r["clean_text"], r["n_words"], r["n_removed"])
            for r in rows}


def test_exact_substr_matches_python_recompute(spark, tmp_path):
    run = " ".join(f"w{i}" for i in range(EXSUB_W + 3))  # 11-word shared run
    docs = {
        # doc 0 holds the first occurrence of the run -> keeps it whole
        0: f"alpha beta {run} gamma",
        # doc 1 repeats the run mid-document -> the covered words vanish
        1: f"one two three {run} four five",
        # doc 2 repeats it at position 0 and ALSO internally duplicates an
        # 8-word window (run prefix twice) -> both cuts apply
        2: f"{run} filler {' '.join(f'w{i}' for i in range(EXSUB_W))}",
        # doc 3 shorter than the window -> untouched by construction
        3: "tiny doc under window width",
        # doc 4 unique text of window length -> no duplicated window
        4: " ".join(f"u{i}" for i in range(EXSUB_W + 2)),
    }
    expected = _python_exact_substr(docs, EXSUB_W)
    got = _run(spark, docs, tmp_path)
    assert got == expected
    # the crafted corpus must actually exercise the operator
    assert got[0][2] == 0, "first occurrence must be kept"
    assert got[1][2] >= EXSUB_W, "later occurrence must lose the full run"
    assert got[3][2] == 0 and got[4][2] == 0


def test_exact_substr_full_cover_keeps_auditable_row(spark, tmp_path):
    """A document whose every position is covered still emits a row with
    clean_text='' — the cut is auditable, not a silent drop."""
    t = " ".join(f"w{i}" for i in range(EXSUB_W))
    docs = {0: t, 1: t}
    got = _run(spark, docs, tmp_path)
    assert got[0] == (t, EXSUB_W, 0)
    assert got[1] == ("", EXSUB_W, EXSUB_W)
