"""Invariants for the session-13 operators: LSH recall/precision eval and
edit-distance verification, against pure-Python recomputes.
"""

from __future__ import annotations

import re

SF_DIR = "/root/testdata/sf0.001"


def _load(spark, name):
    return spark.read.parquet(f"{SF_DIR}/{name}.parquet").collect()


def _shingle_sets(rows):
    sets = {}
    for r in rows:
        w = r["text"].split(" ")
        if len(w) >= 3:
            s = {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
            if s:
                sets[r["doc_id"]] = s
    return sets


def test_lsh_recall_matches_python_truth(spark):
    import hashlib

    from document_processor_spark.operators.dedup import (
        LSH_EVAL_MOD, LSH_EVAL_T, MINHASH_JACCARD_T, q_dedup_lsh_recall,
        q_dedup_minhash_lsh,
    )

    def in_eval(doc_id):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        return h % LSH_EVAL_MOD < LSH_EVAL_T

    sets = _shingle_sets(_load(spark, "documents"))
    ids = sorted(d for d in sets if in_eval(d))
    truth = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if round(inter / union, 4) >= MINHASH_JACCARD_T:
                truth.add((a, b))
    assert truth  # fixture has real near-dups inside the eval universe

    lsh = {(r["d1"], r["d2"])
           for r in q_dedup_minhash_lsh(spark, SF_DIR).collect()
           if in_eval(r["d1"]) and in_eval(r["d2"])}
    hit = truth & lsh

    got = q_dedup_lsh_recall(spark, SF_DIR).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_true"] == len(truth)
    assert r["n_lsh"] == len(lsh)
    assert r["n_hit"] == len(hit)
    assert r["recall_pct"] == len(hit) * 100 // len(truth)
    assert r["precision_pct"] == 100  # verify threshold == truth threshold
    assert lsh <= truth


def test_edit_verify_matches_python(spark):
    from document_processor_spark.operators.dedup import (
        EDIT_MAX_BP, SNM_KEY_LEN, SNM_W, q_dedup_edit_verify,
    )

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rows = _load(spark, "documents")
    text = {r["doc_id"]: r["text"] for r in rows}
    keyed = sorted(
        (re.sub("[^a-z]", "", r["text"].lower())[:SNM_KEY_LEN], r["doc_id"])
        for r in rows)
    want = {}
    for i in range(len(keyed)):
        for j in range(i + 1, min(i + SNM_W + 1, len(keyed))):
            a, b = keyed[i][1], keyed[j][1]
            d = lev(text[a], text[b])
            m = max(len(text[a]), len(text[b]))
            if d * 10000 <= EDIT_MAX_BP * m:
                want[(a, b)] = (d, d * 10000 // m)

    got = q_dedup_edit_verify(spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r in got:
        assert want[(r["doc_a"], r["doc_b"])] == (r["dist"], r["dist_bp"])
    assert want  # fixture exercises the verifier


def test_image_tiles_partition_exactly(spark):
    """Tiles must EXACTLY partition each image: per-row widths sum to the
    image width, per-column heights to the height, pixel counts to w*h."""
    from collections import defaultdict

    from document_processor_spark.operators.multimodal import (
        TILE_GRID, q_image_tiles,
    )

    geo = {}
    for r in _load(spark, "documents"):
        if r["n_chars"] % 3 == 0:
            geo[r["doc_id"]] = (64 + r["n_chars"] % 640,
                                64 + (r["n_chars"] * 7) % 480)

    tiles = defaultdict(list)
    for r in q_image_tiles(spark, SF_DIR).collect():
        tiles[r["doc_id"]].append(r)
    assert set(tiles) == set(geo)
    for doc_id, (w, h) in geo.items():
        ts = tiles[doc_id]
        assert len(ts) == TILE_GRID * TILE_GRID
        assert sum(t["n_tile_pixels"] for t in ts) == w * h
        row0 = [t for t in ts if t["tile_row"] == 0]
        col0 = [t for t in ts if t["tile_col"] == 0]
        assert sum(t["tile_w"] for t in row0) == w
        assert sum(t["tile_h"] for t in col0) == h
