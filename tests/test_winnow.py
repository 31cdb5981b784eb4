"""Winnowing fingerprints (operators/winnow.py): the paper's detection
guarantees, tie-break rule, selection density, and the overlap-pair
fanout cap."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventanalysis_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_overlap_pairs,
)

K, W = 5, 4
T = W + K - 1  # guarantee threshold: shared substrings >= T are detected


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in rows], "doc_id long, text string"
    )


def _fps(spark, rows, k=K, w=W):
    return winnow_fingerprints(_docs(spark, rows), k=k, w=w)


class TestGuarantees:
    def test_shared_passage_detected(self, spark):
        # two docs sharing exactly a T-char normalized substring MUST
        # share at least one fingerprint value (paper guarantee 1)
        shared = "qwzxcvbn"  # 8 chars = T, no overlap with the rest
        assert len(shared) == T
        fps = _fps(
            spark,
            [(1, f"aaaa bbbb {shared} cccc"), (2, f"dddd {shared} eeee ffff")],
        )
        a = {r.fp for r in fps.where("doc_id = 1").collect()}
        b = {r.fp for r in fps.where("doc_id = 2").collect()}
        assert a & b, "shared >=T substring must share a fingerprint"

    def test_no_match_below_k(self, spark):
        # docs with no common k-gram share no fingerprint (guarantee 2:
        # noise threshold k — nothing shorter than k is ever detected)
        fps = _fps(spark, [(1, "abcdefghij klmno"), (2, "zyxwvutsrq ponml")])
        a = {r.fp for r in fps.where("doc_id = 1").collect()}
        b = {r.fp for r in fps.where("doc_id = 2").collect()}
        assert not (a & b)

    def test_whitespace_and_case_invariant(self, spark):
        # normalization: layout/case edits move nothing
        fps = _fps(
            spark,
            [(1, "The  Quick,\nBrown FOX!"), (2, "thequickbrownfox")],
        ).collect()
        by_id = {}
        for r in fps:
            by_id.setdefault(r.doc_id, set()).add((r.pos, r.fp))
        assert by_id[1] == by_id[2]


class TestSelection:
    def test_rightmost_min_tiebreak(self, spark):
        # a periodic string makes every window's hash multiset identical:
        # robust winnowing must pick the RIGHTMOST minimal gram in each
        # window, and dedup collapses them to few distinct positions
        fps = _fps(spark, [(1, "ababababababab")]).collect()
        # all grams are 'ababa'/'babab' alternating; min hash of the two
        # values repeats every 2 positions -> selected positions step by 2
        pos = sorted(p for (_, p, _) in [(r.doc_id, r.pos, r.fp) for r in fps])
        assert pos == sorted(set(pos))
        steps = {b - a for a, b in zip(pos, pos[1:])}
        assert steps == {2}

    def test_density_bound(self, spark):
        # expected density 2/(w+1); allow generous slack on one long doc
        text = " ".join(f"tok{i}xyz" for i in range(400))
        fps = _fps(spark, [(1, text)])
        n_sel = fps.count()
        n_grams = len("".join(c for c in text.lower() if c.isalnum())) - K + 1
        density = n_sel / n_grams
        assert 1.2 / (W + 1) < density < 3.5 / (W + 1)

    def test_short_and_empty_docs(self, spark):
        fps = _fps(spark, [(1, "ab"), (2, "  ...  "), (3, "")])
        rows = fps.collect()
        # empty-normalized docs vanish; shorter-than-k docs get exactly
        # one whole-string fingerprint at pos 0
        assert {r.doc_id for r in rows} == {1}
        assert [(r.pos,) for r in rows] == [(0,)]


class TestOverlapPairs:
    def test_pairs_and_min_common(self, spark):
        shared = "qqwweerrttyyuu"  # 14 normalized chars, several grams
        fps = _fps(
            spark,
            [
                (1, f"alpha {shared} beta"),
                (2, f"gamma {shared} delta"),
                (3, "completely different words here"),
            ],
        )
        pairs = winnow_overlap_pairs(fps, min_common=2).collect()
        assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]
        assert pairs[0].n_common >= 2

    def test_fanout_cap_drops_universal_grams(self, spark):
        # 8 docs share ONLY a 10-char boilerplate prefix. Uncapped, the
        # universally-selected boiler fps pair everyone with everyone;
        # capped at 4, those df=8 fps are dropped BEFORE the join, so
        # every surviving pair loses them from its n_common. (A boiler
        # gram can still survive in a few docs: winnowing selection near
        # the boundary depends on the neighboring unique-tail hashes, so
        # its posting list may legitimately be below the cap.)
        boiler = "zzxxccvvbb"
        rows = [
            (i, f"{boiler} {chr(ord('a') + i) * 12}") for i in range(1, 9)
        ]
        fps = _fps(spark, rows)
        full = {
            (r.id_a, r.id_b): r.n_common
            for r in winnow_overlap_pairs(
                fps, min_common=1, max_fanout=100
            ).collect()
        }
        assert len(full) == 8 * 7 // 2  # paper guarantee: all pairs found
        assert all(n >= 2 for n in full.values())  # two universal fps
        capped = {
            (r.id_a, r.id_b): r.n_common
            for r in winnow_overlap_pairs(
                fps, min_common=1, max_fanout=4
            ).collect()
        }
        assert set(capped) < set(full)
        assert all(capped[p] < full[p] for p in capped)

    def test_posting_dedup_within_doc(self, spark):
        # a doc repeating its own passage contributes each fp ONCE
        p = "mmnnbbvvccxx"
        fps = _fps(spark, [(1, f"{p} {p} {p}"), (2, f"{p} solo")])
        pairs = winnow_overlap_pairs(fps, min_common=1).collect()
        assert len(pairs) == 1
        n = pairs[0].n_common
        fps1 = {r.fp for r in fps.where("doc_id = 1").collect()}
        fps2 = {r.fp for r in fps.where("doc_id = 2").collect()}
        assert n == len(fps1 & fps2)


def test_shared_passage_reconstruction(spark):
    """A verbatim passage planted in two otherwise-different docs is
    reconstructed as ONE span on the correct diagonal, bounded inside
    the passage region; the unrelated doc produces no span."""
    import re

    from eventanalysis_spark.operators.winnow import winnow_shared_passages

    passage = "the quick brown fox jumps over the lazy dog repeatedly tonight"
    pre_a, pre_b = "alpha bravo charlie ", "zulu yankee xray whiskey victor "
    rows = [
        (1, pre_a + passage + " delta echo golf"),
        (2, pre_b + passage + " uniform tango"),
        (3, "completely unrelated content with no overlap whatsoever here"),
    ]
    norm = lambda s: re.sub(r"[^a-z0-9]", "", s.lower())
    off_a, off_b = len(norm(pre_a)), len(norm(pre_b))
    plen = len(norm(passage))

    fps = winnow_fingerprints(_docs(spark, rows), k=5, w=4)
    spans = winnow_shared_passages(fps, k=5, w=4, min_fps=2).collect()
    assert spans, "planted passage not reconstructed"
    assert all((r["id_a"], r["id_b"]) == (1, 2) for r in spans)
    # merged into a single island on the planted diagonal
    assert len(spans) == 1
    s = spans[0]
    assert s["start_b"] - s["start_a"] == off_b - off_a  # diagonal
    # span lies inside the normalized passage region and covers most of it
    assert s["start_a"] >= off_a
    assert s["start_a"] + s["length"] <= off_a + plen
    assert s["length"] >= plen - 2 * (5 + 4)


def test_shared_passages_posting_cap_drops_universal_grams(spark):
    """A fingerprint present in > max_fanout docs is excluded from the
    pair join entirely (the mega-bucket rule), so corpus-universal
    boilerplate alone yields no spans."""
    from eventanalysis_spark.operators.winnow import winnow_shared_passages

    boiler = "all rights reserved cookie policy applies"
    rows = [(i, f"doc {i} unique words here {boiler}") for i in range(8)]
    fps = winnow_fingerprints(_docs(spark, rows), k=5, w=4)
    spans = winnow_shared_passages(fps, k=5, w=4, min_fps=2, max_fanout=4)
    assert spans.count() == 0
