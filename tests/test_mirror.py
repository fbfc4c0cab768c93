"""mirror_hosts: planted mirror-family fixture with exact expected pair
counts, and the boilerplate cap actually biting (a segment on more than CAP
sources generates ZERO pairs instead of n^2)."""

from __future__ import annotations

from isimip_qa_spark.queries.curation import SEG_W, mirror_pairs


def _doc(words):
    return " ".join(words)


def _seg(tag):
    # one full SEG_W-word segment, unique per tag
    return [f"{tag}w{i}" for i in range(SEG_W)]


def test_planted_mirror_family(spark):
    # hosts a,b,c: a&b share 3 segments, a&c share 1, b&c share 1 (the same
    # one a&c share, so it is a 3-host segment -> contributes to all pairs)
    s1, s2, s3, s4 = _seg("s1"), _seg("s2"), _seg("s3"), _seg("s4")
    ua, ub, uc = _seg("ua"), _seg("ub"), _seg("uc")
    rows = [
        ("a", _doc(s1 + s2 + s3 + s4 + ua)),
        ("b", _doc(s1 + s2 + s3 + ub)),
        ("c", _doc(s4 + uc)),
    ]
    d = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r.src_a, r.src_b): r.shared_segs
        for r in mirror_pairs(d).collect()
    }
    assert got == {("a", "b"): 3, ("a", "c"): 1}


def test_cap_bites(spark):
    # one segment served by 5 hosts; cap=4 -> no pairs at all from it
    s = _seg("hot")
    rows = [(f"h{i}", _doc(s + _seg(f"u{i}"))) for i in range(5)]
    d = spark.createDataFrame(rows, "source string, text string")
    assert mirror_pairs(d, cap=4).count() == 0
    # with the cap relaxed the same fixture yields all C(5,2)=10 pairs
    assert mirror_pairs(d, cap=16).count() == 10


def test_duplicate_segment_within_host_counts_once(spark):
    # host b repeats the shared segment twice; DISTINCT (source, seg) must
    # collapse it so the pair count stays 1
    s = _seg("rep")
    rows = [
        ("a", _doc(s + _seg("xa"))),
        ("b", _doc(s + s)),
    ]
    d = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r.src_a, r.src_b): r.shared_segs
        for r in mirror_pairs(d).collect()
    }
    assert got == {("a", "b"): 1}


def test_host_families_planted(spark):
    """Three mirrors chained a-b-c (a~b and b~c share >= 2 segments, a and
    c share nothing directly) collapse into ONE family via transitivity;
    a single-shared-segment pair (d,e) stays below FAMILY_MIN_SEGS and
    both remain singletons."""
    from isimip_qa_spark.queries.curation import host_families_frame

    s1, s2, s3, s4, s5 = (_seg(t) for t in ("f1", "f2", "f3", "f4", "co"))
    rows = [
        ("a", _doc(s1 + s2 + _seg("ua"))),
        ("b", _doc(s1 + s2 + s3 + s4)),
        ("c", _doc(s3 + s4 + _seg("uc"))),
        ("d", _doc(s5 + _seg("ud"))),
        ("e", _doc(s5 + _seg("ue"))),
    ]
    d = spark.createDataFrame(rows, "source string, text string")
    fam = {r.source: r.family_id for r in host_families_frame(d).collect()}
    assert fam == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "e"}
    # with the threshold at 1 the coincidental pair becomes a family too
    fam1 = {
        r.source: r.family_id
        for r in host_families_frame(d, min_segs=1).collect()
    }
    assert fam1 == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d"}
