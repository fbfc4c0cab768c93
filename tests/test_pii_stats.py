"""pii_stats over planted PII: counts must equal the replacements
scrub_pii actually performs (sequential semantics), including the
no-double-count case of a phone-shaped run inside an email, and the
counts must agree with the pages corpus's planted PII."""

from __future__ import annotations

import re

from isimip_qa_spark.functions.scrub import ALL_PATTERNS
from isimip_qa_spark.queries.webtext import pii_stats_frame


def _expected(texts: list[str]):
    n = [0, 0, 0, 0]
    affected = 0
    for t in texts:
        cur = t
        for i, (pat, _) in enumerate(ALL_PATTERNS):
            n[i] += len(re.findall(pat, cur))
            cur = re.sub(pat, "x", cur)
        changed = t
        for pat, repl in ALL_PATTERNS:
            changed = re.sub(pat, repl, changed)
        affected += changed != t
    return tuple(n), affected


def test_pii_stats_planted(spark):
    texts = [
        "write to alice@example.com or call +1 (555) 123-4567 now",
        # a phone-shaped digit run INSIDE the email: the email pattern
        # consumes it first, so n_phone must not count it
        "reach bob5551234567@mail.example.org for details",
        "server at 10.0.0.1 said badword1 twice: badword1",
        "nothing sensitive here at all",
        "two mails: a@b.co and c@d.org plus ip 192.168.1.1",
    ]
    docs = spark.createDataFrame(
        [("s0", t) for t in texts], "source string, text string"
    )
    row = pii_stats_frame(docs).collect()[0]
    (ne, np_, ni, nt), affected = _expected(texts)
    assert (row.n_email, row.n_phone, row.n_ip, row.n_toxic) == (ne, np_, ni, nt)
    assert row.docs_affected == affected and row.n_docs == 5
    # the planted inner-phone email contributes to email only
    assert ne == 4 and np_ == 1


def test_pii_stats_pages_corpus(spark, pages_sdf, pages_pdf):
    """The synthetic pages corpus plants PII; stats grouped by lang must
    match the pandas-oracle replay exactly and be non-zero overall."""
    rows = pii_stats_frame(
        pages_sdf.select("lang", "text"), group_col="lang"
    ).collect()
    got = {r.lang: r for r in rows}
    total = 0
    for lang, grp in pages_pdf.groupby("lang"):
        (ne, np_, ni, nt), affected = _expected(list(grp["text"]))
        r = got[lang]
        assert (r.n_email, r.n_phone, r.n_ip, r.n_toxic) == (ne, np_, ni, nt)
        assert r.docs_affected == affected
        total += ne + np_ + ni + nt
    assert total > 0
