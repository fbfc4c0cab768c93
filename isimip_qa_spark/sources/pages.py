"""Deterministic synthetic Common-Crawl-style pages (FIXTURES.md §3).

Schema per BASELINE.json `input_hint`:
    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Everything is a pure function of the row id (no RNG state), so the Spark
generator (mapInPandas over `spark.range`) and the pandas oracle produce
byte-identical rows at any scale and any partitioning — the analogue of the
reference's analytically-known fixtures
(/root/reference/testing/extractions/*.csv; crafted fields with exact
expected outputs).

Planted structure, by id % 100 (each bucket toggles exactly one QA rule so
keep/drop goldens are derivable):
    00-69  clean doc in one of 5 languages        → keep
    70-74  too short (< MIN words)                → drop (n_words rule)
    75-79  symbol-heavy                           → drop (symbol_ratio rule)
    80-84  high repetition (one word repeated)    → drop (distinct_word_ratio)
    85-89  no stop-words                          → drop (stopword_ratio rule)
    90-93  ellipsis spam                          → drop (ellipsis rule)
    94-96  clean + planted PII                    → keep, text_scrubbed ≠ text
    97-99  near-duplicate of doc id-1             → keep (dedup finds pairs)

Host skew (exercises salting): 20 % of pages land on host-0; the rest are
spread over 500 hosts by a multiplicative hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.langid import LANG_ORDER, LANG_STOPWORDS

KNUTH = 2654435761
N_HOSTS = 500
HOT_HOST_EVERY = 5  # id % 5 == 0 → host 0 (20 % of the corpus)
BASE_TS = np.datetime64("2024-01-01T00:00:00")
CLEAN_WORDS = 120  # words per clean doc
MIN_WORDS = 50

from ..functions.vocab import CONTENT_WORDS as _CONTENT

PII_EMAIL = "contact.person@example-mail.com"
PII_PHONE = "+1 (555) 123-4567"
PII_IP = "192.168.10.42"


def _words_for(doc_id: int, lang: str, n: int, stop_every: int = 4) -> list[str]:
    """Deterministic word sequence: every `stop_every`-th word is a stop-word
    of `lang`, the rest content words, both indexed by a rolling hash."""
    sw = LANG_STOPWORDS[lang]
    cw = _CONTENT[lang]
    out = []
    h = (doc_id * KNUTH) % (1 << 31)
    for i in range(n):
        h = (h * 1103515245 + 12345) % (1 << 31)
        if stop_every and i % stop_every == 0:
            out.append(sw[h % len(sw)])
        else:
            out.append(cw[h % len(cw)])
    return out


def _text_for(doc_id: int) -> tuple[str, str]:
    """(text, true_lang) for one id — the single source of truth."""
    bucket = doc_id % 100
    lang = LANG_ORDER[(doc_id // 100) % len(LANG_ORDER)]
    if bucket >= 97:  # near-dup of the previous doc: same words + 2 extras
        base, lang = _text_for(doc_id - 1) if (doc_id - 1) % 100 < 97 else ("", lang)
        if base:
            return base + " extra token" + str(doc_id % 7), lang
        # doc id-1 was itself a dup → fall through to clean
        bucket = 0
    if bucket < 70 or bucket >= 94:
        words = _words_for(doc_id, lang, CLEAN_WORDS)
        text = " ".join(words)
        if 94 <= bucket <= 96:  # planted PII
            text = (
                text + " reach us at " + PII_EMAIL + " or call " + PII_PHONE
                + " server " + PII_IP
            )
        return text, lang
    if bucket < 75:  # too short
        return " ".join(_words_for(doc_id, lang, MIN_WORDS - 20)), lang
    if bucket < 80:  # symbol-heavy
        words = _words_for(doc_id, lang, CLEAN_WORDS)
        sym = ["#@!%", "$$$", "^&*(", "<<>>"]
        mixed = [w if i % 2 == 0 else sym[i % len(sym)] for i, w in enumerate(words)]
        return " ".join(mixed), lang
    if bucket < 85:  # high repetition (2-token loop keeps the other rules green)
        pair = [LANG_STOPWORDS[lang][0], _CONTENT[lang][0]]
        return " ".join(pair * (CLEAN_WORDS // 2)), lang
    if bucket < 90:  # zero stop-words
        return " ".join(_words_for(doc_id, lang, CLEAN_WORDS, stop_every=0)), lang
    # ellipsis spam
    words = _words_for(doc_id, lang, CLEAN_WORDS)
    spam = [w if i % 10 else w + " ... ... ..." for i, w in enumerate(words)]
    return " ".join(spam), lang


_SYM = ["#@!%", "$$$", "^&*(", "<<>>"]
_PII_SUFFIX = (
    " reach us at " + PII_EMAIL + " or call " + PII_PHONE + " server " + PII_IP
)
_ELL = " ... ... ..."


def _build_tbl() -> tuple[list[str], dict]:
    """Global slot-string table: every word a generated doc can contain —
    per language: content words, stop words, their ellipsis variants — plus
    symbol junk and the PII/dup tail strings (tails start life as join
    slots, so they carry no leading space). ~150 entries total; a doc is
    then just a list of int codes joined through this table."""
    tbl: list[str] = []
    offs: dict = {}
    for lang in LANG_ORDER:
        cw, sw = _CONTENT[lang], LANG_STOPWORDS[lang]
        offs[lang] = {"c": len(tbl), "s": len(tbl) + len(cw)}
        tbl += cw
        tbl += sw
        # ellipsis variants sit exactly len(cw)+len(sw) above their base —
        # one constant shift upgrades any base code to its variant
        tbl += [w + _ELL for w in cw]
        tbl += [w + _ELL for w in sw]
    offs["sym"] = len(tbl)
    tbl += _SYM
    offs["pii"] = len(tbl)
    tbl.append(_PII_SUFFIX[1:])
    offs["dup"] = len(tbl)
    tbl += [f"extra token{d}" for d in range(7)]
    return tbl, offs


_TBL, _TBL_OFFS = _build_tbl()
_N_SHORT = MIN_WORDS - 20
_MAX_SLOTS = CLEAN_WORDS + 2  # words + optional PII tail + optional dup tail


def _texts_vec(ids: np.ndarray) -> tuple[list[str], list[str]]:
    """Vectorized twin of `_text_for` over an id array — byte-identical
    (asserted in tests/test_pages_source.py). The per-word LCG runs as
    in-place numpy ops over all docs at once, every word pick is an integer
    code into the module-level slot table, and the only per-row Python is
    one C-level `' '.join(map(table.__getitem__, codes))` per doc."""
    ids = np.asarray(ids, dtype=np.int64)
    m = len(ids)
    if m == 0:
        return [], []
    bucket = ids % 100
    is_dup = bucket == 97  # (id-1) % 100 == 96 < 97 always → a real dup
    eff = np.where(is_dup, ids - 1, ids)  # row whose words we generate
    eb = eff % 100
    eb = np.where(bucket >= 98, 0, eb)  # 98/99: dup-of-dup → clean self

    is_short = (eb >= 70) & (eb < 75)
    is_symbol = (eb >= 75) & (eb < 80)
    is_repeat = (eb >= 80) & (eb < 85)
    is_nostop = (eb >= 85) & (eb < 90)
    is_ellip = (eb >= 90) & (eb < 94)
    has_pii = (eb >= 94) & (eb <= 96)

    # per-word LCG, vectorized across docs: h_0 = id*KNUTH mod 2^31, then
    # h ← h*1103515245 + 12345 mod 2^31 once per word (same sequence
    # regardless of stop/content choice — exactly _words_for's consumption;
    # mod 2^31 of a non-negative value == bitwise AND, done in place)
    hmat = np.empty((m, CLEAN_WORDS), dtype=np.int64)
    h = (eff * KNUTH) % (1 << 31)
    for i in range(CLEAN_WORDS):
        np.multiply(h, 1103515245, out=h)
        np.add(h, 12345, out=h)
        np.bitwise_and(h, (1 << 31) - 1, out=h)
        hmat[:, i] = h

    lang_idx = (eff // 100) % len(LANG_ORDER)
    codes = np.empty((m, _MAX_SLOTS), dtype=np.int64)
    stop_cols = np.arange(0, CLEAN_WORDS, 4)
    even_cols = np.arange(0, CLEAN_WORDS, 2)
    odd_cols = np.arange(1, CLEAN_WORDS, 2)
    for li, lang in enumerate(LANG_ORDER):
        rows = np.nonzero(lang_idx == li)[0]
        if not rows.size:
            continue
        o = _TBL_OFFS[lang]
        ncw, nsw = len(_CONTENT[lang]), len(LANG_STOPWORDS[lang])
        codes[rows, :CLEAN_WORDS] = o["c"] + hmat[rows] % ncw
        s4 = rows[~is_nostop[rows]]  # stop_every=4 rows of this language
        if s4.size:
            ix = np.ix_(s4, stop_cols)
            codes[ix] = o["s"] + hmat[ix] % nsw
        rep = rows[is_repeat[rows]]
        if rep.size:  # constant [stop0, content0] loop
            codes[np.ix_(rep, even_cols)] = o["s"]
            codes[np.ix_(rep, odd_cols)] = o["c"]
        ell = rows[is_ellip[rows]]
        if ell.size:  # upgrade every 10th word to its ellipsis variant
            codes[np.ix_(ell, np.arange(0, CLEAN_WORDS, 10))] += ncw + nsw

    sym_rows = np.nonzero(is_symbol)[0]
    if sym_rows.size:  # odd positions become constant symbol junk
        for residue in (1, 3):
            cols = np.arange(residue, CLEAN_WORDS, 4)
            codes[np.ix_(sym_rows, cols)] = _TBL_OFFS["sym"] + residue

    n_slots = np.full(m, CLEAN_WORDS, dtype=np.int64)
    n_slots[is_short] = _N_SHORT
    codes[has_pii, CLEAN_WORDS] = _TBL_OFFS["pii"]
    n_slots[has_pii] = CLEAN_WORDS + 1
    # dup rows duplicate a PII doc (eb == 96), so their PII tail is set
    codes[is_dup, CLEAN_WORDS + 1] = _TBL_OFFS["dup"] + ids[is_dup] % 7
    n_slots[is_dup] = CLEAN_WORDS + 2

    g = _TBL.__getitem__
    texts = [
        " ".join(map(g, row[:n]))
        for row, n in zip(codes.tolist(), n_slots.tolist())
    ]
    # reported lang: _text_for returns the base row's language for dups —
    # id and id-1 share the 100-block, so eff's language IS id's language
    langs = [LANG_ORDER[i] for i in lang_idx]
    return texts, langs


def pages_pandas(ids: np.ndarray) -> pd.DataFrame:
    """The pure generator: id array → pages DataFrame (oracle + Spark)."""
    ids = np.asarray(ids, dtype=np.int64)
    texts, langs = _texts_vec(ids)
    host_hash = (ids * KNUTH) % N_HOSTS
    host = np.where(ids % HOT_HOST_EVERY == 0, 0, 1 + host_hash % (N_HOSTS - 1))
    urls = [
        f"https://host{h}.example.org/p/{i}" for h, i in zip(host, ids)
    ]
    ts = BASE_TS + ((ids * 7919) % (30 * 86400)).astype("timedelta64[s]")
    # valid HTML: text is entity-escaped on the way in (as any real capture
    # is), so functions/extract.py's decode recovers it byte-identically —
    # the north-rule invariant tests/test_extract.py asserts. & first.
    html = [
        b"<html><head><title>p" + str(i).encode() + b"</title></head><body>"
        + t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .encode("utf-8")
        + b"</body></html>"
        for i, t in zip(ids, texts)
    ]
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.Series(ts),
            "html": html,
            "text": texts,
            "lang": langs,
        }
    )


def pages_df(spark, n: int, num_partitions: int = 32):
    """Distributed generator: spark.range → mapInPandas(pages_pandas).
    Deterministic regardless of partitioning (row content is f(id) only)."""
    from ..catalog import PAGES_SCHEMA

    def gen(batches):
        for pdf in batches:
            yield pages_pandas(pdf["id"].to_numpy())

    return (
        spark.range(0, n, 1, num_partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def write_pages(
    spark, path: str, n: int, num_partitions: int = 32, n_buckets: int | None = None
) -> None:
    """Persist the corpus; with `n_buckets`, lay it out partitioned by the
    QA pipeline's chunk key (bucket = pmod(xxhash64(url), n_buckets)) so
    chunk scans become partition-pruned reads — the parquet stand-in for an
    Iceberg bucket-partition spec."""
    from pyspark.sql import functions as F

    df = pages_df(spark, n, num_partitions)
    if n_buckets:
        df = df.withColumn("bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)))
        df.write.mode("overwrite").partitionBy("bucket").parquet(path)
    else:
        df.write.mode("overwrite").parquet(path)
