"""Pin the planted near-duplicate embedding pairs' invariants.

The round-3 verdict flagged the embedding-dedup oracle rows as vacuously
green (0-vs-0 rows at sf0.01). queries/ann.py now unions three
deterministic near-dup pairs (plant_rows) into the dedup-query inputs on
BOTH engines. This test pins every property the plant's usefulness rests
on, so a constant tweak or kernel change that silently re-vacuates the
oracle rows fails here first:

  - dyadic components, exactly representable in float32 (the union with
    the FLOAT[] table cannot re-round them);
  - pair cosine in [DUP_COS_THRESHOLD, 1) under the engines' exact
    left-to-right fold;
  - bucket agreement under ALL four LSH rotations (single-table AND
    multiprobe queries both see the pair);
  - IVF cell agreement under the fixture quantizer (dedup_semantic sees
    the pair);
  - every cross-plant / plant-vs-corpus cosine < SEM_THRESHOLD (the plant
    adds exactly its three pairs, nothing else);
  - the three registered queries each return the three planted pairs,
    non-empty, at the test sf.
"""

from __future__ import annotations

import numpy as np
import pytest

from isimip_qa_spark.queries import ann


def _fold_dot(a, b):
    return np.cumsum(a * b)[-1]


def _cos(a, b):
    return _fold_dot(a, b) / (
        np.sqrt(_fold_dot(a, a)) * np.sqrt(_fold_dot(b, b))
    )


@pytest.fixture(scope="module")
def plant():
    rows = ann.plant_rows()
    assert len(rows) == 6
    return rows


def test_plant_is_float32_exact(plant):
    for vid, vec in plant:
        v = np.asarray(vec, dtype=np.float64)
        assert np.all(v.astype(np.float32).astype(np.float64) == v), vid


def test_pairs_above_threshold_same_bucket_all_rotations(plant):
    import pandas as pd

    vecs = {vid: np.asarray(v, dtype=np.float64) for vid, v in plant}
    keys = ann._bucket_keys_series(
        pd.Series([vecs[vid] for vid, _ in plant]), ann.N_ROTATIONS
    )
    for i in range(3):
        a = ann.PLANT_BASE + 2 * i
        b = a + 1
        sim = _cos(vecs[a], vecs[b])
        assert ann.DUP_COS_THRESHOLD <= sim < 1.0, (i, sim)
        ka, kb = keys.iloc[2 * i], keys.iloc[2 * i + 1]
        assert list(ka) == list(kb), (i, ka, kb)


def test_pairs_share_ivf_cell_and_nothing_else_is_similar(plant, sf_dir):
    import duckdb

    cent = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        f"WHERE vec_id >= {ann.N_QUERIES} "
        f"AND vec_id < {ann.N_QUERIES + ann.N_CENTROIDS} ORDER BY vec_id"
    ).fetchall()
    cids = [r[0] for r in cent]
    cvecs = [np.asarray(r[1], dtype=np.float64) for r in cent]

    def cell(v):
        sims = [_cos(v, c) for c in cvecs]
        return cids[int(np.argmax(sims))]  # first-max tie, the IVF contract

    vecs = {vid: np.asarray(v, dtype=np.float64) for vid, v in plant}
    for i in range(3):
        a, b = ann.PLANT_BASE + 2 * i, ann.PLANT_BASE + 2 * i + 1
        assert cell(vecs[a]) == cell(vecs[b]), i

    # cross-plant (different pairs) stays below the semantic threshold
    ids = sorted(vecs)
    for x in ids:
        for y in ids:
            if y <= x or x // 2 == y // 2:  # self / same pair
                continue
            assert abs(_cos(vecs[x], vecs[y])) < ann.SEM_THRESHOLD, (x, y)

    # plant vs the real corpus stays below the semantic threshold
    corpus = duckdb.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    C = np.array([r[0] for r in corpus], dtype=np.float64)
    norms = np.sqrt((C * C).sum(axis=1))
    for vid, v in vecs.items():
        sims = (C @ v) / (norms * np.sqrt((v * v).sum()))
        assert np.max(np.abs(sims)) < ann.SEM_THRESHOLD, vid


EXPECTED_PAIRS = [
    (ann.PLANT_BASE + 2 * i, ann.PLANT_BASE + 2 * i + 1) for i in range(3)
]


@pytest.mark.parametrize(
    "qname",
    ["dedup_embedding_cosine", "dedup_embedding_cosine_multiprobe",
     "dedup_semantic"],
)
def test_queries_return_planted_pairs(spark, sf_dir, qname):
    from isimip_qa_spark.queries import QUERIES, load_all

    load_all()
    rows = QUERIES[qname](spark, sf_dir).collect()
    got = sorted((r["id_a"], r["id_b"]) for r in rows)
    planted = [p for p in got if p[0] >= ann.PLANT_BASE]
    assert planted == EXPECTED_PAIRS, got
    # the plant adds ONLY its pairs: no plant-vs-corpus row ever appears
    assert all(
        (a >= ann.PLANT_BASE) == (b >= ann.PLANT_BASE) for a, b in got
    ), got


def test_anti_join_planted_customer(spark, sf_dir):
    from isimip_qa_spark.queries import QUERIES, load_all

    load_all()
    rows = QUERIES["anti_join_idle_customers"](spark, sf_dir).collect()
    seg = {r["c_mktsegment"]: r["n_idle"] for r in rows}
    assert seg.get("PLANTED") == 1, seg
