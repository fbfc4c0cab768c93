"""Reference-semantics fidelity on the archetype grid fixtures: the Spark
twins of the extraction operators must hit the analytically-known answers
(the reference's golden-artifact mechanism,
/root/reference/isimip_qa/tests/test_extractions.py:30-53, with exact maths
instead of checked-in CSVs)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from isimip_qa_spark.functions.weights import lat_weight_expr, weighted_mean_agg
from isimip_qa_spark.sources.grid import (
    ARCHETYPES,
    BOX,
    LAT_STEP,
    N_LAT,
    N_LON,
    T_STEPS,
    expected_weighted_mean,
    grid_df,
)


@pytest.fixture(scope="module")
def grid(spark):
    df = grid_df(spark)
    df.cache().count()  # S3 eager-load twin (--load, models.py:63-65)
    return df


def _wmean_series(grid, dataset):
    g = grid.filter(F.col("dataset") == dataset)
    w = lat_weight_expr(F.col("lat"), LAT_STEP / 2)
    return {
        r["time"]: r["m"]
        for r in g.groupBy("time")
        .agg(weighted_mean_agg(F.col("var"), w).alias("m"))
        .collect()
    }


@pytest.mark.parametrize("dataset", ARCHETYPES)
def test_weighted_mean_matches_analytic(grid, dataset):
    """A1/A2 twin vs the closed-form answer (CDO-oracle mechanism)."""
    got = _wmean_series(grid, dataset)
    assert len(got) == T_STEPS
    times = sorted(got)
    for t, ts in enumerate(times):
        want = expected_weighted_mean(dataset, t)
        if dataset == "mask":
            assert got[ts] == 1.0  # exact: Σ(w·1)/Σ(w)
        else:
            assert got[ts] == pytest.approx(want, rel=1e-12), (t, ts)


def test_count_series(grid):
    """A3 twin: non-null count per time — mask fixture counts exactly BOX²
    (the reference's mask_global_count golden: 441 for its 21×21 box)."""
    g = grid.filter(F.col("dataset") == "mask")
    counts = g.groupBy("time").agg(F.count("var").alias("c")).collect()
    assert len(counts) == T_STEPS
    assert all(r["c"] == BOX * BOX for r in counts)
    # linear: every cell non-null → full grid per step
    g2 = grid.filter(F.col("dataset") == "linear")
    c2 = g2.groupBy("time").agg(F.count("var").alias("c")).collect()
    assert all(r["c"] == N_LAT * N_LON for r in c2)


def test_countmap(grid):
    """A4 twin: per-cell count over time; box cells T_STEPS, others 0 →
    F4's positive-nullify drops them."""
    g = grid.filter(F.col("dataset") == "mask")
    cm = g.groupBy("lat", "lon").agg(F.count("var").alias("c"))
    nonzero = cm.filter(F.col("c") > 0)
    assert nonzero.count() == BOX * BOX
    assert nonzero.filter(F.col("c") != T_STEPS).count() == 0


def test_meanmap_quirk(grid):
    """A6 twin: the reference's biased divisor (total time steps, not
    per-cell non-null counts, meanmap.py:29-38). For the mask fixture the
    box cells have all T steps → quirk invisible; for a cell outside the
    box sum is NULL (A5 min_count=1 semantics)."""
    g = grid.filter(F.col("dataset") == "mask")
    total_t = g.select(F.countDistinct("time").alias("td"))
    mm = (
        g.crossJoin(F.broadcast(total_t))
        .groupBy("lat", "lon", "td")
        .agg(F.sum("var").alias("s"))
        .select("lat", "lon", (F.col("s") / F.col("td")).alias("m"), "s")
    )
    inside = mm.filter(F.col("s").isNotNull())
    assert inside.count() == BOX * BOX
    assert inside.filter(F.abs(F.col("m") - 1.0) > 1e-12).count() == 0
    # A5: all-null cells → NULL sum, not 0
    assert mm.filter(F.col("s").isNull()).count() == N_LAT * N_LON - BOX * BOX


def test_nearest_cell_select(grid):
    """F2/W5 twin: nearest-cell select via orderBy(dist).limit(1) AND the
    closed-form grid-snap — both must pick the same cell."""
    target_lat, target_lon = 11.1, -33.3
    cells = grid.select("lat", "lon").distinct()
    d2 = (F.col("lat") - target_lat) ** 2 + (F.col("lon") - target_lon) ** 2
    top = cells.orderBy(d2.asc(), "lat", "lon").limit(1).collect()[0]
    # closed-form snap for a regular grid
    snap_lat = -90 + LAT_STEP / 2 + LAT_STEP * round((target_lat - (-90 + LAT_STEP / 2)) / LAT_STEP)
    snap_lon = -180 + LAT_STEP / 2 + LAT_STEP * round((target_lon - (-180 + LAT_STEP / 2)) / LAT_STEP)
    assert (top["lat"], top["lon"]) == (snap_lat, snap_lon)


def test_histogram_grid(grid):
    """A7/A8 twin on the linear archetype: values are the T_STEPS distinct
    ramp levels, uniformly distributed → each populated bin holds an equal
    share of the 25,920-cell-per-step grid."""
    g = grid.filter(F.col("dataset") == "linear").select("var")
    mm = g.agg(F.min("var").alias("mn"), F.max("var").alias("mx"))
    binned = g.crossJoin(F.broadcast(mm)).select(
        F.least(
            F.floor((F.col("var") - F.col("mn")) / ((F.col("mx") - F.col("mn")) / 100.0)
                    ).cast("long"),
            F.lit(99).cast("long"),
        ).alias("bin")
    )
    counts = {r["bin"]: r["c"] for r in
              binned.groupBy("bin").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert sum(counts.values()) == T_STEPS * N_LAT * N_LON
    assert all(c == N_LAT * N_LON for c in counts.values())  # uniform levels
    assert len(counts) == T_STEPS  # 20 distinct ramp levels → 20 bins


def test_bbox_and_step_inference(grid):
    """F8/F10 twins: non-null bbox of the mask fixture == the box corner;
    lag-window step inference recovers the 5° grid step."""
    from pyspark.sql import Window

    g = grid.filter((F.col("dataset") == "mask") & F.col("var").isNotNull())
    r = g.agg(
        F.min("lat").alias("lat_min"), F.max("lat").alias("lat_max"),
        F.min("lon").alias("lon_min"), F.max("lon").alias("lon_max"),
    ).collect()[0]
    assert r["lat_min"] == -87.5 and r["lat_max"] == -87.5 + (BOX - 1) * 5
    assert r["lon_min"] == -177.5 and r["lon_max"] == -177.5 + (BOX - 1) * 5
    d = grid.select("lon").distinct()
    s = d.select((F.col("lon") - F.lag("lon").over(Window.orderBy("lon"))).alias("step"))
    steps = {r["step"] for r in s.collect() if r["step"] is not None}
    assert steps == {LAT_STEP}
