"""Grid-as-table fixtures: the reference's four archetype NetCDF datasets
(FIXTURES.md §2; /root/reference/testing/ goldens) recast as the long-format
melt `(dataset, time, lat, lon, var)` with analytically-known answers.

Dimensions: T time steps (300-day stride from 2011-09-09, the reference
fixtures' non-standard-calendar cadence), LAT×LON regular grid. All values
are pure functions of the indices — no RNG.

Archetypes and their exact expected extractions:
    linear  var = 2·t/(T−1) everywhere      → weighted mean(t) = exact ramp
    sine    var = 100 + 10·sin(2πt/T)       → weighted mean(t) = that value
    mask    var = 1 in a BOX×BOX corner box, NULL elsewhere
                                            → weighted mean(t) = 1.0 exactly,
                                              count(t) = BOX²
    point   var = 1 at one cell, 0 elsewhere → weighted mean(t) = w(lat₀)/Σw
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

T_STEPS = 20
N_LAT = 36  # -87.5 .. 87.5 step 5
N_LON = 72  # -177.5 .. 177.5 step 5
LAT_STEP = 5.0
BOX = 6  # mask box edge (cells)
POINT_CELL = (20, 30)  # (lat_idx, lon_idx) of the hot cell
BASE = np.datetime64("2011-09-09T00:00:00")
STRIDE_DAYS = 300

ARCHETYPES = ("linear", "sine", "mask", "point")


def lats() -> np.ndarray:
    return -90 + LAT_STEP / 2 + LAT_STEP * np.arange(N_LAT)


def lons() -> np.ndarray:
    return -180 + LAT_STEP / 2 + LAT_STEP * np.arange(N_LON)


def lat_weight(lat_deg: float, half: float = LAT_STEP / 2) -> float:
    return math.sin(math.radians(lat_deg + half)) - math.sin(
        math.radians(lat_deg - half)
    )


def grid_pandas(dataset: str) -> pd.DataFrame:
    """One archetype as a long table; NULLs where the reference has NaN."""
    la, lo = lats(), lons()
    t_idx = np.arange(T_STEPS)
    tt, yy, xx = np.meshgrid(t_idx, np.arange(N_LAT), np.arange(N_LON),
                             indexing="ij")
    tt, yy, xx = tt.ravel(), yy.ravel(), xx.ravel()
    if dataset == "linear":
        var = 2.0 * tt / (T_STEPS - 1)
    elif dataset == "sine":
        var = 100.0 + 10.0 * np.sin(2 * np.pi * tt / T_STEPS)
    elif dataset == "mask":
        inside = (yy < BOX) & (xx < BOX)
        var = np.where(inside, 1.0, np.nan)
    elif dataset == "point":
        hot = (yy == POINT_CELL[0]) & (xx == POINT_CELL[1])
        var = np.where(hot, 1.0, 0.0)
    else:
        raise ValueError(dataset)
    return pd.DataFrame(
        {
            "dataset": dataset,
            "time": pd.Series(
                BASE + (tt * STRIDE_DAYS).astype("timedelta64[D]")
            ),
            "lat": la[yy],
            "lon": lo[xx],
            "var": var,
        }
    )


def grid_df(spark, datasets: tuple[str, ...] = ARCHETYPES):
    pdf = pd.concat([grid_pandas(d) for d in datasets], ignore_index=True)
    # NaN → NULL (Spark treats NaN as a value, not NULL; the reference's
    # skipna semantics require SQL NULL)
    pdf["var"] = pdf["var"].astype(object).where(pd.notnull(pdf["var"]), None)
    return spark.createDataFrame(pdf)


def expected_weighted_mean(dataset: str, t: int) -> float:
    """The analytically-known answer per archetype and time step."""
    if dataset == "linear":
        return 2.0 * t / (T_STEPS - 1)
    if dataset == "sine":
        return 100.0 + 10.0 * math.sin(2 * math.pi * t / T_STEPS)
    if dataset == "mask":
        return 1.0
    if dataset == "point":
        la = lats()
        w_hot = lat_weight(la[POINT_CELL[0]])
        total = sum(lat_weight(x) for x in la) * N_LON
        return w_hot / total
    raise ValueError(dataset)
