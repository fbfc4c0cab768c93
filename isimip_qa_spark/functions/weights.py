"""Latitude area weights + weighted-mean aggregation (reference A1/A2,
/root/reference/isimip_qa/extractions/mean.py:30-35).

The reference computes w(lat) = sin(lat+Δ/2) − sin(lat−Δ/2) in radians (the
exact area of a Δ-degree latitude band on the unit sphere) unless a CDO
gridarea table overrides it; the weighted mean uses xarray's weighted-skipna
semantics: the weight sum counts only rows whose value is non-null.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def lat_weight_expr(lat: Column, half_width: float = 0.25) -> Column:
    """w(lat) = sin(lat + Δ/2) − sin(lat − Δ/2), degrees in, radians inside
    (mean.py:31: `np.sin(np.deg2rad(lat+0.25)) - np.sin(np.deg2rad(lat-0.25))`)."""
    return F.sin(F.radians(lat + F.lit(half_width))) - F.sin(
        F.radians(lat - F.lit(half_width))
    )


def weighted_mean_agg(value: Column, weight: Column) -> Column:
    """xarray weighted-skipna mean: Σ(w·v) / Σ(w where v not null)."""
    num = F.sum(
        F.when(value.isNotNull(), weight * value)
    )
    den = F.sum(F.when(value.isNotNull(), weight))
    return num / den
