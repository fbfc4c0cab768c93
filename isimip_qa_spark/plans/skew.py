"""Crawl-domain skew handling: salted repartition on url-host.

The reference is single-node and has no skew story; the north_rule mandates
one. Web crawls are Zipfian in host — a groupBy/repartition keyed on host
alone puts 20 %+ of the corpus in one task. Strategy:

1. detect hot hosts with a cheap aggregate (at 100 TB: sample or use
   partition statistics; here exact count, it's one shuffle of (host, 1));
2. rows of hot hosts get a salt from xxhash64(url) % n_salts, others salt 0;
3. `repartition(n, host, salt)` spreads each hot host over n_salts tasks.

Downstream per-host aggregations run two-phase: partial on (host, salt),
final on host — the classic salted agg; AQE's skew-join splitting covers the
join side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_expr(url_col: str = "url"):
    return F.parse_url(F.col(url_col), F.lit("HOST"))


def hot_host_counts(df: DataFrame, frac: float = 0.05, url_col: str = "url") -> DataFrame:
    """Hosts holding more than `frac` of all rows, as a (lazy) DataFrame.

    The total comes from a broadcast 1-row scalar aggregate crossJoined back
    onto the host counts — NOT an unpartitioned window, which would funnel
    every (host, n) row through a single task (a web crawl has 10⁷-10⁸
    hosts; the skew-*fixing* job must not itself have a single-task stage).
    Both sides reuse one shuffled host aggregate; the scalar side is a
    partial→final agg, so nothing bigger than one row moves to one task.
    Asserted in tests/test_plans.py (no `Exchange SinglePartition` feeding a
    Window)."""
    counts = (
        df.select(host_expr(url_col).alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("tot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n") > F.col("tot") * frac)
        .select("host")
    )


def detect_hot_hosts(df: DataFrame, frac: float = 0.05, url_col: str = "url") -> list[str]:
    """Collect the (tiny-by-construction) hot-host list; at 100 TB run this
    on a sample or table partition statistics instead of a full scan."""
    return [r["host"] for r in hot_host_counts(df, frac, url_col).collect()]


def salted_repartition(
    df: DataFrame,
    n_partitions: int,
    hot_hosts: list[str],
    n_salts: int = 8,
    url_col: str = "url",
) -> DataFrame:
    """Repartition on (host, salt): hot hosts spread over n_salts buckets."""
    host = host_expr(url_col)
    if hot_hosts:
        salt = F.when(
            host.isin(*hot_hosts), F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_salts))
        ).otherwise(F.lit(0))
    else:
        salt = F.lit(0)
    return df.repartition(n_partitions, host, salt)
