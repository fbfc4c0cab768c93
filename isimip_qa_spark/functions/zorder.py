"""Z-order (Morton) interleaving for multi-dimension data skipping.

A 100-TB table range-partitioned on ONE column prunes scans on that
column only; a crawl workload filters on several (host bucket × capture
time, length × quality, lat × lon in the reference's grids —
the reference's map extractions are exactly 2-D lat/lon cell scans,
/root/reference/isimip_qa/extractions/meanmap.py). Writing the table sorted
by the bit-interleaved key gives every file a tight min/max box in BOTH
dimensions, so parquet footer stats (and an Iceberg manifest) prune box
queries in either or both dims.

The key is a pure column expression — 2·BITS shift/mask/or terms, all
inside whole-stage codegen, no UDF — and has an exact DuckDB twin (same
shifts), so the query registry can hash-check it cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ZBITS = 16  # per-dimension bits: 2 dims x 16 -> 32-bit key in an int64


def zorder_key_expr(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Interleave the low `bits` of two non-negative int columns:
    bit b of x lands at 2b, bit b of y at 2b+1. Values >= 2^bits SATURATE
    to 2^bits - 1 (a long-document tail must sort at the top of the key
    range, not alias onto the smallest keys and smear every file's
    min/max box across the full dimension)."""
    cap = F.lit((1 << bits) - 1).cast("long")
    xc = F.least(x.cast("long"), cap)
    yc = F.least(y.cast("long"), cap)
    terms = []
    for b in range(bits):
        xb = F.shiftright(xc, b).bitwiseAND(F.lit(1))
        yb = F.shiftright(yc, b).bitwiseAND(F.lit(1))
        terms.append(F.shiftleft(xb, 2 * b))
        terms.append(F.shiftleft(yb, 2 * b + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def zorder_key_sql(x: str, y: str, bits: int = ZBITS) -> str:
    """DuckDB twin: identical saturate + shift/mask/or tree. Every term is
    fully parenthesized — DuckDB's bitwise <<, &, | share one precedence
    level left-associatively, so `a | b << c` would parse as
    `(a | b) << c`."""
    cap = (1 << bits) - 1
    xs = f"least(({x})::BIGINT, {cap})"
    ys = f"least(({y})::BIGINT, {cap})"
    terms = []
    for b in range(bits):
        terms.append(f"((({xs} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({ys} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(df, path: str, x: str, y: str, n_files: int) -> None:
    """Write `df` laid out by z-key: range partition on the key (one
    deliberate exchange — layout jobs pay one shuffle by definition),
    sort within partitions, one file per range. Readers prune with plain
    min/max stats on the ORIGINAL columns: no z-decoding at read time."""
    z = zorder_key_expr(F.col(x), F.col(y))
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.parquet(path, mode="overwrite")
    )
