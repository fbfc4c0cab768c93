"""Column-expression and pandas-UDF building blocks.

Everything here is either a pure `pyspark.sql.functions` expression factory
(JVM-side, whole-stage-codegen'd) or an Arrow-vectorized pandas UDF — never a
row-at-a-time Python UDF (north_rule: "no per-row Python anywhere"; reference
analogue: whole-array numpy kernels, e.g.
/root/reference/isimip_qa/extractions/histogram.py:50).
"""
