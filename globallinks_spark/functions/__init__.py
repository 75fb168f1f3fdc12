"""Expression builders: URL kernel, predicates, hashing, text, vectors.

Everything here returns pyspark Columns built from ``pyspark.sql.functions``
(JVM-side, whole-stage-codegen'd) except the single pandas UDF for
public-suffix eTLD+1 — the reference's only non-relational scalar
(SURVEY §2.9).
"""
