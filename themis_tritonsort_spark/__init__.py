"""PySpark-native analytics engine with the capability surface of
Themis/TritonSort (TritonNetworking/themis_tritonsort).

The reference is a pipelined MapReduce framework (map -> range/hash
shuffle -> sort -> grouped reduce).  This package re-expresses that
capability surface Spark-first: DataFrame/SQL plans that Catalyst and
Tungsten optimize, with grouped Pandas UDFs only where semantics are
genuinely sequential (e.g. the reference's anchor-reset sessionization).

Layout:
  session     -- tuned SparkSession factory
  data        -- testdata table loading
  functions/  -- scalar function library (text, hashing, vectors, money)
  operators/  -- relational + beyond-reference operators
  sources/    -- byte-parity sources/sinks (gensort records, text lines)
  plans/      -- job-spec (the reference's query IR) -> DataFrame pipeline
  streaming/  -- structured-streaming analogs
  queries     -- the declared-query catalog (Spark fn + DuckDB oracle SQL)
"""

__version__ = "0.1.0"
