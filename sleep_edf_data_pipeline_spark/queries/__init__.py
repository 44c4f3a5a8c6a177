"""Oracle-checked query registry.

Each module exposes ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` (DuckDB SQL over the same
parquet tables).  ``registry.collect()`` merges them for
``__spark_entry__``.

Convention: every float column an engine *computes* (aggregates, window
averages, divisions chained through aggregates) is wrapped in
``round(x, 6)`` on BOTH sides so association-order differences between
Spark's and DuckDB's float accumulation cannot flip the driver's value
hash.  Pure scalar math on identical inputs is bit-exact under IEEE 754
and is left unrounded.
"""
