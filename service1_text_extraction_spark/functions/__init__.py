"""Relational + training-data operators over the driver's test tables.

Each public function here takes ``(spark, sf_dir)`` and returns a
DataFrame; `__spark_entry__.queries()` exposes them to the driver,
and `__spark_entry__.oracle_sql()` carries the matching DuckDB SQL.
Column names/aliases are kept identical on both sides (the driver's
compare hashes values under sorted column names).
"""
