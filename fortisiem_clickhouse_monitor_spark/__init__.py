"""PySpark-native analytics engine with the query and data-processing
capabilities of kmickeletto/fortisiem-clickhouse-monitor (reference:
/root/reference/chStats.py), re-expressed Spark-first.

Nothing here is a port: the reference pushes SQL to ClickHouse and reshapes
JSON rows with Python dicts; this engine declares equivalent logical plans
with the DataFrame API and lets Catalyst/Tungsten/AQE pick the physical
strategy. See SURVEY.md for the operator-by-operator mapping.
"""

__version__ = "0.1.0"
