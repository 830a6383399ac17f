"""obmp_psql_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of OpenBMP/obmp-psql, re-expressed
Spark-first (DataFrame/SQL + Catalyst + Structured Streaming).

Layout
------
- ``session``    SparkSession factory + table loading
- ``schemas``    fixed StructTypes for the 10 BMP message types and state tables
- ``functions``  column-expression libraries (net/IP math, arrays, text)
- ``operators``  reusable operator implementations (dedup, merge-upsert,
                 CDC, LPM/range join, rollups, global RIB, similarity)
- ``sources``    batch/streaming source builders (TSV messages, Kafka,
                 geo CSV, RPKI JSON, PeeringDB, IRR)
- ``plans``      the view layer (v_peers, v_ip_routes, ...)
- ``streaming``  Structured Streaming pipelines (ingest with
                 foreachBatch upsert + CDC)

Reference parity is cited per function as ``/root/reference/<file>:<lines>``.
"""

__version__ = "0.1.0"
