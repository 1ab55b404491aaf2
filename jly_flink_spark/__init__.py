"""jly_flink_spark — a PySpark-native engine with the query and
data-processing capabilities of the reference CDC-archival job
(xiaoyunwen/jly-flink), rebuilt Spark-first.

The reference (see SURVEY.md) is a Flink CDC pipeline: MySQL binlog
-> keep DELETE events -> project {id, fb_no, record_del_time,
data_json} -> archive to AnalyticDB (JDBC) + StarRocks (Stream Load).
This package reproduces those pipeline semantics on the Spark
DataFrame / Structured Streaming stack and adds the general
relational surface plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Design stance: everything is a declarative DataFrame plan so Catalyst
handles pushdown / pruning / join selection; Python UDFs appear only
where built-ins genuinely cannot express the semantics (and then as
Arrow-vectorized pandas UDFs).
"""

__version__ = "0.1.0"
