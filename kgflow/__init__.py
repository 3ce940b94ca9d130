"""kgflow — a from-scratch PySpark-native knowledge-graph construction engine.

Generalizes the row-to-graph semantics of the reference pipeline
(joy-neo4j/neo4j-databricks-azure-pipeline, studied read-only at /root/reference)
into a four-stage DataFrame job over a source-code repository table:

    ingest -> extract -> link -> canonicalize -> materialize

Everything is declarative DataFrame/Catalyst; the only Python on the
datapath is Arrow-vectorized (pandas UDF) extraction, and even that has
a pure-native (JVM regexp) twin used as the default fast path.

Design notes (vs the reference, cited by file:line in each module):
  * stages communicate only through stage-output tables (the one
    architecture decision of the reference worth keeping — its job DAG
    hands state between clusters only via Delta tables,
    databricks/jobs/etl-pipeline-job.json:12-85);
  * the reference's driver-side collect()+batched-Cypher sink
    (databricks/notebooks/neo4j-loading.py:202-336) is replaced by fully
    distributed file materialization in Neo4j bulk-loader shape;
  * checkpoint/resume and per-partition lineage, aspirational in the
    reference (configs/data-sources.yml:112), are mandatory here.
"""

__version__ = "0.1.0"
