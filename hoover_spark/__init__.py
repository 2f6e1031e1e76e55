"""hoover_spark — a PySpark-native link-graph analytics engine.

A from-scratch reimplementation of the *capabilities* of HOOVER
(nanding0701/hoover: "Low Latency, Distributed, Flexible, Streaming
Graph Analytics" — a C/C++ OpenSHMEM SPMD runtime) as an idiomatic
Apache Spark engine:

- data model: DataFrames (``edges(src,dst)``, ``vertices(vid,...)``)
  instead of fixed-width vertex records + per-vertex AVL adjacency
  (reference: ``inc/hvr_vertex.h``, ``inc/hvr_irregular_matrix.h``);
- data movement: Spark shuffle/broadcast instead of the reference's
  partition pub/sub + symmetric-heap mailboxes (``src/hvr_mailbox.cpp``);
- kernels: PageRank, weakly-connected components (hash-min label
  exchange, reference ``test/connected_components.c:88-112``), label
  propagation, triangle counting (``test/count_triangles.c:90-133``)
  expressed as DataFrame joins/aggregations with explicit skew salting,
  checkpointed resumable iteration and per-iteration lineage metrics;
- streaming: Structured Streaming micro-batch edge ingestion with warm
  incremental re-convergence (reference ``test/update_rates.cpp:30-55``).

Everything here derives from public knowledge only (Apache Spark API,
the public reference repo, published papers on connected components /
PageRank / MinHash LSH).
"""

__version__ = "0.1.0"

from hoover_spark.session import get_spark  # noqa: F401
