"""S2/S3 sources: link-graph edge list and URL-map TSV readers.

Reference mapping:
- S2: ``IcsSearchEngine.java:92-98`` reads ``id-graph.tsv`` line-by-line,
  splitting each line on whitespace into ``(from, to)`` int pairs.
- S3: the test harness reads ``url.tsv`` into an id<->url bimap
  (``IcsSearchEngineTest.java:57-59``).

Both become schema'd ``spark.read.csv`` scans — at cluster scale the TSV
splits read in parallel; a malformed line fails the job (PERMISSIVE would
null it) exactly like the reference's ``Integer.parseInt`` would throw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

EDGE_SCHEMA = StructType(
    [StructField("src", LongType(), False), StructField("dst", LongType(), False)]
)

URL_SCHEMA = StructType(
    [StructField("doc_id", LongType(), False), StructField("url", StringType(), False)]
)


def load_edge_list(spark: SparkSession, path: str, sep: str = "\t") -> DataFrame:
    """S2: ``id-graph.tsv``-shaped edge list -> (src, dst) DataFrame."""
    df = spark.read.schema(EDGE_SCHEMA).option("sep", sep).option("mode", "FAILFAST").csv(path)
    return df


def load_url_map(spark: SparkSession, path: str, sep: str = "\t") -> DataFrame:
    """S3: ``url.tsv``-shaped id->url map -> (doc_id, url) DataFrame."""
    return spark.read.schema(URL_SCHEMA).option("sep", sep).option("mode", "FAILFAST").csv(path)


def graph_nodes(edges: DataFrame) -> DataFrame:
    """Node set of an edge list (the reference sizes its PR array from the
    corpus; standalone graph jobs derive nodes from the edges)."""
    return (
        edges.select(F.col("src").alias("docId"))
        .unionByName(edges.select(F.col("dst").alias("docId")))
        .distinct()
    )
