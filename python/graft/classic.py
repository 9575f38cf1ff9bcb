"""Classic (py4j) client for the graft engine.

Same user-facing surface as the Connect client (:mod:`graft.client` —
both inherit the method tables in :mod:`graft.api`), but for a CLASSIC
pyspark session: each call crosses the py4j gateway into
``graft.GraftPythonAPI``, which routes through the same
``GraftConnectDispatch`` method table the Connect plugin uses — the two
transports cannot drift.

The graft jar/classes must be on the driver classpath
(``spark.jars`` / ``spark.driver.extraClassPath``)::

    from graft.classic import GraphFrame, Pipeline
    g = GraphFrame(vertices_df, edges_df)      # classic pyspark DataFrames
    g.pageRank(maxIter=10).show()
    Pipeline(docs_df).nearDupClusters(idCol="doc_id", textCol="text").show()

Mirrors the role of the reference's classic wrapper
(python/graphframes/classic/graphframe.py over GraphFramePythonAPI).
"""

from __future__ import annotations

import json
from typing import Any, Optional

from pyspark.sql import DataFrame

from .api import GraphFrameMethods, PipelineMethods


def _invoke(edges: DataFrame, vertices: Optional[DataFrame],
            algorithm: str, params: dict[str, Any]) -> DataFrame:
    spark = edges.sparkSession
    jvm = spark._jvm
    kept = {k: v for k, v in params.items() if v is not None}
    jdf = jvm.graft.GraftPythonAPI.run(
        None if vertices is None else vertices._jdf,
        edges._jdf,
        algorithm,
        json.dumps(kept) if kept else "",
    )
    return DataFrame(jdf, spark)


class GraphFrame(GraphFrameMethods):
    """Classic-session graph handle: a pair of pyspark DataFrames."""

    def __init__(self, vertices: Optional[DataFrame], edges: DataFrame) -> None:
        if edges is None:
            raise ValueError("edges DataFrame is required")
        self._vertices = vertices
        self._edges = edges

    @classmethod
    def fromEdges(cls, edges: DataFrame) -> "GraphFrame":
        """Vertices inferred server-side from edge endpoints."""
        return cls(None, edges)

    @property
    def vertices(self) -> Optional[DataFrame]:
        return self._vertices

    @property
    def edges(self) -> DataFrame:
        return self._edges

    def _call(self, _algorithm: str, **params: Any) -> DataFrame:
        return _invoke(self._edges, self._vertices, _algorithm, params)


class Pipeline(PipelineMethods):
    """Classic-session handle for the single-table LLM-pipeline operators
    (dedup, text quality, ANN, multimodal)."""

    def __init__(self, table: DataFrame) -> None:
        if table is None:
            raise ValueError("input table DataFrame is required")
        self._table = table

    def _call(self, _algorithm: str, **params: Any) -> DataFrame:
        return _invoke(self._table, None, _algorithm, params)

    def _call2(self, _left: DataFrame, _algorithm: str,
               **params: Any) -> DataFrame:
        # two-table ops (asofJoin): left rides the vertices slot
        return _invoke(self._table, _left, _algorithm, params)
