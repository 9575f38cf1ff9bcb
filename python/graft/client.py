"""Spark Connect client for the graft engine.

Wraps two pyspark-connect DataFrames (vertices, edges) and exposes the
graph-algorithm surface served by ``graft.connect.GraftRelationPlugin``
(see the Scala side's ``GraftConnectDispatch`` for the authoritative
algorithm/parameter table). Each method ships a ``graft.GraftRelation``
extension relation — the message bytes are produced by the dependency-free
codec in :mod:`graft.wire`, so this package needs no protobuf codegen; the
``google.protobuf.Any`` envelope is filled in field-by-field on the plan's
``extension`` slot.

Server setup::

    spark.connect.extensions.relation.classes=graft.connect.GraftRelationPlugin

Client::

    from graft import GraphFrame
    g = GraphFrame(vertices_df, edges_df)     # pyspark-connect DataFrames
    g.pageRank(maxIter=10, resetProb=0.15).show()
    g.find("(a)-[e]->(b); (b)-[e2]->(a)").show()
    g.connectedComponents().show()

Column-valued parameters (filter conditions, message expressions) are SQL
expression strings — the server parses them with ``expr()``, the same
contract the reference's ColumnOrExpression ``expr`` arm uses.

Requires pyspark >= 4 with the Connect extras (pyspark[connect]); the
import lives inside this module so :mod:`graft.wire` stays importable in
dependency-free environments.
"""

from __future__ import annotations

import json
from typing import Any, Optional

from pyspark.sql.connect.dataframe import DataFrame
from pyspark.sql.connect.plan import LogicalPlan

from .api import GraphFrameMethods, PipelineMethods
from .wire import TYPE_URL, encode_graft_relation


class _GraftRelationPlan(LogicalPlan):
    """A Connect logical plan that serializes to a GraftRelation
    extension. Vertices/edges plans are embedded as serialized
    spark.connect.Relation messages (an embedded message field and a
    bytes field holding its serialization are wire-identical)."""

    def __init__(
        self,
        algorithm: str,
        vertices: Optional[DataFrame],
        edges: DataFrame,
        params: dict[str, Any],
    ) -> None:
        super().__init__(None)
        self._algorithm = algorithm
        self._vertices = vertices
        self._edges = edges
        self._params = {k: v for k, v in params.items() if v is not None}

    def plan(self, session):  # session: SparkConnectClient
        plan = self._create_proto_relation()
        wire = encode_graft_relation(
            algorithm=self._algorithm,
            edges=self._edges._plan.to_proto(session).SerializeToString(),
            vertices=None if self._vertices is None
            else self._vertices._plan.to_proto(session).SerializeToString(),
            params_json=json.dumps(self._params) if self._params else "",
        )
        # fill the Any envelope directly instead of Pack()ing a generated
        # message class — the wire bytes are already final
        plan.extension.type_url = TYPE_URL
        plan.extension.value = wire
        return plan


class GraphFrame(GraphFrameMethods):
    """Client-side graph handle: a pair of pyspark-connect DataFrames."""

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
        session = self._edges._session
        plan = _GraftRelationPlan(_algorithm, self._vertices, self._edges, params)
        return DataFrame(plan, session)


class Pipeline(PipelineMethods):
    """Client-side handle for the single-table LLM-pipeline operators
    (dedup, text quality, ANN) served by the same plugin. The input
    table rides in the wire message's edges slot; no graph is built.

    ::

        from graft import Pipeline
        p = Pipeline(documents_df)
        p.nearDupClusters(idCol="doc_id", textCol="text").show()
        Pipeline(embeddings_df).annTopK(idCol="vec_id", vecCol="embedding", k=5).show()
    """

    def __init__(self, table: DataFrame) -> None:
        if table is None:
            raise ValueError("input table DataFrame is required")
        self._table = table

    def _call(self, _algorithm: str, **params: Any) -> DataFrame:
        session = self._table._session
        plan = _GraftRelationPlan(_algorithm, None, self._table, params)
        return DataFrame(plan, session)

    def _call2(self, _left: DataFrame, _algorithm: str,
               **params: Any) -> DataFrame:
        # two-table ops (asofJoin): left rides the vertices slot
        session = self._table._session
        plan = _GraftRelationPlan(_algorithm, _left, self._table, params)
        return DataFrame(plan, session)
