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


class GraphFrame:
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

    def _call(self, algorithm: str, **params: Any) -> DataFrame:
        session = self._edges._session
        plan = _GraftRelationPlan(algorithm, self._vertices, self._edges, params)
        return DataFrame(plan, session)

    # --- structure -----------------------------------------------------
    def triplets(self) -> DataFrame:
        return self._call("triplets")

    def degrees(self) -> DataFrame:
        return self._call("degrees")

    def inDegrees(self) -> DataFrame:
        return self._call("in_degrees")

    def outDegrees(self) -> DataFrame:
        return self._call("out_degrees")

    def filterVertices(self, condition: str) -> DataFrame:
        return self._call("filter_vertices", condition=condition)

    def filterEdges(self, condition: str) -> DataFrame:
        return self._call("filter_edges", condition=condition)

    def dropIsolatedVertices(self) -> DataFrame:
        return self._call("drop_isolated_vertices")

    # --- patterns ------------------------------------------------------
    def find(self, pattern: str) -> DataFrame:
        return self._call("find", pattern=pattern)

    def bfs(self, fromExpr: str, toExpr: str,
            maxPathLength: Optional[int] = None) -> DataFrame:
        return self._call("bfs", fromExpr=fromExpr, toExpr=toExpr,
                          maxPathLength=maxPathLength)

    # --- message passing ----------------------------------------------
    def pregel(self, vertexColName: str, initExpr: str, updateExpr: str,
               aggMsgs: str, sendToDst: Optional[str] = None,
               sendToSrc: Optional[str] = None, maxIter: Optional[int] = None,
               checkpointInterval: Optional[int] = None) -> DataFrame:
        return self._call(
            "pregel", vertexColName=vertexColName, initExpr=initExpr,
            updateExpr=updateExpr, aggMsgs=aggMsgs, sendToDst=sendToDst,
            sendToSrc=sendToSrc, maxIter=maxIter,
            checkpointInterval=checkpointInterval)

    def aggregateMessages(self, aggCol: str, sendToDst: Optional[str] = None,
                          sendToSrc: Optional[str] = None) -> DataFrame:
        return self._call("aggregate_messages", aggCol=aggCol,
                          sendToDst=sendToDst, sendToSrc=sendToSrc)

    def aggregateNeighbors(self, aggCol: str,
                           maxHops: Optional[int] = None) -> DataFrame:
        return self._call("aggregate_neighbors", aggCol=aggCol, maxHops=maxHops)

    # --- algorithms ----------------------------------------------------
    def connectedComponents(self, algorithm: Optional[str] = None) -> DataFrame:
        return self._call("connected_components", algorithm=algorithm)

    def stronglyConnectedComponents(self,
                                    maxIter: Optional[int] = None) -> DataFrame:
        return self._call("strongly_connected_components", maxIter=maxIter)

    def pageRank(self, resetProb: Optional[float] = None,
                 maxIter: Optional[int] = None, tol: Optional[float] = None,
                 sourceId: Optional[Any] = None) -> DataFrame:
        return self._call("page_rank", resetProb=resetProb, maxIter=maxIter,
                          tol=tol, sourceId=sourceId)

    def parallelPersonalizedPageRank(
            self, sourceIds: list, resetProb: Optional[float] = None,
            maxIter: Optional[int] = None) -> DataFrame:
        return self._call("parallel_personalized_page_rank",
                          sourceIds=sourceIds, resetProb=resetProb,
                          maxIter=maxIter)

    def shortestPaths(self, landmarks: list,
                      maxIter: Optional[int] = None) -> DataFrame:
        return self._call("shortest_paths", landmarks=landmarks, maxIter=maxIter)

    def labelPropagation(self, maxIter: Optional[int] = None) -> DataFrame:
        return self._call("label_propagation", maxIter=maxIter)

    def triangleCount(self) -> DataFrame:
        return self._call("triangle_count")

    def kCore(self, maxIter: Optional[int] = None) -> DataFrame:
        return self._call("kcore", maxIter=maxIter)

    def maximalIndependentSet(self, maxIter: Optional[int] = None,
                              hashMode: Optional[str] = None) -> DataFrame:
        return self._call("maximal_independent_set", maxIter=maxIter,
                          hashMode=hashMode)

    def detectingCycles(self, maxIter: Optional[int] = None) -> DataFrame:
        return self._call("detecting_cycles", maxIter=maxIter)

    def randomWalks(self, walkLength: Optional[int] = None,
                    walksPerVertex: Optional[int] = None,
                    restartProb: Optional[float] = None,
                    seed: Optional[int] = None,
                    hashMode: Optional[str] = None) -> DataFrame:
        return self._call("random_walks", walkLength=walkLength,
                          walksPerVertex=walksPerVertex,
                          restartProb=restartProb, seed=seed, hashMode=hashMode)

    def powerIterationClustering(self, k: int, maxIter: Optional[int] = None,
                                 weightCol: Optional[str] = None) -> DataFrame:
        return self._call("power_iteration_clustering", k=k, maxIter=maxIter,
                          weightCol=weightCol)

    def svdPlusPlus(self, rank: Optional[int] = None,
                    maxIter: Optional[int] = None,
                    minValue: Optional[float] = None,
                    maxValue: Optional[float] = None) -> DataFrame:
        return self._call("svd_plus_plus", rank=rank, maxIter=maxIter,
                          minValue=minValue, maxValue=maxValue)

    def rwEmbeddings(self, dim: Optional[int] = None,
                     walkLength: Optional[int] = None,
                     walksPerVertex: Optional[int] = None,
                     seed: Optional[int] = None) -> DataFrame:
        return self._call("rw_embeddings", dim=dim, walkLength=walkLength,
                          walksPerVertex=walksPerVertex, seed=seed)


class Pipeline:
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

    def _call(self, algorithm: str, **params: Any) -> DataFrame:
        session = self._table._session
        plan = _GraftRelationPlan(algorithm, None, self._table, params)
        return DataFrame(plan, session)

    # --- dedup ---------------------------------------------------------
    def exactDedup(self, idCol: str, contentCols: list) -> DataFrame:
        return self._call("pipe_exact_dedup", idCol=idCol, contentCols=contentCols)

    def minhashLsh(self, idCol: str, textCol: str,
                   shingle: Optional[int] = None, bands: Optional[int] = None,
                   rowsPerBand: Optional[int] = None) -> DataFrame:
        return self._call("pipe_minhash_lsh", idCol=idCol, textCol=textCol,
                          shingle=shingle, bands=bands, rowsPerBand=rowsPerBand)

    def nearDupClusters(self, idCol: str, textCol: str,
                        shingle: Optional[int] = None,
                        bands: Optional[int] = None,
                        rowsPerBand: Optional[int] = None) -> DataFrame:
        return self._call("pipe_near_dup_clusters", idCol=idCol, textCol=textCol,
                          shingle=shingle, bands=bands, rowsPerBand=rowsPerBand)

    def simhash(self, idCol: str, textCol: str,
                bits: Optional[int] = None) -> DataFrame:
        return self._call("pipe_simhash", idCol=idCol, textCol=textCol, bits=bits)

    def semanticDedup(self, idCol: str, vecCol: str, threshold: float,
                      nlist: Optional[int] = None,
                      lloydIters: Optional[int] = None) -> DataFrame:
        return self._call("pipe_semantic_dedup", idCol=idCol, vecCol=vecCol,
                          threshold=threshold, nlist=nlist, lloydIters=lloydIters)

    # --- text ----------------------------------------------------------
    def tokenCount(self, idCol: str, textCol: str) -> DataFrame:
        return self._call("pipe_token_count", idCol=idCol, textCol=textCol)

    def languageId(self, idCol: str, textCol: str) -> DataFrame:
        return self._call("pipe_language_id", idCol=idCol, textCol=textCol)

    def quality(self, idCol: str, textCol: str) -> DataFrame:
        return self._call("pipe_quality", idCol=idCol, textCol=textCol)

    def charEntropy(self, idCol: str, textCol: str) -> DataFrame:
        return self._call("pipe_char_entropy", idCol=idCol, textCol=textCol)

    def redactPii(self, idCol: str, textCol: str) -> DataFrame:
        return self._call("pipe_redact_pii", idCol=idCol, textCol=textCol)

    def hashSample(self, idCol: str, fraction: float,
                   seed: Optional[int] = None) -> DataFrame:
        return self._call("pipe_hash_sample", idCol=idCol, fraction=fraction,
                          seed=seed)

    # --- multimodal (JDK-codec image/audio kernels) --------------------
    def imageDecode(self, idCol: str, binCol: str) -> DataFrame:
        return self._call("pipe_image_decode", idCol=idCol, binCol=binCol)

    def imageResize(self, idCol: str, binCol: str, width: int,
                    height: int) -> DataFrame:
        return self._call("pipe_image_resize", idCol=idCol, binCol=binCol,
                          width=width, height=height)

    def imageHistogram(self, idCol: str, binCol: str,
                       bins: Optional[int] = None) -> DataFrame:
        return self._call("pipe_image_histogram", idCol=idCol, binCol=binCol,
                          bins=bins)

    def audioDecode(self, idCol: str, binCol: str) -> DataFrame:
        return self._call("pipe_audio_decode", idCol=idCol, binCol=binCol)

    def videoDemux(self, idCol: str, binCol: str) -> DataFrame:
        return self._call("pipe_video_demux", idCol=idCol, binCol=binCol)

    # --- ANN -----------------------------------------------------------
    def annTopK(self, idCol: str, vecCol: str, k: int) -> DataFrame:
        return self._call("pipe_ann_topk", idCol=idCol, vecCol=vecCol, k=k)

    def annIvfHier(self, idCol: str, vecCol: str, k: int,
                   nsuper: Optional[int] = None, nlistPer: Optional[int] = None,
                   wprobe: Optional[int] = None,
                   nprobe: Optional[int] = None) -> DataFrame:
        return self._call("pipe_ann_ivf_hier", idCol=idCol, vecCol=vecCol, k=k,
                          nsuper=nsuper, nlistPer=nlistPer, wprobe=wprobe,
                          nprobe=nprobe)
