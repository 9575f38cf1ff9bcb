package graft.pattern

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * Compiles a parsed motif into a DataFrame by folding terms left-to-right,
 * each term augmenting the running plan with equi-joins (reference
 * GraphFrame.scala:988-996, 1434-1618). Every named element becomes a
 * struct column holding the full vertex/edge row; negation lowers to
 * `except`; anonymous elements get generated names that are dropped from
 * the final projection.
 *
 * Extensions over the plain directed core:
 *  - undirected terms `(a)-[e]-(b)` expand into the union of both
 *    orientations, tagged by a `_direction` column ("fwd"/"rev" per
 *    undirected term, `;`-joined);
 *  - variable-length `(a)-[e*1..3]->(b)` unions the per-hop expansions
 *    with a `_hop` column (reference GraphFrame.scala:625-657);
 *  - vertex-join ELIMINATION (the reference left this commented out as
 *    blocked on engine-side indexing, PatternMatchSuite.scala:851-874):
 *    when the graph carries the referential-integrity contract
 *    ([[GraphFrame.edgeEndpointsComplete]]) an endpoint vertex whose
 *    attributes are not needed — the vertex table is `id`-only, or the
 *    caller's `keep` projection drops the name — is bound straight to the
 *    edge's src/dst column instead of joining the vertex table. A
 *    triangle on a `fromEdges` graph then compiles to two edge-edge
 *    joins and zero vertex joins.
 *
 * Scale: each term is an inner equi-join that Catalyst plans (broadcast vs
 * shuffled-hash vs sort-merge chosen by AQE at runtime); no driver-side
 * iteration, one job for the whole motif.
 */
private[graft] object MotifCompiler {
  import GraphFrame.{ID, SRC, DST}

  private val VarLength = """\*(\d+)\.\.(\d+)""".r

  def find(g: GraphFrame, motif: String, keep: Option[Seq[String]] = None): DataFrame = {
    // the __tmp prefix is this compiler's internal namespace (anonymous
    // edges, fixed-length expansion intermediates) and such columns are
    // dropped from the output — a user-chosen __tmp* name would silently
    // vanish, so reject it loudly instead. (Deliberate divergence from the
    // reference, which exposes its expansion intermediates as _uvN /
    // accepts user __tmp — reference PatternMatchSuite.scala:484-488; our
    // DSL hides intermediates by design, see the class doc.)
    require(!motif.contains("__tmp"),
      "Motif: names starting with __tmp are reserved for the compiler")
    VarLength.findFirstMatchIn(motif) match {
      case Some(m) =>
        val (lo, hi) = (m.group(1).toInt, m.group(2).toInt)
        require(lo >= 1 && hi >= lo,
          s"Motif: variable-length bounds must satisfy 1 <= min <= max, got *$lo..$hi")
        require(VarLength.findAllIn(motif).size == 1,
          "Motif: at most one variable-length edge is supported")
        val perHop = (lo to hi).map { h =>
          findFixed(g, motif.replaceFirst(VarLength.regex, s"*$h"), keep)
            .withColumn("_hop", lit(h))
        }
        perHop.reduce(_ unionByName (_, allowMissingColumns = true))
          .orderBy("_hop")
      case None => findFixed(g, motif, keep)
    }
  }

  private def findFixed(g: GraphFrame, motif: String,
      keep: Option[Seq[String]]): DataFrame = {
    val parsed = PatternParser.parse(motif)
    val augmented = augmentNegationOnlyVertices(parsed)

    // output order: first appearance of user-visible names
    val outOrder = scala.collection.mutable.LinkedHashSet.empty[String]
    val vertexNames = scala.collection.mutable.Set.empty[String]
    def collectNames(p: Pattern): Unit = p match {
      case VertexPattern(NamedVertex(n)) => outOrder += n; vertexNames += n
      case EdgePattern(a, e, b) =>
        a match { case NamedVertex(n) => outOrder += n; vertexNames += n; case _ => }
        e match { case NamedEdge(n) => outOrder += n; case _ => }
        b match { case NamedVertex(n) => outOrder += n; vertexNames += n; case _ => }
      case UndirectedEdgePattern(a, e, b) =>
        a match { case NamedVertex(n) => outOrder += n; vertexNames += n; case _ => }
        e match { case NamedEdge(n) => outOrder += n; case _ => }
        b match { case NamedVertex(n) => outOrder += n; vertexNames += n; case _ => }
      case Negation(e) => collectNames(e) // edge names are forbidden inside
      case _ =>
    }
    parsed.foreach(collectNames)

    keep.foreach { ks =>
      val unknown = ks.toSet -- outOrder
      require(unknown.isEmpty,
        s"Motif: keep names not in the pattern: ${unknown.mkString(", ")} " +
          s"(pattern binds: ${outOrder.mkString(", ")})")
    }
    // vertex names whose struct column need not be materialized at all;
    // join elimination for them additionally requires the graph's
    // referential-integrity contract (checked at the join site)
    val dropV: Set[String] =
      keep.map(ks => vertexNames.toSet -- ks).getOrElse(Set.empty)

    // expand undirected terms into every orientation combination
    val undirectedCount = augmented.count(_.isInstanceOf[UndirectedEdgePattern])
    require(undirectedCount <= 4,
      s"Motif: at most 4 undirected edges per pattern (got $undirectedCount)")
    val variants: Seq[(Seq[Pattern], Seq[String])] =
      augmented.foldLeft(Seq((Seq.empty[Pattern], Seq.empty[String]))) {
        case (acc, UndirectedEdgePattern(a, e, b)) =>
          acc.flatMap { case (ps, dirs) =>
            Seq((ps :+ EdgePattern(a, e, b), dirs :+ "fwd"),
              (ps :+ EdgePattern(b, e, a), dirs :+ "rev"))
          }
        case (acc, p) => acc.map { case (ps, dirs) => (ps :+ p, dirs) }
      }

    val frames = variants.map { case (ps, dirs) =>
      val df = compileOriented(g, ps, dropV)
      if (undirectedCount > 0) df.withColumn("_direction", lit(dirs.mkString(";")))
      else df
    }
    val out = frames.reduce(_ unionByName _)
    val visible = outOrder.toSeq.filterNot(_.startsWith("__tmp"))
      .filter(n => keep.forall(_.contains(n))) ++
      (if (undirectedCount > 0) Seq("_direction") else Nil)
    if (visible.isEmpty) out
    else out.select(visible.map(col).toIndexedSeq: _*)
  }

  /** `bound` maps each bound vertex name to the column holding its id:
   * `col("name.id")` for materialized vertices, the binding edge's
   * endpoint column for elided ones. */
  private case class State(df: Option[DataFrame], bound: Map[String, Column])

  private def vertsOf(p: Pattern): Set[String] = p match {
    case VertexPattern(NamedVertex(n)) => Set(n)
    case EdgePattern(a, _, b) => Set(a, b).collect { case NamedVertex(n) => n }.toSet
    case UndirectedEdgePattern(a, _, b) =>
      Set(a, b).collect { case NamedVertex(n) => n }.toSet
    case Negation(e) => vertsOf(e)
    case _ => Set.empty
  }

  /** Connectivity-aware join ordering (the reference leaves this as a
   * TODO and joins in user order): a positive term sharing no vertex with
   * the bound set is deferred while any later term connects, so
   * `(a)-[]->(b); (c)-[]->(d); (b)-[]->(c)` plans as three equi-joins
   * instead of manifesting an (edges × edges) cartesian at term two.
   * Safe because positive inner equi-joins commute under bag semantics;
   * negations are barriers (pending terms flush before them, preserving
   * the user-ordered `except` scope), and genuinely disconnected patterns
   * still cross-join exactly as written. */
  private def reorderForConnectivity(ps: Seq[Pattern]): Seq[Pattern] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Pattern]
    val pending = scala.collection.mutable.ArrayBuffer.empty[Pattern]
    var bound = Set.empty[String]
    def applyP(p: Pattern): Unit = { out += p; bound ++= vertsOf(p) }
    def flushConnected(): Unit = {
      var progress = true
      while (progress) {
        val i = pending.indexWhere(p => vertsOf(p).exists(bound.contains))
        progress = i >= 0
        if (progress) applyP(pending.remove(i))
      }
    }
    ps.foreach {
      case n @ Negation(_) =>
        pending.foreach(applyP); pending.clear()
        applyP(n)
        flushConnected()
      case p =>
        val vs = vertsOf(p)
        if (out.isEmpty || vs.isEmpty || vs.exists(bound.contains)) {
          applyP(p); flushConnected()
        } else pending += p
    }
    pending.foreach(applyP)
    out.toSeq
  }

  private def compileOriented(g: GraphFrame, patternsSeq0: Seq[Pattern],
      dropV: Set[String]): DataFrame = {
    val patternsSeq = reorderForConnectivity(patternsSeq0)
    var tmpCounter = 0
    def freshName(): String = { tmpCounter += 1; s"__tmp$tmpCounter" }

    val idType = g.vertices.schema(ID).dataType
    val srcNullable = g.edges.schema(SRC).nullable
    val dstNullable = g.edges.schema(DST).nullable

    def nestV(name: String): DataFrame =
      g.vertices.select(GraphFrame.nestAsCol(g.vertices, name))
    def nestE(name: String): DataFrame =
      g.edges.select(GraphFrame.nestAsCol(g.edges, name))

    def applyEdge(st: State, a0: VertexTerm, e0: EdgeTerm, b0: VertexTerm): State = {
      val eName = e0 match { case NamedEdge(n) => n; case AnonymousEdge => freshName() }
      val aName = a0 match { case NamedVertex(n) => Some(n); case _ => None }
      val bName = b0 match { case NamedVertex(n) => Some(n); case _ => None }
      val eSrc = col(s"$eName.$SRC")
      val eDst = col(s"$eName.$DST")

      val aSeen = aName.exists(st.bound.contains)
      val bSeen = bName.exists(st.bound.contains)

      val withEdge: DataFrame = st.df match {
        case None =>
          nestE(eName)
        case Some(prev) =>
          if (aSeen && bSeen)
            prev.join(nestE(eName),
              eSrc === st.bound(aName.get) && eDst === st.bound(bName.get))
          else if (aSeen)
            prev.join(nestE(eName), eSrc === st.bound(aName.get))
          else if (bSeen)
            prev.join(nestE(eName), eDst === st.bound(bName.get))
          else
            prev.crossJoin(nestE(eName))
      }

      // Bind an unseen named endpoint. With the graph's referential-
      // integrity contract, a vertex whose attributes are not needed
      // (id-only vertex table, or name dropped by the caller's keep
      // projection) binds to the edge endpoint column directly — no
      // vertex join. The old join also silently dropped null-endpoint
      // edges (null never equi-matches), so elision adds an explicit
      // not-null filter when the edge schema admits nulls.
      def bind(df0: DataFrame, n: String, endpoint: Column,
          endpointNullable: Boolean): (DataFrame, Column) = {
        if (g.edgeEndpointsComplete && (dropV.contains(n) || g.idOnlyVertices)) {
          val df1 = if (endpointNullable) df0.filter(endpoint.isNotNull) else df0
          if (dropV.contains(n)) (df1, endpoint)
          else (df1.withColumn(n, struct(endpoint.cast(idType).as(ID))),
            col(s"$n.$ID"))
        } else {
          (df0.join(nestV(n), endpoint === col(s"$n.$ID")), col(s"$n.$ID"))
        }
      }

      var df = withEdge
      var bound = st.bound
      (aName, bName) match {
        case (Some(a), Some(b)) if a == b && !aSeen =>
          // self-loop on a new name: one binding constrained both ways
          if (g.edgeEndpointsComplete && (dropV.contains(a) || g.idOnlyVertices)) {
            val (df1, c) = bind(df.filter(eSrc === eDst), a, eSrc, srcNullable)
            df = df1; bound += a -> c
          } else {
            df = df.join(nestV(a), eSrc === col(s"$a.$ID") && eDst === col(s"$a.$ID"))
            bound += a -> col(s"$a.$ID")
          }
        case _ =>
          aName.filterNot(bound.contains).foreach { a =>
            val (df1, c) = bind(df, a, eSrc, srcNullable)
            df = df1; bound += a -> c
          }
          bName.filterNot(bound.contains).foreach { b =>
            val (df1, c) = bind(df, b, eDst, dstNullable)
            df = df1; bound += b -> c
          }
      }
      State(Some(df), bound)
    }

    def applyTerm(st: State, p: Pattern): State = p match {
      case VertexPattern(NamedVertex(n)) =>
        // a standalone vertex term ENUMERATES the vertex table (one result
        // row per vertex) — the join is the semantics, never elided
        if (st.bound.contains(n)) st
        else st.df match {
          case None => State(Some(nestV(n)), st.bound + (n -> col(s"$n.$ID")))
          case Some(prev) =>
            State(Some(prev.crossJoin(nestV(n))), st.bound + (n -> col(s"$n.$ID")))
        }
      case VertexPattern(AnonymousVertex) => st
      case EdgePattern(a, e, b) => applyEdge(st, a, e, b)
      case UndirectedEdgePattern(_, _, _) =>
        throw new IllegalStateException("undirected terms are expanded before compilation")
      case Negation(EdgePattern(a, _, b)) =>
        val prev = st.df.getOrElse(throw new IllegalArgumentException(
          "Motif: negated term cannot be the only term"))
        val prevCols = prev.columns.toIndexedSeq
        val positive = applyEdge(st, a, AnonymousEdge, b).df.get
          .select(prevCols.map(col): _*)
        State(Some(prev.except(positive)), st.bound)
    }

    patternsSeq.foldLeft(State(None, Map.empty[String, Column]))(applyTerm).df
      .getOrElse(throw new IllegalArgumentException("Motif: empty pattern"))
  }

  /** Vertices appearing only inside negated terms must still be bound:
   * prepend them as positive standalone terms (reference
   * GraphFrame.scala:659-674). */
  private def augmentNegationOnlyVertices(ps: Seq[Pattern]): Seq[Pattern] = {
    val positive = ps.flatMap {
      case VertexPattern(NamedVertex(n)) => Seq(n)
      case EdgePattern(a, _, b) => Seq(a, b).collect { case NamedVertex(n) => n }
      case UndirectedEdgePattern(a, _, b) => Seq(a, b).collect { case NamedVertex(n) => n }
      case _ => Nil
    }.toSet
    val negOnly = ps.flatMap {
      case Negation(EdgePattern(a, _, b)) =>
        Seq(a, b).collect { case NamedVertex(n) if !positive.contains(n) => n }
      case _ => Nil
    }.distinct
    negOnly.map(n => VertexPattern(NamedVertex(n))) ++ ps
  }
}
