package graft.pattern

import scala.util.parsing.combinator.RegexParsers

/**
 * Motif-pattern AST + parser.
 *
 * Grammar (semantics follow reference pattern/patterns.scala:29-134):
 *   pattern  := term (';' term)*
 *   term     := '!' edgeTerm | edgeTerm | vertex
 *   edgeTerm := vertex arrow vertex
 *   arrow    := '-[' name? ('*' int)? ']->'      forward
 *             | '<-[' name? ']-'                 backward (rewritten to forward)
 *             | '-[' name? ('*' int)? ']-'       undirected (both orientations)
 *   vertex   := '(' name? ')'
 *
 * Fixed-length `(a)-[e*3]->(b)` expands to a 3-edge chain through generated
 * vertices `__tmp_e_1`, `__tmp_e_2` with edges `e1..e3`.
 */
sealed trait VertexTerm
case class NamedVertex(name: String) extends VertexTerm
case object AnonymousVertex extends VertexTerm

sealed trait EdgeTerm
case class NamedEdge(name: String) extends EdgeTerm
case object AnonymousEdge extends EdgeTerm

sealed trait Pattern
case class VertexPattern(v: VertexTerm) extends Pattern
case class EdgePattern(src: VertexTerm, edge: EdgeTerm, dst: VertexTerm) extends Pattern
/** `(a)-[e]-(b)`: matches the edge in either orientation; the compiler
 * expands it into both directions tagged by a `_direction` column. */
case class UndirectedEdgePattern(src: VertexTerm, edge: EdgeTerm, dst: VertexTerm) extends Pattern
case class Negation(child: EdgePattern) extends Pattern

object PatternParser extends RegexParsers {
  private def name: Parser[String] = "[a-zA-Z0-9_]+".r

  private def vertex: Parser[VertexTerm] =
    "(" ~> opt(name) <~ ")" ^^ {
      case Some(n) => NamedVertex(n)
      case None => AnonymousVertex
    }

  /** `repeat = None` for a plain arrow, `Some(n)` for an explicit `*n` —
   * the distinction matters because the reference renames even a `*1`
   * chain's edge to `_<name>1` (reference PatternSuite.scala:33-35). */
  private case class Arrow(edge: EdgeTerm, repeat: Option[Int], backward: Boolean,
      undirected: Boolean = false)

  private def fwdArrow: Parser[Arrow] =
    "-[" ~> opt(name) ~ opt("*" ~> "\\d+".r) <~ "]->" ^^ {
      case n ~ rep => Arrow(n.map(NamedEdge).getOrElse(AnonymousEdge),
        rep.map(_.toInt), backward = false)
    }
  private def bwdArrow: Parser[Arrow] =
    "<-[" ~> opt(name) ~ opt("*" ~> "\\d+".r) <~ "]-" ^^ {
      case n ~ rep => Arrow(n.map(NamedEdge).getOrElse(AnonymousEdge),
        rep.map(_.toInt), backward = true)
    }
  // undirected `-[e]-` (optionally starred `-[e*3]-`): must not consume the
  // `->` of a forward arrow, so it is tried after fwd/bwd and requires the
  // closing `-` not followed by `>`
  private def undArrow: Parser[Arrow] =
    "-[" ~> opt(name) ~ opt("*" ~> "\\d+".r) <~ "]-" <~ not(">") ^^ {
      case n ~ rep => Arrow(n.map(NamedEdge).getOrElse(AnonymousEdge),
        rep.map(_.toInt), backward = false, undirected = true)
    }

  /** Fixed-length chain expansion with the REFERENCE's user-visible naming
   * contract (reference pattern/patterns.scala:102-134, PatternSuite:25-100):
   * `(u)-[e*3]->(v)` becomes edges `_e1 _e2 _e3` through mid vertices
   * `_uv1 _uv2` — all of them ordinary named elements a user can select
   * (`find(...).select("_uv1.id")` must work after switching engines).
   * Only when BOTH endpoints are anonymous do the mids fall into the
   * compiler-internal `__tmpv<i>` namespace (hidden from output here;
   * divergence note: the reference exposes even those). Chain edges of an
   * ANONYMOUS `[*n]` stay anonymous, exactly like the reference. */
  private def expandEdge(a: VertexTerm, arrow: Arrow, b: VertexTerm): List[Pattern] = {
    val (s, d) = if (arrow.backward) (b, a) else (a, b)
    // an undirected starred arrow `(a)-[e*3]-(b)` expands to the SAME
    // named chain as the directed form, with each hop undirected — the
    // compiler then unions every per-hop orientation, tagged in
    // `_direction` (reference semantics: union of per-orientation chains;
    // its GraphFrame.scala:625-657 handles the starred undirected case
    // inside find)
    val mk: (VertexTerm, EdgeTerm, VertexTerm) => Pattern =
      if (arrow.undirected) UndirectedEdgePattern.apply else EdgePattern.apply
    if (arrow.undirected && arrow.repeat.isEmpty) List(mk(s, arrow.edge, d))
    else if (arrow.repeat.isEmpty) List(EdgePattern(s, arrow.edge, d))
    else {
      val hop = arrow.repeat.get
      require(hop >= 1, s"Hop must be greater than 0, got *$hop")
      val mids = (s, d) match {
        case (AnonymousVertex, AnonymousVertex) =>
          (1 until hop).map(i => NamedVertex(s"__tmpv$i"))
        case _ =>
          val sn = s match { case NamedVertex(n) => n; case _ => "" }
          val dn = d match { case NamedVertex(n) => n; case _ => "" }
          (1 until hop).map(i => NamedVertex(s"_$sn$dn$i"))
      }
      val chain = (s +: mids) :+ d
      chain.sliding(2).zipWithIndex.map { case (Seq(x, y), i) =>
        arrow.edge match {
          case NamedEdge(n) => mk(x, NamedEdge(s"_$n${i + 1}"), y)
          case AnonymousEdge => mk(x, AnonymousEdge, y)
        }
      }.toList
    }
  }

  private def edgeTerm: Parser[List[Pattern]] =
    vertex ~ (fwdArrow | bwdArrow | undArrow) ~ vertex ^^ {
      case a ~ arrow ~ b => expandEdge(a, arrow, b)
    }

  private def term: Parser[List[Pattern]] =
    ("!" ~> edgeTerm ^^ {
      case List(e: EdgePattern) => List(Negation(e))
      case _ => throw new IllegalArgumentException(
        "Motif: only a plain directed edge can be negated")
    }) |
    (edgeTerm ^^ { es => es: List[Pattern] }) |
    (vertex ^^ { v => List(VertexPattern(v)) })

  private def patterns: Parser[List[Pattern]] =
    repsep(term, ";") ^^ (_.flatten)

  /** `(a)<-[e]->(b)` means both directed edges exist: rewritten to
   * `(a)-[e1]->(b); (b)-[e2]->(a)` (anonymous stays anonymous). Negated
   * bidirectional terms are rejected (reference
   * pattern/patterns.scala:72-97). */
  private def rewriteBidirectional(s: String): String = {
    val bidi = """(!?)\(([a-zA-Z0-9_]*)\)<-\[([a-zA-Z0-9_]*(?:\*[0-9.]+)?)\]->\(([a-zA-Z0-9_]*)\)""".r
    s.split(";").map(_.trim).map {
      case bidi(neg, a, e, b) =>
        if (neg.nonEmpty) throw new IllegalArgumentException(
          s"Motif: negated bidirectional edge is not supported: '$s'")
        if (e.isEmpty) s"($a)-[]->($b);($b)-[]->($a)"
        // starred bidirectional keeps the bracket content verbatim on both
        // directions (reference rewriteIncomingEdges: "(u)<-[*5]->(v)" ->
        // "(u)-[*5]->(v);(v)-[*5]->(u)"); a NAME with a star duplicates the
        // name and fails edge-uniqueness downstream, same as the reference
        else if (e.contains('*')) s"($a)-[$e]->($b);($b)-[$e]->($a)"
        else s"($a)-[${e}1]->($b);($b)-[${e}2]->($a)"
      case other => other
    }.mkString(";")
  }

  def parse(s0: String): Seq[Pattern] = synchronized {
    val s = rewriteBidirectional(s0)
    parseAll(patterns, s) match {
      case Success(result, _) => validate(result); result
      case failure: NoSuccess =>
        throw new IllegalArgumentException(s"Invalid motif pattern '$s': ${failure.msg}")
    }
  }

  /** Structural validation (reference pattern/patterns.scala:144-231). */
  private def validate(ps: Seq[Pattern]): Unit = {
    def vNames(p: Pattern): Seq[String] = p match {
      case VertexPattern(NamedVertex(n)) => Seq(n)
      case EdgePattern(a, _, b) =>
        Seq(a, b).collect { case NamedVertex(n) => n }
      case UndirectedEdgePattern(a, _, b) =>
        Seq(a, b).collect { case NamedVertex(n) => n }
      case Negation(e) => vNames(e)
      case _ => Nil
    }
    def eNames(p: Pattern): Seq[String] = p match {
      case EdgePattern(_, NamedEdge(n), _) => Seq(n)
      case UndirectedEdgePattern(_, NamedEdge(n), _) => Seq(n)
      case _ => Nil
    }
    ps.foreach {
      case Negation(EdgePattern(_, NamedEdge(n), _)) =>
        throw new IllegalArgumentException(
          s"Motif: a negated edge cannot be named (edge '$n')")
      case Negation(EdgePattern(AnonymousVertex, _, AnonymousVertex)) =>
        throw new IllegalArgumentException(
          "Motif: negated term must reference at least one named vertex")
      case VertexPattern(AnonymousVertex) =>
        throw new IllegalArgumentException("Motif: lone anonymous vertex () is not allowed")
      case EdgePattern(AnonymousVertex, AnonymousEdge, AnonymousVertex) =>
        throw new IllegalArgumentException("Motif: fully anonymous term ()-[]->() is not allowed")
      case UndirectedEdgePattern(AnonymousVertex, AnonymousEdge, AnonymousVertex) =>
        throw new IllegalArgumentException("Motif: fully anonymous term ()-[]-() is not allowed")
      case _ =>
    }
    val allV = ps.flatMap(vNames).toSet
    val allE = ps.flatMap(eNames)
    allE.groupBy(identity).foreach { case (n, occ) =>
      if (occ.size > 1) throw new IllegalArgumentException(
        s"Motif: edge name '$n' used ${occ.size} times; edge names must be unique")
    }
    allE.toSet.intersect(allV).foreach { n =>
      throw new IllegalArgumentException(
        s"Motif: name '$n' used for both a vertex and an edge")
    }
  }
}
