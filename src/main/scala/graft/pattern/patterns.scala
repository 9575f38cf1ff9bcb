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

  private case class Arrow(edge: EdgeTerm, repeat: Int, backward: Boolean,
      undirected: Boolean = false)

  private def fwdArrow: Parser[Arrow] =
    "-[" ~> opt(name) ~ opt("*" ~> "\\d+".r) <~ "]->" ^^ {
      case n ~ rep => Arrow(n.map(NamedEdge).getOrElse(AnonymousEdge),
        rep.map(_.toInt).getOrElse(1), backward = false)
    }
  private def bwdArrow: Parser[Arrow] =
    "<-[" ~> opt(name) ~ opt("*" ~> "\\d+".r) <~ "]-" ^^ {
      case n ~ rep => Arrow(n.map(NamedEdge).getOrElse(AnonymousEdge),
        rep.map(_.toInt).getOrElse(1), backward = true)
    }
  // undirected `-[e]-`: must not consume the `->` of a forward arrow, so it
  // is tried after fwd/bwd and requires the closing `-` not followed by `>`
  private def undArrow: Parser[Arrow] =
    "-[" ~> opt(name) <~ "]-" <~ not(">") ^^ {
      case n => Arrow(n.map(NamedEdge).getOrElse(AnonymousEdge), 1,
        backward = false, undirected = true)
    }

  // distinguishes the generated chains of MULTIPLE anonymous fixed-length
  // terms in one pattern ("(u)-[*2]->(v); (v)-[*3]->(w)") — a shared
  // "__tmpe" base made their generated edge names collide and fail the
  // uniqueness validation (found porting the reference's fixed-length-5
  // chain-decomposition case). Reset per parse; parse() is synchronized.
  private var anonChainCounter = 0

  private def expandEdge(a: VertexTerm, arrow: Arrow, b: VertexTerm): List[Pattern] = {
    val (s, d) = if (arrow.backward) (b, a) else (a, b)
    if (arrow.undirected) List(UndirectedEdgePattern(s, arrow.edge, d))
    else if (arrow.repeat == 1) List(EdgePattern(s, arrow.edge, d))
    else {
      require(arrow.repeat >= 1, s"edge repetition must be >= 1, got ${arrow.repeat}")
      val base = arrow.edge match {
        case NamedEdge(n) => n
        case AnonymousEdge => anonChainCounter += 1; s"__tmpe${anonChainCounter}x"
      }
      val mids = (1 until arrow.repeat).map(i => NamedVertex(s"__tmp_${base}_$i"))
      val chain = (s +: mids) :+ d
      chain.sliding(2).zipWithIndex.map { case (Seq(x, y), i) =>
        EdgePattern(x, NamedEdge(s"$base${i + 1}"), y)
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
    val bidi = """(!?)\(([a-zA-Z0-9_]*)\)<-\[([a-zA-Z0-9_]*)\]->\(([a-zA-Z0-9_]*)\)""".r
    s.split(";").map(_.trim).map {
      case bidi(neg, a, e, b) =>
        if (neg.nonEmpty) throw new IllegalArgumentException(
          s"Motif: negated bidirectional edge is not supported: '$s'")
        if (e.isEmpty) s"($a)-[]->($b);($b)-[]->($a)"
        else s"($a)-[${e}1]->($b);($b)-[${e}2]->($a)"
      case other => other
    }.mkString(";")
  }

  def parse(s0: String): Seq[Pattern] = synchronized {
    anonChainCounter = 0
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
