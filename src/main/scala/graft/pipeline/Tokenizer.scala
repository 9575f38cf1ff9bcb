package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed BPE-style tokenizer training (word-level merges — "phrase
 * BPE": the symbol alphabet starts as whitespace words and each merge
 * joins the corpus's most frequent adjacent symbol pair, exactly the BPE
 * training loop of Sennrich et al., arXiv:1508.07909, lifted from
 * characters-within-words to words-within-documents).
 *
 * Scale design: each merge round is ONE hash aggregation over adjacent
 * symbol pairs (map-side partials; the heaviest key's combine state is a
 * single count), one driver-side argmax of a k-row-ish frequency table
 * top (via sort-limit 1, not a collect of the table), and one
 * codegen'd literal `replace` over the corpus — the same
 * scan-count-rewrite shape a single-node BPE trainer runs, with the
 * count and rewrite distributed. Corpus state is localCheckpointed per
 * round so the plan does not snowball with `numMerges`.
 *
 * Symbols ride in an unambiguous boundary encoding `⟨sym⟩⟨sym⟩…` so a
 * merge is a plain non-overlapping left-to-right string replace — the
 * exact greedy semantics single-node BPE uses, and replayable verbatim
 * by any SQL engine's `replace()`. Tokens must not contain `⟨` or `⟩`
 * (guarded).
 */
object Tokenizer {

  private val L = "⟨" // ⟨
  private val R = "⟩" // ⟩

  /** `⟨t1⟩⟨t2⟩…` encoding of the whitespace tokens of `text`; null for
   * texts with no tokens. */
  private def encoded(text: Column): Column = {
    val toks = filter(split(text, "\\s+"), t => length(t) > 0)
    when(size(toks) > 0, concat(lit(L), array_join(toks, s"$R$L"), lit(R)))
  }

  /** Adjacent symbol pairs of one encoded doc as (left, right) structs. */
  private def pairsOf(enc: Column): Column = {
    val toks = split(regexp_replace(enc, s"^$L|$R$$", ""), s"$R$L")
    Dedup.bindOnce(toks, ts =>
      when(size(ts) >= 2,
        transform(sequence(lit(0), size(ts) - 2),
          i => struct(element_at(ts, i + 1).as("l"), element_at(ts, i + 2).as("r")))))
  }

  /** Learn `numMerges` merges: returns (rank, left, right, pair_count),
   * rank 1 = first (most frequent) merge. Ties break lexicographically on
   * (left, right) — deterministic under any partitioning. Stops early if
   * no adjacent pair remains. */
  def bpeTrain(df0: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges >= 1, "bpeTrain: numMerges must be >= 1")
    val spark = df0.sparkSession
    import spark.implicits._
    require(df0.filter(col(textCol).contains(L) || col(textCol).contains(R)).isEmpty,
      s"bpeTrain: text must not contain the boundary characters $L $R")

    var corpus = df0.select(encoded(col(textCol)).as("s"))
      .filter(col("s").isNotNull)
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val top = corpus
        .select(explode(pairsOf(col("s"))).as("p"))
        .groupBy(col("p.l"), col("p.r")).agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("l"), asc("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val row = top.head
        val (l, r, n) = (row.getString(0), row.getString(1), row.getLong(2))
        merges += ((rank, l, r, n))
        val next = corpus.select(
          replace(col("s"), lit(s"$L$l$R$L$r$R"), lit(s"$L$l $r$R")).as("s"))
          .localCheckpoint(true)
        graft.lib.IterationManager.release(corpus)
        corpus = next
        rank += 1
      }
    }
    graft.lib.IterationManager.release(corpus)
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** Apply an ordered merge list (as produced by [[bpeTrain]]) to every
   * document: returns (idCol, n_tokens_raw, n_tokens_bpe) — the token
   * counts before and after the merges (each applied merge reduces a
   * doc's count by the number of replacements). */
  def bpeEncode(df0: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val enc0 = encoded(col(textCol))
    val encN = merges.foldLeft(enc0) { case (acc, (l, r)) =>
      replace(acc, lit(s"$L$l$R$L$r$R"), lit(s"$L$l $r$R"))
    }
    def nTokens(enc: Column): Column = coalesce(
      size(split(regexp_replace(enc, s"^$L|$R$$", ""), s"$R$L")), lit(0))
      .cast("long")
    df0.select(col(idCol),
      nTokens(enc0).as("n_tokens_raw"),
      nTokens(encN).as("n_tokens_bpe"))
  }

  /** Train-then-encode convenience used by the driver query: learns
   * `numMerges` merges and reports per-document raw/BPE token counts. */
  def bpeTrainEncode(df0: DataFrame, idCol: String, textCol: String,
      numMerges: Int): (DataFrame, DataFrame) = {
    val m = bpeTrain(df0, textCol, numMerges)
    val list = m.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    (m, bpeEncode(df0, idCol, textCol, list))
  }
}
