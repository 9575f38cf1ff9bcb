package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * tokenization, language id, quality scoring, fingerprinting.
 *
 * All operators are pure narrow projections (per-row expressions, no
 * shuffle, full whole-stage codegen) — at 100 TB they run at scan speed
 * and columns not referenced are pruned at the parquet reader.
 */
object Text {

  /** Whitespace tokens with empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => length(t) > 0)

  /** n-word shingles of the token array (empty array when too short). */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(filter(array(lit("")), _ => lit(false)))
  }

  /** (id, n_tokens). */
  def tokenCount(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), size(tokens(col(textCol))).cast("long").as("n_tokens"))

  /** BPE-ish subword token count: runs of letters, runs of digits, and
   * individual other non-space characters each count as one token (the
   * class-based approximation of byte-pair pretokenization; regex is
   * dialect-neutral so SQL oracles reproduce it). */
  def regexTokenCount(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      size(regexp_extract_all(col(textCol), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0)))
        .cast("long").as("n_bpe_tokens"))

  /** Occurrences of `kw` in `text` by length arithmetic (exactly
   * reproducible in any SQL engine: (len(t)-len(replace(t,kw)))/len(kw)). */
  def countOccurrences(text: Column, kw: String): Column =
    ((length(text) - length(replace(text, lit(kw), lit("")))) / kw.length).cast("int")

  /** Stopword-marker language id: per language, score = total occurrences
   * of its marker words; predict the max-scoring language, ties to the
   * lexicographically smallest. Returns (id, pred_lang). */
  def languageId(df: DataFrame, idCol: String, textCol: String,
      markers: Map[String, Seq[String]] = defaultMarkers): DataFrame = {
    val t = concat(lit(" "), col(textCol), lit(" "))
    val scoreCols = markers.toSeq.sortBy(_._1).map { case (lang, kws) =>
      struct(
        (-kws.map(k => countOccurrences(t, s" $k ")).reduce(_ + _)).as("negScore"),
        lit(lang).as("lang"))
    }
    df.select(col(idCol),
      array_min(array(scoreCols: _*)).getField("lang").as("pred_lang"))
  }

  val defaultMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "und", "die"),
    "fr" -> Seq("le", "et", "les"),
    "es" -> Seq("el", "y", "los"),
    "zh" -> Seq("de", "shi", "le"))

  /** Quality metrics: (id, n_tokens, n_chars, avg_token_len, stop_ratio). */
  def quality(df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String] = Seq("the", "a", "of", "and", "is")): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    val nStop = stopwords.map(w =>
      size(filter(toks, t => t === w))).reduce(_ + _)
    df.select(
      col(idCol),
      nTok.cast("long").as("n_tokens"),
      length(col(textCol)).cast("long").as("n_chars"),
      round(aggregate(toks, lit(0L), (acc, t) => acc + length(t)) /
        greatest(nTok, lit(1)).cast("double"), 4).as("avg_token_len"),
      round(nStop / greatest(nTok, lit(1)).cast("double"), 4).as("stop_ratio"))
  }

  /** Within-document repetition: the fraction of duplicate `n`-word
   * shingles (the Gopher-style repetition quality rule — high values mean
   * boilerplate or degenerate generation loops). (id, rep_ratio 4dp);
   * 0.0 for documents too short to shingle. Pure narrow projection. */
  def repetitionRatio(df: DataFrame, idCol: String, textCol: String,
      n: Int = 2): DataFrame = {
    val sh = wordShingles(col(textCol), n)
    df.select(col(idCol),
      round(when(size(sh) > 0,
          lit(1.0) - size(array_distinct(sh)) / size(sh).cast("double"))
        .otherwise(lit(0.0)), 4).as("rep_ratio"))
  }

  /** Winnowing-style document fingerprint: hash all `n`-word shingles,
   * keep the deterministic 1/8 sample (hash suffix in {0,1}), and hash the
   * sorted selection. Near-identical documents collide with high
   * probability; any engine with md5 reproduces it bit-for-bit. */
  def fingerprint(df0: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val df = ensureParallelism(df0)
    val hashes = transform(wordShingles(col(textCol), n), s => md5(s))
    val selected = filter(hashes, h => substring(h, 32, 1).isin("0", "1"))
    df.select(col(idCol),
      md5(concat_ws("", array_sort(selected))).as("fingerprint"))
  }
}
