package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis verbs for training-data pipelines (SURVEY §2.3 T) —
 * the surfaced form of what the reference buries inside
 * `embedder_tfidf` (tokenization, vocabulary statistics,
 * /root/reference/R/embedders.R:341-350) plus the standard corpus-
 * curation metrics (language ID, quality scoring, token counting,
 * fingerprinting). Everything here is built from codegen'd built-in
 * functions — no UDFs — so the whole stage fuses into one pass over
 * the corpus.
 *
 * Each verb has a deliberately *engine-portable* definition (same
 * regexes, same set semantics) so the DuckDB oracle can replicate it
 * exactly; the SQL fragments in `TextAnalysisSql` are generated from
 * the same constants.
 */
object TextAnalysis {

  /** Distinct lowercase whitespace tokens (set semantics). */
  def tokenSet(text: Column): Column =
    array_distinct(filter(split(lower(text), "\\s+"), t => length(t) > 0))

  /** Gopher-style repetition counters in one codegen pass — see
    * [[graft.expressions.RepetitionStats]]. */
  def repetitionStats(text: Column, seed: Int = 42): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.RepetitionStats(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), seed))

  /** Whitespace token count (duplicates counted). */
  def tokenCount(text: Column): Column =
    size(filter(split(lower(text), "\\s+"), t => length(t) > 0)).cast("long")

  /** Winnowing fingerprint set over a Rabin–Karp ROLLING character
    * k-gram hash (the MOSS algorithm) — substring-level document
    * fingerprints with the guarantee that any shared run of
    * w + k − 1 characters yields a shared fingerprint. See
    * [[graft.expressions.WinnowFingerprint]]. */
  def winnowFingerprint(text: Column, k: Int = 5, w: Int = 4): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.WinnowFingerprint(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), k, w))

  /** BPE-ish subword proxy: runs of letters, runs of digits, or single
    * non-alnum-non-space chars — the standard pre-tokenizer shape. */
  val WordRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit(WordRegex)).cast("long")

  /** Non-alphanumeric, non-space character count (punctuation mass). */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9\\s]", ""))

  /** Tiny per-language stopword profiles for the n-gram/stopword
    * language-ID heuristic. Order = tie precedence. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"),
    "es" -> Seq("el", "los", "las", "y", "es", "no", "por", "que", "una", "como"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "dans", "une", "vous"))
  /** CJK detection: count of Han characters. */
  val CjkClass = "[\\u4e00-\\u9fff]"

  /** Per-language stopword-set hit count (unique hits, set semantics). */
  def langHits(text: Column, lang: String): Column = {
    val words = LangProfiles.toMap.apply(lang)
    size(array_intersect(tokenSet(text), array(words.map(lit): _*)))
  }

  def cjkCount(text: Column): Column =
    length(regexp_replace(text, CjkClass.replace("[", "[^"), ""))

  /** Language-ID: argmax of profile scores with fixed precedence
    * (en > de > es > fr > zh); all-zero scores default to "en". */
  def langId(text: Column): Column = {
    val scores = LangProfiles.map { case (l, _) => l -> langHits(text, l) } :+
      ("zh" -> cjkCount(text))
    val m = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("en")) { case ((l, s), acc) => when(s === m && m > 0, lit(l)).otherwise(acc) }
  }

  /** Composite quality score in [0,1]: length saturation + English
    * stopword density + punctuation cleanliness. The weights are a
    * fixed contract (mirrored in the oracle SQL), not a tuned model. */
  def qualityScore(text: Column): Column = {
    val nToks = tokenCount(text)
    val lenScore = least(lit(1.0), nToks.cast("double") / lit(20.0))
    val stopScore = langHits(text, "en").cast("double") / lit(10.0)
    val punctRatio = when(length(text) > 0,
      punctCount(text).cast("double") / length(text).cast("double")).otherwise(lit(0.0))
    round(lit(0.4) * lenScore + lit(0.4) * stopScore + lit(0.2) * (lit(1.0) - punctRatio), 6)
  }

  /** Canonical content fingerprint: md5 of whitespace-normalized
    * lowercase text — the exact-dedup key that survives formatting
    * noise. */
  def contentFingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Redaction patterns shared by the Column API and the oracle SQL —
    * written in the common Java-regex/RE2 subset (no lookaround, no
    * dialect-specific escapes). */
  val RedactionPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}" -> "<PHONE>",
    "[0-9]+" -> "<NUM>")

  /** Curation-grade redaction: mask emails, phone-shaped numbers, then
    * bare digit runs. Order matters (specific → general) and is fixed. */
  def redact(text: Column): Column =
    RedactionPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /**
   * Deterministic train/val/test assignment from a stable id — the
   * reproducible-split primitive every training pipeline needs. Buckets
   * by the first two hex chars of md5(id) (256 buckets), so the split
   * is stable across engines, runs, partitionings, and row order, and
   * any engine with md5 can reproduce it (the DuckDB oracle does).
   * Fractions are rounded to 1/256ths.
   */
  def splitAssign(id: Column, trainFrac: Double = 0.9, valFrac: Double = 0.05): Column = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac <= 1.0)
    val trainEnd = math.round(trainFrac * 256).toInt
    val valEnd = math.min(256, trainEnd + math.round(valFrac * 256).toInt)
    // compare the 2-char lowercase hex prefix LEXICOGRAPHICALLY against
    // the boundary spelled in hex — equivalent to numeric comparison for
    // fixed-width lowercase hex, and portable to any engine with md5 +
    // string compare (no hex-parse builtin needed)
    val bucket = substring(md5(id.cast("string")), 1, 2)
    def hex2(i: Int) = f"$i%02x"
    if (trainEnd >= 256) lit("train")
    else {
      val afterTrain =
        if (valEnd >= 256) lit("val")
        else when(bucket < lit(hex2(valEnd)), "val").otherwise("test")
      when(bucket < lit(hex2(trainEnd)), "train").otherwise(afterTrain)
    }
  }

  /**
   * Deterministic hash-based sampling: keep a row iff its md5 bucket
   * (256ths, same scheme as [[splitAssign]]) falls under the stratum's
   * fraction. Unlike `rand()`-based sampling this is stable across
   * runs, partitionings, and engines — the property a reproducible
   * training-data pipeline needs — and the DuckDB oracle replays it.
   * `fractions` maps stratum value → keep fraction; absent strata use
   * `default`.
   */
  def hashSampleBy(id: Column, stratum: Column, fractions: Map[String, Double],
      default: Double = 1.0): Column = {
    val bucket = substring(md5(id.cast("string")), 1, 2)
    def keep(frac: Double): Column = {
      // fractions rounding up to bucket 256 keep everything — the 2-char
      // hex compare can't express ">= '100'" (a naive takeRight(2) would
      // wrap to "00" and silently keep NOTHING for fractions near 1.0)
      val end = math.min(256, math.round(frac * 256)).toInt
      if (end >= 256) lit(true)
      else if (end <= 0) lit(false)
      else bucket < lit(f"$end%02x")
    }
    fractions.foldLeft(keep(default)) { case (acc, (value, frac)) =>
      when(stratum === value, keep(frac)).otherwise(acc)
    }
  }

  /**
   * Token-window chunking with overlap — the RAG/pretraining splitter
   * (the reference's vignette demonstrates exactly this document-chunks
   * shape, /root/reference/vignettes/getting-started.Rmd:245-263, built
   * by hand). Emits one row per chunk: windows of `chunkSize` original
   * (case-preserved) whitespace tokens, starting every
   * `chunkSize - overlap` tokens; the final partial window is kept. A
   * pure explode over codegen'd array ops — no UDF, no shuffle.
   */
  def chunk(df: org.apache.spark.sql.DataFrame, textCol: String,
      chunkSize: Int, overlap: Int = 0,
      chunkIdxCol: String = "chunk_idx", chunkCol: String = "chunk"): org.apache.spark.sql.DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val step = chunkSize - overlap
    val toks = filter(split(col(textCol), "\\s+"), t => length(t) > 0)
    // chunk start indices: 0, step, 2·step, … while start < nTokens
    val starts = when(size(toks) > 0,
      sequence(lit(0), size(toks) - 1, lit(step))).otherwise(array().cast("array<int>"))
    df.withColumn("__toks", toks)
      .withColumn(chunkIdxCol, explode(starts))
      .withColumn(chunkCol,
        concat_ws(" ", slice(col("__toks"), col(chunkIdxCol) + 1, lit(chunkSize))))
      .withColumn(chunkIdxCol, (col(chunkIdxCol) / step).cast("long"))
      .drop("__toks")
  }
}

/** DuckDB fragments generated from the same constants — the oracle side
  * of each verb above. */
object TextAnalysisSql {
  import TextAnalysis._

  val tokenSetSql: String => String = t =>
    s"list_distinct(list_filter(string_split_regex(lower($t), '\\s+'), x -> len(x) > 0))"
  val tokenCountSql: String => String = t =>
    s"len(list_filter(string_split_regex(lower($t), '\\s+'), x -> len(x) > 0))"
  val regexTokenCountSql: String => String = t =>
    s"len(regexp_extract_all($t, '$WordRegex'))"
  val punctCountSql: String => String = t =>
    s"length(regexp_replace($t, '[A-Za-z0-9\\s]', '', 'g'))"

  def langHitsSql(t: String, lang: String): String = {
    val words = LangProfiles.toMap.apply(lang).map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_intersect(${tokenSetSql(t)}, $words))"
  }
  // RE2 (DuckDB) spells the codepoint range \x{...}; Java spells it \uXXXX
  def cjkCountSql(t: String): String =
    s"length(regexp_replace($t, '[^\\x{4e00}-\\x{9fff}]', '', 'g'))"

  def langIdSql(t: String): String = {
    val scores = LangProfiles.map { case (l, _) => l -> langHitsSql(t, l) } :+
      ("zh" -> cjkCountSql(t))
    val m = scores.map(_._2).mkString("greatest(", ", ", ")")
    val cases = scores.map { case (l, s) => s"WHEN $s = $m AND $m > 0 THEN '$l'" }
    s"CASE ${cases.mkString(" ")} ELSE 'en' END"
  }

  def qualityScoreSql(t: String): String = {
    val nToks = tokenCountSql(t)
    s"""round(0.4 * least(1.0, $nToks / 20.0)
       | + 0.4 * (${langHitsSql(t, "en")} / 10.0)
       | + 0.2 * (1.0 - CASE WHEN length($t) > 0
       |   THEN ${punctCountSql(t)} * 1.0 / length($t) ELSE 0.0 END), 6)""".stripMargin
  }

  def contentFingerprintSql(t: String): String =
    s"md5(regexp_replace(trim(lower($t)), '\\s+', ' ', 'g'))"
}
