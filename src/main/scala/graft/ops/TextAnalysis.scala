package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * All pure `Column` expressions (whole-stage codegen, no UDFs): at 100 TB
  * these run inside the scan stage with zero shuffle; every function is
  * deterministic so results are reproducible across retries/speculative
  * tasks.
  */
object TextAnalysis {

  /** Whitespace tokens, lowercased, empties dropped. Semantics are
    * exactly `filter(split(lower(trim(text)), "\\s+"), t => t <> '')`;
    * since round 20 the composed form is replaced by the single-pass
    * [[graft.functions.WsTokens]] codegen kernel (the regex split plus
    * the INTERPRETED higher-order filter taxed every text operator's
    * scan stage — WsTokensSpec fuzz-pins bit-equivalence). */
  def tokens(text: Column): Column = graft.functions.WsTokens.of(text)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: word pieces split on non-alphanumeric runs (a
    * cheap stand-in for a real tokenizer's token count, good enough for
    * length filtering; RE2-compatible so the DuckDB oracle can mirror it). */
  def subwordCount(text: Column): Column =
    size(filter(split(lower(text), "[^a-z0-9]+"), t => t =!= ""))

  /** Ratio of punctuation chars to total chars (0 for empty). */
  def punctRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[^.,;:!?'\"()-]", "")).cast("double") / n)
  }

  /** Fraction of tokens that are (English) stopwords. */
  val StopwordsEn: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "from", "that", "this", "be")

  /** Stopword fraction over a MATERIALIZED token column (higher-order
    * lambdas re-evaluate captured expressions per element — callers on a
    * hot path hoist `tokens(text)` into its own projection once). */
  def stopwordRatioFromTokens(ts: Column): Column = {
    val n = size(ts)
    when(n === 0, lit(0.0))
      .otherwise(size(filter(ts, t => t.isin(StopwordsEn: _*))).cast("double") / n)
  }

  def stopwordRatio(text: Column): Column = stopwordRatioFromTokens(tokens(text))

  /** Mean token length (chars, whitespace excluded). */
  def meanTokenLenFromTokens(text: Column, ts: Column): Column = {
    val n = size(ts)
    when(n === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "\\s", "")).cast("double") / n)
  }

  def meanTokenLen(text: Column): Column =
    meanTokenLenFromTokens(text, tokens(text))

  /** Composite quality score in [0,1]: favors mid-length docs with some
    * stopwords and low punctuation noise (C4/Gopher-style heuristics). */
  def qualityScoreFromTokens(text: Column, ts: Column): Column = {
    val lenScore = least(size(ts).cast("double") / 100.0, lit(1.0))
    val stopScore = least(stopwordRatioFromTokens(ts) * 4.0, lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5.0)
    round((lenScore * 0.4 + stopScore * 0.4 + punctPenalty * 0.2), 6)
  }

  def qualityScore(text: Column): Column =
    qualityScoreFromTokens(text, tokens(text))

  /** Language-ID by stopword-list hits (n-gram-free heuristic; determinstic
    * tie-break by language code). */
  val LangStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "para"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "dans", "que", "pour", "une"))

  /** Unicode-SCRIPT profile — the multilingual curation signal langid's
    * stopword heuristic can't give (it only knows Latin-script
    * languages): per-script character counts over EXPLICIT codepoint
    * ranges (Unicode-version-independent, so both engines count
    * identically — \p{Han}-style classes drift across regex engines).
    * Scan-stage regexp_count; zero shuffle. */
  val ScriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "A-Za-z\\u00C0-\\u024F",
    "han" -> "\\u4E00-\\u9FFF",
    "cyrillic" -> "\\u0400-\\u04FF",
    "arabic" -> "\\u0600-\\u06FF",
    "devanagari" -> "\\u0900-\\u097F",
    "hangul" -> "\\uAC00-\\uD7AF",
    "kana" -> "\\u3040-\\u30FF",
    "greek" -> "\\u0370-\\u03FF")

  def scriptCount(text: Column, script: String): Column = {
    val range = ScriptRanges.toMap.getOrElse(script,
      throw new IllegalArgumentException(
        s"unknown script '$script' — one of ${ScriptRanges.map(_._1).mkString(", ")}"))
    regexp_count(text, lit(s"[$range]"))
  }

  /** The dominant script name: argmax of the per-script counts, ties to
    * the ALPHABETICALLY-FIRST script name, 'und' when no script char
    * occurs. One integer key per script — `count·16 + tiebreak` with
    * tiebreak DESCENDING in name order — so argmax is a plain
    * greatest() both engines share (DuckDB's greatest takes no structs). */
  private def scriptTiebreak(name: String): Long =
    ScriptRanges.map(_._1).sorted.reverse.indexOf(name).toLong

  def dominantScript(text: Column): Column = {
    val keys = ScriptRanges.map { case (name, _) =>
      scriptCount(text, name).cast("long") * 16L + lit(scriptTiebreak(name))
    }
    val best = greatest(keys: _*)
    val name = ScriptRanges.map(_._1).foldLeft(lit("und")) { case (acc, n) =>
      when(best % 16L === scriptTiebreak(n), lit(n)).otherwise(acc)
    }
    when(best < 16L, lit("und")).otherwise(name)
  }

  /** DuckDB twins ([[scriptCount]] / [[dominantScript]]) over expression `e`. */
  def scriptCountSql(e: String, script: String): String = {
    // translate Java \uXXXX escapes to RE2's \x{XXXX} generically — a
    // hand-kept replace chain silently ships untranslated escapes for
    // any range added later
    val range = """\\u([0-9A-Fa-f]{4})""".r
      .replaceAllIn(ScriptRanges.toMap.getOrElse(script,
        throw new IllegalArgumentException(
          s"unknown script '$script' — one of ${ScriptRanges.map(_._1).mkString(", ")}")),
        m => java.util.regex.Matcher.quoteReplacement("\\x{" + m.group(1) + "}"))
    s"CAST(len(regexp_extract_all($e, '[$range]')) AS BIGINT)"
  }

  def dominantScriptSql(e: String): String = {
    val keys = ScriptRanges.map { case (name, _) =>
      s"${scriptCountSql(e, name)} * 16 + ${scriptTiebreak(name)}"
    }.mkString(", ")
    val best = s"greatest($keys)"
    val arms = ScriptRanges.map { case (name, _) =>
      s"WHEN ($best) % 16 = ${scriptTiebreak(name)} THEN '$name'"
    }.mkString(" ")
    s"(CASE WHEN ($best) < 16 THEN 'und' $arms ELSE 'und' END)"
  }

  def langHits(text: Column, lang: String): Column =
    size(filter(tokens(text), t => t.isin(LangStopwords(lang): _*)))

  /** Best language by hit count; "und" (undetermined) when no hits. */
  def langId(text: Column): Column = {
    val langs = LangStopwords.keys.toSeq.sorted // deterministic priority
    val scored = langs.map(l => struct(langHits(text, l).as("hits"), lit(l).as("lang")))
    // array_max on struct orders by (hits, lang); lang desc would be nicer
    // but ties on distinct langs with equal hits resolve to the *last* lang
    // lexicographically — make priority explicit instead:
    val best = langs.foldLeft((lit(0).as("h"), lit("und"))) { case ((bh, bl), l) =>
      val h = langHits(text, l)
      (when(h > bh, h).otherwise(bh), when(h > bh, lit(l)).otherwise(bl))
    }
    best._2
  }

  /** Document fingerprint: md5 of the sorted distinct token set (exact
    * bag-of-words identity; resilient to word order / duplication). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Rolling polynomial hash over a PRE-HASHED token column (array<long>
    * of md5-derived values): acc' = (acc·B + (h mod M)) mod M with
    * M = 2^31, B = 1000003 — products stay under 2^62, so the arithmetic
    * is exact in BOTH engines (Java wraparound vs DuckDB overflow-error
    * made the previous xxhash64 form un-oracle-able). Order-sensitive,
    * unlike [[fingerprint]]'s sorted-set digest. */
  val RollingMod: Long = 1L << 31
  val RollingBase: Long = 1000003L

  def rollingHashFromHashes(hashed: Column): Column =
    aggregate(hashed, lit(0L), (acc, h) =>
      pmod(acc * lit(RollingBase) + h.bitwiseAND(lit(RollingMod - 1)), lit(RollingMod)))

  /** WINNOWING document fingerprints (Schleimer, Wilkerson, Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD 2003 — the MOSS algorithm): hash every k-gram, slide a
    * w-hash window, select each window's MINIMUM hash (ties → rightmost
    * position), keep the distinct (position, hash) selections. The
    * paper's guarantee: any match of length ≥ w + k − 1 tokens between
    * two documents shares at least one fingerprint, while the stored set
    * shrinks to ~2/(w+1) of all k-grams — the principled density/recall
    * dial that ad-hoc "every n-th hash" sampling lacks.
    *
    * Docs with fewer than w k-grams winnow their single short window
    * (one fingerprint — the doc's min); k-gram-less docs emit nothing.
    *
    * Plan shape: selection is index-lambda arithmetic in the scan stage
    * (O(n·w) per doc, doc-local); the only shuffle is the final DISTINCT
    * on (id, pos, hash) — 20-byte rows. Overlap detection downstream is
    * an equi-join on the hash, bucketed by construction.
    *
    * @return (id, pos, fp) — one row per selected fingerprint */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(w >= 1, s"w must be >= 1, got $w")
    val seed = s"winnow$k"
    val toks = df.select(col(idCol).as("id"), tokens(col(textCol)).as("ts"))
    val hsExpr = when(size(col("ts")) < k, array().cast("array<long>"))
      .otherwise(transform(sequence(lit(0), size(col("ts")) - k),
        i => graft.functions.Hashing.h64(
          concat_ws(" ", slice(col("ts"), i + 1, lit(k))), seed)))
    val withHs = toks.select(col("id"), hsExpr.as("hs"))
    def minOver(lo: Column, hi: Column): Column =
      aggregate(sequence(lo, hi),
        struct(lit(-1).cast("int").as("p"), lit(Long.MaxValue).as("h")),
        (acc, j) => {
          val hj = element_at(col("hs"), (j + 1).cast("int"))
          when(hj <= acc("h"),
            struct(j.cast("int").as("p"), hj.as("h"))).otherwise(acc)
        })
    val emptySel = array().cast("array<struct<p:int,h:bigint>>")
    val sel =
      when(size(col("hs")) === 0, emptySel)
        .when(size(col("hs")) < w, array(minOver(lit(0), size(col("hs")) - 1)))
        .otherwise(transform(sequence(lit(0), size(col("hs")) - w),
          i => minOver(i, i + w - 1)))
    withHs.select(col("id"), explode(sel).as("s"))
      .select(col("id"), col("s.p").as("pos"), col("s.h").as("fp"))
      .distinct()
  }

  /** Train a unigram piece-cost model from corpus substring frequencies —
    * SentencePiece's seed-vocabulary construction (Kudo 2018 §3.2 seeds
    * EM with the most frequent substrings; this is that M-step-zero
    * model, used directly): count every ≤`maxPieceLen`-char substring of
    * every word occurrence, keep the `topV` most frequent (count desc,
    * piece asc — deterministic), and cost each piece
    * −ln(count / (total+1)) in integer micro-nats via the wide
    * [[graft.functions.PortableMath]] chain, so the DuckDB oracle
    * re-derives every cost bit-for-bit. Feed the result to
    * [[graft.functions.UnigramEncode]].
    *
    * Plan shape: word counts (one token shuffle), substring explode over
    * the DISTINCT-word frame (vocabulary-sized, tiny vs the corpus), one
    * piece-count aggregate, a bounded `topV`-row collect (the same
    * driver-side codebook contract as trainBpe/trainIvfCentroids). */
  def trainUnigramCosts(df: DataFrame, textCol: String,
                        maxPieceLen: Int = 6, topV: Int = 80): Seq[(String, Long)] = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(topV >= 1, s"topV must be >= 1, got $topV")
    val wc = df.select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val subs = wc.select(col("c"), explode(filter(flatten(
        transform(sequence(lit(1), length(col("w"))), i =>
          transform(sequence(lit(1), lit(maxPieceLen)), l =>
            when(i + l - lit(1) <= length(col("w")), col("w").substr(i, l))))),
        x => x.isNotNull)).as("p"))
    val top = subs.groupBy(col("p")).agg(sum(col("c")).as("cnt"))
      .orderBy(col("cnt").desc, col("p")).limit(topV)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val t1 = top.map(_._2).sum + 1L
    val P = graft.functions.PortableMath
    top.toSeq.map { case (p, cnt) =>
      val cost = math.floor((P.lnWide(t1) - P.lnWide(cnt)) * 1e6 + 0.5).toLong
      p -> math.max(1L, cost)
    }
  }

  /** Pairwise SOURCE-overlap matrix: exact Jaccard between each pair of
    * sources' pooled distinct shingle sets — the corpus-diagnostics view
    * of cross-source contamination/mirroring (two crawls of the same
    * site, a dataset embedded in another) BEFORE committing to pair-level
    * dedup over their union. Complements [[graft.ops.Dedup]]'s
    * doc-granular joins with a |sources|² summary.
    *
    * Plan shape: one (source, shingle-hash) DISTINCT (16-byte rows), a
    * self-join on the hash whose fan-out per hash is bounded by
    * |sources| (not corpus size — the crucial difference from the
    * doc-level Σdf² join), and a |sources|²-row aggregate. Safe at any
    * corpus size for the bounded source cardinality a `source` column
    * implies.
    *
    * @return (src_a, src_b, n_shared, jaccard) for src_a < src_b */
  def sourceOverlap(df: DataFrame, srcCol: String, textCol: String,
                    shingleN: Int = 2): DataFrame = {
    val sh = df.select(col(srcCol).as("src"),
        explode(graft.functions.ShingleHashes.of(
          tokens(col(textCol)), shingleN, "srcov")).as("h"))
      .distinct()
    val sizes = sh.groupBy(col("src")).agg(count(lit(1)).as("sz"))
    sh.alias("a")
      .join(sh.alias("b"), col("a.h") === col("b.h") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(sizes).withColumnRenamed("src", "src_a")
        .withColumnRenamed("sz", "sz_a"), Seq("src_a"))
      .join(broadcast(sizes).withColumnRenamed("src", "src_b")
        .withColumnRenamed("sz", "sz_b"), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_shared"),
        round(col("n_shared").cast("double") /
          (col("sz_a") + col("sz_b") - col("n_shared")).cast("double"), 6).as("jaccard"))
  }

  /** Winnowing-based near-dup candidate pairs — the MOSS pipeline end to
    * end: [[winnowFingerprints]] per doc, an equi-join on the
    * fingerprint HASH (bucketed by construction — a fingerprint's
    * df is the number of docs containing that selected k-gram), and a
    * shared-fingerprint count per pair. By the winnowing guarantee every
    * pair sharing a ≥ w+k−1-token passage shares ≥ 1 fingerprint, at
    * ~2/(w+1) of the index size an all-k-gram inverted index
    * ([[graft.ops.Dedup.dupPassages]]'s) would cost — the classic
    * storage/recall trade, now measurable against the exact operators.
    *
    * `minShared` prunes incidental single-collision pairs. Downstream
    * exact verification (Jaccard/containment on the candidates) is the
    * callers' choice — this is candidate generation, like LSH banding.
    *
    * @return (id_a, id_b, n_shared) with id_a < id_b */
  def winnowPairs(df: DataFrame, idCol: String, textCol: String,
                  k: Int = 3, w: Int = 4, minShared: Int = 2): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val fp = winnowFingerprints(df, idCol, textCol, k, w)
      .select(col("id"), col("fp")).distinct()
    fp.alias("a")
      .join(fp.alias("b"), col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Duplicate n-gram ratio (Gopher-style repetition filter): 1 −
    * distinct/total word n-grams; 0 for docs shorter than n tokens.
    * High values flag boilerplate/looping text that length and
    * punctuation heuristics miss. Expects a MATERIALIZED token column
    * (same hot-path rule as [[graft.ops.Dedup.shinglesFromTokens]]). */
  def repetitionRatio(ts: Column, n: Int): Column = {
    val total = size(ts) - (n - 1)
    val distinctN = size(graft.ops.Dedup.shinglesFromTokens(ts, n))
    when(total <= 1, lit(0.0))
      .otherwise(round(lit(1.0) - distinctN.cast("double") / total.cast("double"), 6))
  }

  // ---- Gopher-completeness filters (Rae et al. 2021 §A1.1) -------------
  // The cheap structural signals the length/punctuation heuristics above
  // miss: symbol spam, bullet-list pages, ellipsis-truncated scrapes,
  // non-alphabetic token floods. All stay scan-stage Column expressions
  // (regex + higher-order list functions, RE2-compatible) with DuckDB
  // twins below, so each is hash-gateable and shuffle-free at 100 TB.

  /** '#' and ellipsis ('...' or '…') occurrences per word (0 when no
    * words). Both engines' replace() is non-overlapping left-to-right, so
    * the occurrence counts agree exactly. */
  def symbolToWordRatio(text: Column, ts: Column): Column = {
    val hashes = length(regexp_replace(text, "[^#]", ""))
    val dots = (length(text) - length(replace(text, lit("..."), lit("")))) / 3
    val uni = length(text) - length(replace(text, lit("…"), lit("")))
    val n = size(ts)
    when(n === 0, lit(0.0)).otherwise((hashes + dots + uni).cast("double") / n)
  }

  private def docLines(text: Column): Column = split(text, "\n")

  /** Fraction of lines starting with a bullet (-, *, •). split() keeps
    * trailing empties in both engines, so denominators agree; it is never
    * 0 (splitting "" yields [""]), so the ratio needs no zero guard. */
  def bulletLineFraction(text: Column): Column = {
    val ls = docLines(text)
    size(filter(ls, l => l.rlike("^\\s*[-*•]"))).cast("double") / size(ls)
  }

  /** Fraction of lines ending with an ellipsis. */
  def ellipsisLineFraction(text: Column): Column = {
    val ls = docLines(text)
    size(filter(ls, l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("double") / size(ls)
  }

  /** Fraction of words containing at least one alphabetic character
    * (tokens are already lowercased; 0 when no words). */
  def alphaWordFraction(ts: Column): Column = {
    val n = size(ts)
    when(n === 0, lit(0.0))
      .otherwise(size(filter(ts, t => t.rlike("[a-z]"))).cast("double") / n)
  }

  /** The composed Gopher gate: word-count bounds, mean-word-length bounds,
    * symbol/bullet/ellipsis caps, alphabetic-word floor. Defaults are the
    * paper's; every threshold is a parameter because corpus-appropriate
    * values vary (the synthetic test corpus needs a lower word floor). */
  def gopherKeep(text: Column, ts: Column,
                 minWords: Int = 50, maxWords: Int = 100000,
                 minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                 maxSymbolRatio: Double = 0.1,
                 maxBulletFrac: Double = 0.9, maxEllipsisFrac: Double = 0.3,
                 minAlphaFrac: Double = 0.8): Column = {
    val n = size(ts)
    n >= minWords && n <= maxWords &&
      meanTokenLenFromTokens(text, ts).between(minMeanLen, maxMeanLen) &&
      symbolToWordRatio(text, ts) <= maxSymbolRatio &&
      bulletLineFraction(text) <= maxBulletFrac &&
      ellipsisLineFraction(text) <= maxEllipsisFrac &&
      alphaWordFraction(ts) >= minAlphaFrac
  }

  /** DuckDB twins of the Gopher expressions, over a text expression `e`
    * and its token-list expression `t`. */
  def symbolToWordRatioSql(e: String, t: String): String =
    s"""(CASE WHEN len($t) = 0 THEN 0.0 ELSE
       |  CAST(length(regexp_replace($e, '[^#]', '', 'g'))
       |    + (length($e) - length(replace($e, '...', ''))) // 3
       |    + (length($e) - length(replace($e, '…', ''))) AS DOUBLE)
       |  / len($t) END)""".stripMargin.replace("\n", " ")

  private def linesSql(e: String): String = s"string_split($e, chr(10))"

  def bulletLineFractionSql(e: String): String = {
    val ls = linesSql(e)
    s"(CAST(len(list_filter($ls, l -> regexp_matches(l, '^\\s*[-*•]'))) AS DOUBLE) / len($ls))"
  }

  def ellipsisLineFractionSql(e: String): String = {
    val ls = linesSql(e)
    s"(CAST(len(list_filter($ls, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$$'))) AS DOUBLE) / len($ls))"
  }

  def alphaWordFractionSql(t: String): String =
    s"""(CASE WHEN len($t) = 0 THEN 0.0 ELSE
       |  CAST(len(list_filter($t, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
       |  / len($t) END)""".stripMargin.replace("\n", " ")

  def meanTokenLenSql(e: String, t: String): String =
    s"""(CASE WHEN len($t) = 0 THEN 0.0 ELSE
       |  CAST(length(regexp_replace($e, '\\s', '', 'g')) AS DOUBLE) / len($t) END)"""
      .stripMargin.replace("\n", " ")

  def gopherKeepSql(e: String, t: String,
                    minWords: Int = 50, maxWords: Int = 100000,
                    minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                    maxSymbolRatio: Double = 0.1,
                    maxBulletFrac: Double = 0.9, maxEllipsisFrac: Double = 0.3,
                    minAlphaFrac: Double = 0.8): String =
    s"""(len($t) >= $minWords AND len($t) <= $maxWords
       | AND ${meanTokenLenSql(e, t)} BETWEEN $minMeanLen AND $maxMeanLen
       | AND ${symbolToWordRatioSql(e, t)} <= $maxSymbolRatio
       | AND ${bulletLineFractionSql(e)} <= $maxBulletFrac
       | AND ${ellipsisLineFractionSql(e)} <= $maxEllipsisFrac
       | AND ${alphaWordFractionSql(t)} >= $minAlphaFrac)""".stripMargin.replace("\n", " ")

  /** PII scrub patterns: every regex is RE2-compatible (no lookaround, no
    * backreferences) AND means the same thing to Java's engine, so the
    * DuckDB oracle reproduces the masking byte-for-byte. Order matters:
    * emails before phones (a phone pattern could otherwise eat the digits
    * of user123@…), IPs before phones (dotted quads are digit runs).
    *
    * The phone patterns trade recall for precision: only '+'-led
    * international forms and US parenthesized forms are masked. A bare
    * digit-run pattern also matches ISO dates/timestamps and long ids
    * (RE2 has no lookaround to exclude them) and would corrupt clean
    * corpus text — a date is exactly what a training document is allowed
    * to contain. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\+\\d[\\d()\\- ]{5,}\\d" -> "<PHONE>",
    "\\(\\d{3}\\)[ -]?\\d{3}[ -]\\d{4}" -> "<PHONE>")

  /** (pattern, replacement) chain for unicode-lite normalization — the
    * standard pre-tokenization cleanup: curly quotes/primes → ASCII,
    * en/em dashes → '-', ellipsis → '...', control chars → space (this
    * also erases the Java-vs-RE2 `\s` disagreement over \x0B before the
    * whitespace collapse runs), then whitespace runs → one space. ONE
    * definition drives both engines. */
  private val NormalizePatterns: Seq[(String, String)] = Seq(
    "[‘’‚′]" -> "'",
    "[“”„″]" -> "\"",
    "[‒–—―]" -> "-",
    "…" -> "...",
    "[\\x00-\\x1f\\x7f]" -> " ",
    "\\s+" -> " ")

  /** Normalize text for tokenization: the [[NormalizePatterns]] chain,
    * trimmed and lowercased. Scan-stage regexp chain, no shuffle;
    * RE2-portable so the oracle mirrors it exactly. Idempotent. */
  def normalizeText(text: Column): Column =
    lower(trim(NormalizePatterns.foldLeft(text) { case (acc, (pat, repl)) =>
      regexp_replace(acc, pat, repl)
    }))

  /** DuckDB twin of [[normalizeText]] over `expr` (single-quoted SQL
    * strings pass backslashes through verbatim — no re-escaping, same
    * as [[scrubPiiSql]]). */
  def normalizeTextSql(expr: String): String = {
    val chain = NormalizePatterns.foldLeft(expr) { case (acc, (pat, repl)) =>
      val p = pat.replace("'", "''")
      val r = repl.replace("'", "''")
      s"regexp_replace($acc, '$p', '$r', 'g')"
    }
    s"lower(trim($chain))"
  }

  /** Overlapping token-window chunking (RAG / embedding-prep shape):
    * chunk k covers tokens [k·stride, k·stride + chunkSize); the final
    * chunk may be shorter; docs with no tokens emit no chunks, and every
    * token lands in at least one chunk. Scan-stage sequence + slice with
    * one generator — no shuffle, chunk text re-joined with single
    * spaces.
    * @return (id, chunk_idx, n_chunk_tokens, chunk_text) */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      s"need 1 <= stride <= chunkSize, got size=$chunkSize stride=$stride")
    val base = df.select(col(idCol).as("id"), tokens(col(textCol)).as("ts"))
      .withColumn("n", size(col("ts")).cast("long"))
      .filter(col("n") > 0)
    val lastK = greatest(lit(0L),
      ceil((col("n") - lit(chunkSize)).cast("double") / lit(stride)).cast("long"))
    base
      .select(col("id"),
        transform(sequence(lit(0L), lastK), k =>
          concat_ws(" ", slice(col("ts"), (k * stride + 1).cast("int"), lit(chunkSize))))
          .as("cs"))
      .select(col("id"), posexplode(col("cs")).as(Seq("chunk_idx", "chunk_text")))
      .select(col("id"), col("chunk_idx").cast("long").as("chunk_idx"),
        size(split(col("chunk_text"), " ")).cast("long").as("n_chunk_tokens"),
        col("chunk_text"))
  }

  /** SENTENCE-aligned chunking — the RAG-preferred variant of
    * [[chunkTokens]]: retrieval chunks that respect sentence boundaries
    * embed and cite better than mid-sentence token windows. Sentences
    * split after terminal punctuation ([.!?] + whitespace); RE2 has no
    * lookbehind, so the boundary keeps its terminator via a
    * capture-group replace onto a control-char separator no text corpus
    * contains (the BPE-oracle chr(31) precedent), then a plain split.
    * `chunkSentences` consecutive sentences per chunk with `stride`
    * overlap, ragged tail kept — the [[chunkTokens]] window contract.
    * Scan-stage: one replace, one split, one generator; zero shuffle.
    *
    * @return (id, chunk_idx, n_sentences, chunk_text) */
  def sentenceChunks(df: DataFrame, idCol: String, textCol: String,
                     chunkSentences: Int, stride: Int): DataFrame = {
    require(chunkSentences >= 1 && stride >= 1 && stride <= chunkSentences,
      s"need 1 <= stride <= chunkSentences, got size=$chunkSentences stride=$stride")
    val sep = "\u001f" // chr(31): the BPE-oracle separator precedent
    val marked = regexp_replace(trim(col(textCol)), "([.!?])\\s+", "$1" + sep)
    val sents = filter(transform(split(marked, sep), s => trim(s)), s => s =!= "")
    val base = df.select(col(idCol).as("id"), sents.as("ss"))
      .withColumn("n", size(col("ss")).cast("long"))
      .filter(col("n") > 0)
    val lastK = greatest(lit(0L),
      ceil((col("n") - lit(chunkSentences)).cast("double") / lit(stride)).cast("long"))
    base
      .select(col("id"), col("ss"),
        transform(sequence(lit(0L), lastK), k =>
          slice(col("ss"), (k * stride + 1).cast("int"), lit(chunkSentences))).as("cs"))
      .select(col("id"), posexplode(col("cs")).as(Seq("chunk_idx", "chunk")))
      .select(col("id"), col("chunk_idx").cast("long").as("chunk_idx"),
        size(col("chunk")).cast("long").as("n_sentences"),
        concat_ws(" ", col("chunk")).as("chunk_text"))
  }

  /** The identical masking chain as DuckDB SQL over `expr` — generated
    * from [[PiiPatterns]] so the oracle can never drift from the code. */
  def scrubPiiSql(expr: String): String =
    PiiPatterns.foldLeft(expr) { case (acc, (pat, repl)) =>
      s"regexp_replace($acc, '$pat', '$repl', 'g')"
    }

  /** Mask emails, IPv4s, and phone-shaped digit runs — the minimum scrub a
    * training corpus gets before release. Pure codegen'd regexp_replace
    * chain: runs in the scan stage, no shuffle. */
  def scrubPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Card-shaped candidate: 13–19 digits with optional single space/dash
    * separators, on word boundaries. RE2-portable (no lookaround) — the
    * checksum, not the regex, rejects dates/ids/phone tails. */
  val CardPattern: String = "\\b(?:\\d[ -]?){12,18}\\d\\b"

  /** Mask payment-card numbers with CHECKSUM validation: card-shaped digit
    * runs ([[CardPattern]]) mask only when their digits pass Luhn, so
    * 16-digit order ids and timestamps survive while real PANs (spaced,
    * dashed, or bare) don't — the validated upgrade of [[scrubPii]]'s
    * shape-only masking. Per-row scan-stage expression: extract
    * candidates, keep Luhn-valid ones (Spark's `luhn_check`), fold each
    * back with a WORD-BOUNDARY-anchored replace — a literal replace
    * would also rewrite the candidate's digits where they appear inside
    * a longer non-card run elsewhere in the document (boundary
    * protection applied only at extraction). Candidates are digits,
    * spaces, and dashes only, so the re-wrapped pattern needs no regex
    * escaping. No shuffle; compose with [[scrubPii]] freely (run cards
    * FIRST — masking emails/phones can't create card shapes, but a
    * phone mask inside a spaced PAN would hide it). */
  def maskCardNumbers(text: Column): Column = {
    val valid = filter(
      regexp_extract_all(text, lit(CardPattern), lit(0)),
      c => call_function("luhn_check", regexp_replace(c, "[ -]", "")))
    aggregate(valid, text,
      (acc, c) => regexp_replace(acc,
        concat(lit("\\b"), c, lit("\\b")), lit("<CARD>")))
  }

  /** DuckDB twin of [[maskCardNumbers]] over `expr`: the same candidate
    * extraction and per-candidate Luhn (doubling from the right, digits
    * > 9 reduced by 9) in list lambdas, folded by `list_reduce` with the
    * original text prepended as the init value — replacement anchored to
    * word boundaries exactly like the Spark side (candidates carry no
    * regex metacharacters, so bare concatenation is safe). */
  def maskCardNumbersSql(expr: String): String = {
    val ds = s"regexp_replace(c, '[ -]', '', 'g')"
    val digitAt = s"CAST(substr(reverse($ds), i, 1) AS INT)"
    val luhn =
      s"""(list_sum(list_transform(range(1, len($ds) + 1),
         |  i -> CASE WHEN i % 2 = 0 THEN
         |         CASE WHEN 2 * $digitAt > 9 THEN 2 * $digitAt - 9
         |              ELSE 2 * $digitAt END
         |       ELSE $digitAt END)) % 10 = 0)""".stripMargin
    s"""list_reduce(
       |  list_prepend($expr,
       |    list_filter(regexp_extract_all($expr, '$CardPattern', 0), c -> $luhn)),
       |  (acc, x) -> regexp_replace(acc, '\\b' || x || '\\b', '<CARD>', 'g'))""".stripMargin
  }

  /** Line-level boilerplate filter (CCNet/C4-style): a line survives when
    * it has ≥ `minWords` whitespace words AND its digit share of non-space
    * chars is ≤ `maxDigitRatio` (navigation stubs, timestamps, page
    * numbers, and blank lines — the all-whitespace ratio is defined as 1 —
    * all fail one of the two). Every regex is RE2-safe and mirrored by
    * [[keepLineSql]] so the oracle can never drift. */
  def keepLine(line: Column, minWords: Int, maxDigitRatio: Double): Column = {
    val words = size(filter(split(trim(line), "\\s+"), t => t =!= ""))
    val nonSpace = length(regexp_replace(line, "\\s", ""))
    val digits = length(regexp_replace(line, "[^0-9]", ""))
    val digitRatio = when(nonSpace === 0, lit(1.0))
      .otherwise(digits.cast("double") / nonSpace.cast("double"))
    words >= minWords && digitRatio <= maxDigitRatio
  }

  /** Rejoin of the surviving lines (the document-level cleaning pass every
    * web corpus gets before quality scoring). Stays a scan-stage expression;
    * the per-line predicates are interpreted inside the lambda, which is
    * fine at lines-per-doc scale (the per-TOKEN hot-path rule doesn't
    * apply). */
  def cleanLines(text: Column, minWords: Int = 3,
                 maxDigitRatio: Double = 0.5): Column =
    concat_ws("\n", filter(split(text, "\n"),
      l => keepLine(l, minWords, maxDigitRatio)))

  /** C4/RefinedWeb corpus-level frequent-line removal: drop every line
    * whose occurrence count ACROSS THE WHOLE CORPUS exceeds
    * `maxOccurrences` (boilerplate — copyright footers, nav menus, cookie
    * banners — repeats verbatim across pages; [[cleanLines]]'s per-line
    * heuristics can't see corpus frequency). Documents are reassembled
    * with surviving lines in original order; a fully-boilerplate doc
    * comes back as an empty string with `n_kept = 0`, never dropped
    * (token accounting stays the caller's decision).
    *
    * Plan shape at 100 TB: the count is one line-digest aggregation with
    * map-side partials; the frequent set joins back as a digest-keyed
    * LEFT ANTI (Zipf makes it small — candidates must repeat > k times —
    * so AQE typically broadcasts it), and reassembly is one groupBy on
    * the doc id. Line text rides the two line-level exchanges — unlike
    * the doc-level dedups there is no digest-only trick, because the
    * output IS the surviving text.
    *
    * @return (idCol, clean, n_kept) — one row per input row */
  def dedupFrequentLines(df: org.apache.spark.sql.DataFrame, idCol: String,
                         textCol: String, maxOccurrences: Long)
      : org.apache.spark.sql.DataFrame = {
    require(maxOccurrences >= 1, s"maxOccurrences must be >= 1, got $maxOccurrences")
    val lines = df.select(col(idCol).as("__id"),
      posexplode(split(col(textCol), "\n")).as(Seq("__idx", "__line")))
    val frequent = lines.groupBy(md5(col("__line")).as("__h"))
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") > maxOccurrences)
      .select(col("__h"))
    val rebuilt = lines
      .join(frequent, md5(col("__line")) === col("__h"), "left_anti")
      .groupBy(col("__id"))
      .agg(
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("__idx"), col("__line")))),
          s => s.getField("__line"))).as("clean"),
        count(lit(1)).cast("long").as("n_kept"))
    df.select(col(idCol))
      .join(rebuilt, col(idCol) === rebuilt("__id"), "left")
      .select(col(idCol),
        coalesce(col("clean"), lit("")).as("clean"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Top-`k` token vocabulary with stable integer ids — the tokenizer-
    * training primitive (and the input to any id-encoded corpus pass).
    * Ids are assigned by (count desc, token asc), so the mapping is a pure
    * function of the corpus: re-running yields identical ids.
    *
    * Plan shape: one word-count aggregation (map-side partial) on token
    * digests' worth of data, then a DISTRIBUTED partial top-k
    * (TakeOrderedAndProject) — never a global sort of the vocabulary.
    * Ids come from zipWithIndex over the take-ordered output (already
    * sorted, ≤ k rows by contract) — no global row_number window, so the
    * engine emits no single-partition WindowExec anywhere (the PlanSpec
    * "never a single-partition window" rule, held tree-wide).
    *
    * @return (token, n, id) — id in [0, k) */
  def buildVocab(df: org.apache.spark.sql.DataFrame, textCol: String, k: Int)
      : org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"vocab size must be >= 1, got $k")
    val counts = df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    val spark = df.sparkSession
    val top = counts.orderBy(col("n").desc, col("token")).limit(k)
    val ranked = top.rdd // TakeOrderedAndProject emits rows in sort order
      .zipWithIndex.map { case (r, i) => (r.getString(0), r.getLong(1), i) }
    spark.createDataFrame(ranked).toDF("token", "n", "id")
  }

  /** Learn a byte-pair-encoding merge list from the corpus — the REAL
    * subword tokenizer ([[subwordCount]] is a regex stand-in for length
    * filtering; this is the trainable Sennrich-style BPE whose pieces a
    * pretraining pipeline actually feeds the model). Apply with
    * [[graft.functions.BpeEncode]] (`BpeEncode.of(tokens(text), merges)`)
    * — a scan-stage kernel, zero shuffle.
    *
    * Scale shape (and why this is the standard practice, not a shortcut):
    * BPE training needs only the WORD-FREQUENCY table, not the corpus —
    * every major tokenizer trainer aggregates words first. Here that is
    * one distributed token-count aggregation (map-side partial) reduced
    * to the top `maxWords` distinct words by (count desc, word asc) — a
    * distributed TakeOrdered, no global sort — and Zipf's law makes the
    * top ~100k words carry almost the whole frequency mass, so the cap
    * bounds driver memory the same way every codebook here does. The
    * merge loop then runs driver-side over ≤ maxWords rows: O(numMerges ×
    * Σ|word|) plain-Scala work on counts, not corpus passes.
    *
    * Determinism: ties in pair frequency break by (pair lexicographic) —
    * the merge list is a pure function of the word-frequency table, which
    * is itself exact integer counts: bit-identical across partitionings,
    * retries, and cluster sizes.
    *
    * @return merges in rank order (earlier = applied first) */
  def trainBpe(df: org.apache.spark.sql.DataFrame, textCol: String,
               numMerges: Int, maxWords: Int = 100000): Seq[(String, String)] = {
    require(numMerges >= 0 && maxWords >= 1, s"bad numMerges=$numMerges / maxWords=$maxWords")
    trainBpeFromCounts(df
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(maxWords)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq,
      numMerges)
  }

  /** The driver-side merge loop of [[trainBpe]] over an explicit
    * word-frequency table — pure and data-source-free, so a FIXED fixture
    * table yields a constant merge list usable in oracle SQL
    * ([[bpeEncodeSql]]) and in tests. */
  def trainBpeFromCounts(wordCounts: Seq[(String, Long)],
                         numMerges: Int): Seq[(String, String)] = {
    val words: Array[(Array[String], Long)] = wordCounts.toArray.map { case (w, n) =>
      val syms = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) { // code points, matching BpeKernel.encodeWord
        val cc = Character.charCount(w.codePointAt(i))
        syms += w.substring(i, i + cc); i += cc
      }
      syms += graft.functions.BpeKernel.EndOfWord
      (syms.toArray, n)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var vocab = words
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val best = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.map { case (syms, n) =>
          if (syms.length < 2) (syms, n)
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                out += syms(i) + syms(i + 1); i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, n)
          }
        }
      }
    }
    merges.toSeq
  }

  /** Piece vocabulary implied by a merge list — the standard BPE layout:
    * the training ALPHABET (distinct code points of the training words,
    * sorted) plus the end-of-word marker, followed by merged symbols in
    * rank order. Ids are list positions, so the vocab is a pure function
    * of (wordCounts, merges) — reproducible everywhere. Pieces outside
    * the vocab (characters never seen in training) are the encoder's OOV
    * cases. */
  def bpeVocab(wordCounts: Seq[(String, Long)],
               merges: Seq[(String, String)]): Seq[String] = {
    val alphabet = wordCounts.flatMap { case (w, _) =>
      val b = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val cc = Character.charCount(w.codePointAt(i))
        b += w.substring(i, i + cc); i += cc
      }
      b
    }.distinct.sorted
    ((alphabet :+ graft.functions.BpeKernel.EndOfWord) ++
      merges.map { case (a, b) => a + b }).distinct
  }

  /** DuckDB twin of [[graft.functions.BpeKernel.encodeWord]] over word
    * expression `w`, for a FIXED merge list: each symbol is wrapped
    * chr(31)·sym·chr(30) (both markers absent from any text corpus this
    * oracle runs on — boundary-safe: a pattern can neither match across a
    * symbol boundary nor match a symbol prefix), and each merge in rank
    * order becomes one `replace` of the wrapped pair with the wrapped
    * concatenation. Sequential-by-rank application equals the kernel's
    * greedy lowest-rank loop for TRAINED merge lists (a merge's operands
    * predate it, so applying rank r can never create a lower-rank pair —
    * the standard BPE equivalence), and SQL `replace`'s left-to-right
    * non-overlapping scan is exactly the kernel's merge pass.
    *
    * @return SQL producing the wrapped piece string of one word */
  def bpeEncodeSql(w: String, merges: Seq[(String, String)]): String = {
    def wrapped(s: String) = s"chr(31) || '${s.replace("'", "''")}' || chr(30)"
    val base = s"array_to_string(list_transform(string_split($w, ''), " +
      "c -> chr(31) || c || chr(30)), '') || chr(31) || '</w>' || chr(30)"
    merges.foldLeft(base) { case (acc, (a, b)) =>
      s"replace($acc, ${wrapped(a)} || ${wrapped(b)}, ${wrapped(a + b)})"
    }
  }

  /** BPE DECODE — ids back to text (every tokenizer ships decode; a
    * pipeline needs it for inspection, eval-sample rendering, and the
    * round-trip identity check below). Each id maps through the vocab
    * (a plan-time map literal — scan-stage, zero shuffle), -1/unknown
    * ids render as `<unk>`, pieces concatenate and the end-of-word
    * marker becomes a space.
    *
    * Identity contract: for a document whose encode produced no OOV ids,
    * decode(encode(text)) equals the normalized token sequence joined by
    * single spaces — BPE merges only ever concatenate adjacent symbols
    * of one word, so the piece string spells the word exactly. (Corpus
    * text containing the literal `</w>` marker would alias a word
    * boundary — no natural-language corpus does, and such characters are
    * OOV under a letters-only training alphabet anyway.)
    *
    * @return (id, decoded, n_unk) */
  def decodeBpeIds(df: org.apache.spark.sql.DataFrame, idCol: String,
                   idsCol: String, vocab: Seq[String]): org.apache.spark.sql.DataFrame = {
    val entries = vocab.zipWithIndex.flatMap { case (p, i) =>
      Seq(lit(i.toLong), lit(p))
    }
    val vocabMap = map(entries: _*)
    df.select(col(idCol),
        transform(col(idsCol), id =>
          coalesce(element_at(vocabMap, id), lit("<unk>"))).as("__pieces"))
      .select(col(idCol),
        trim(expr(s"replace(array_join(__pieces, ''), '${graft.functions.BpeKernel.EndOfWord}', ' ')"))
          .as("decoded"),
        size(filter(col("__pieces"), p => p === "<unk>")).cast("long").as("n_unk"))
  }

  /** WordPiece trainer over an explicit word-frequency table — pure and
    * data-source-free like [[trainBpeFromCounts]], the third tokenizer
    * family (BPE merge-replay, unigram-LM Viterbi, WordPiece
    * longest-match). Seed symbols are each word's first code point plus
    * `##`-prefixed continuations (Wu et al. 2016 / the BERT trainer);
    * each merge joins the adjacent pair with the HIGHEST likelihood
    * score count(ab) / (count(a)·count(b)) under the CURRENT
    * segmentation — exact integer comparison via BigInt cross
    * multiplication, ties by pair lexicographic order — and the merged
    * piece keeps the left symbol's continuation marker.
    *
    * @return the piece VOCABULARY ([[graft.functions.WordPieceEncode]]'s
    *         input — longest-match encoding needs only the set): seed
    *         alphabet sorted, then merged pieces in rank order */
  def trainWordPieceFromCounts(wordCounts: Seq[(String, Long)],
                               numMerges: Int): Seq[String] = {
    require(numMerges >= 0, s"bad numMerges=$numMerges")
    val CP = graft.functions.WordPieceKernel.ContinuationPrefix
    def symsOf(w: String): Array[String] = {
      val b = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val cc = Character.charCount(w.codePointAt(i))
        val c = w.substring(i, i + cc)
        b += (if (i == 0) c else CP + c)
        i += cc
      }
      b.toArray
    }
    var vocabWords: Array[(Array[String], Long)] =
      wordCounts.toArray.map { case (w, n) => (symsOf(w), n) }
    val alphabet = vocabWords.flatMap(_._1).distinct.sorted.toSeq
    val merged = scala.collection.mutable.ArrayBuffer.empty[String]
    var exhausted = false
    while (merged.size < numMerges && !exhausted) {
      val symCounts = scala.collection.mutable.HashMap.empty[String, Long]
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocabWords.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length) {
          symCounts.update(syms(i), symCounts.getOrElse(syms(i), 0L) + n)
          if (i < syms.length - 1) {
            val p = (syms(i), syms(i + 1))
            pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          }
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // argmax of c_ab/(c_a·c_b): cross-multiplied BigInt compare, so
        // the ranking is exact for any count magnitude
        val best = pairCounts.toSeq.reduceLeft { (x, y) =>
          val ((xa, xb), xc) = x
          val ((ya, yb), yc) = y
          val lhs = BigInt(xc) * symCounts(ya) * symCounts(yb)
          val rhs = BigInt(yc) * symCounts(xa) * symCounts(xb)
          val c = lhs.compare(rhs)
          if (c > 0) x
          else if (c < 0) y
          else if (Ordering[(String, String)].lteq((xa, xb), (ya, yb))) x else y
        }._1
        val joined = best._1 + best._2.stripPrefix(CP)
        merged += joined
        vocabWords = vocabWords.map { case (syms, n) =>
          if (syms.length < 2) (syms, n)
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                out += joined; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, n)
          }
        }
      }
    }
    (alphabet ++ merged).distinct
  }

  /** DuckDB twin of [[graft.functions.WordPieceKernel.encodeWord]] for a
    * FIXED vocab: the greedy longest-match loop UNROLLS into
    * `maxWordChars` strip steps as a MATERIALIZED CTE chain over the
    * distinct-word table (each successful step consumes ≥ 1 char, so
    * that many steps always suffice; CTE materialization keeps the
    * unrolled steps linear — lateral aliases would re-inline every
    * prior step and blow up exponentially). Per step, one generated
    * CASE (arms sorted by effective length DESC, then stored piece —
    * the longest-match rule made explicit) yields the matched STORED
    * piece and a parallel CASE its effective length as a literal, so
    * `##`-prefix stripping never happens at runtime. A stuck position
    * leaves the remainder nonempty and the word renders as `[UNK]`, as
    * does one over the length cap.
    *
    * @param wordsCte name of a CTE providing one DISTINCT word per row
    *                 in column `w`
    * @return CTE-chain SQL (to splice after `wordsCte`) ending in CTE
    *         `wp_enc(w, pieces_w)` — the chr(31)/chr(30)-wrapped piece
    *         string per word */
  def wordPieceEncodeCtes(wordsCte: String, vocab: Seq[String],
                          maxWordChars: Int): String = {
    val CP = graft.functions.WordPieceKernel.ContinuationPrefix
    def esc(s: String) = s.replace("'", "''")
    def wrap(s: String) = s"chr(31) || '${esc(s)}' || chr(30)"
    val unk = wrap(graft.functions.WordPieceKernel.Unk)
    // (stored, effective) candidates per position class, longest first
    def arms(pieces: Seq[(String, String)],
             out: (String, String) => String): String =
      pieces.sortBy { case (st, eff) => (-eff.length, st) }.map { case (st, eff) =>
        s"WHEN substr(r, 1, ${eff.length}) = '${esc(eff)}' THEN ${out(st, eff)}"
      }.mkString(" ")
    val startP = vocab.filter(p => !p.startsWith(CP) && p.nonEmpty).map(p => (p, p))
    val contP = vocab.filter(p => p.startsWith(CP))
      .map(p => (p, p.substring(CP.length))).filter(_._2.nonEmpty)
    val sb = new StringBuilder
    sb ++= s"wp_0 AS (SELECT w, w AS r, '' AS acc, FALSE AS stuck FROM $wordsCte)"
    for (k <- 0 until maxWordChars) {
      val ps = if (k == 0) startP else contP
      // m = '' means done (nothing left); NULL means NO piece matches at
      // this position — the stuck LATCH below makes that terminal, like
      // the kernel's whole-word [UNK] bail-out (without the latch a
      // word with no start-position match would resume matching
      // continuation pieces at the next step)
      val m = "CASE WHEN stuck OR r = '' THEN '' ELSE CASE " +
        arms(ps, (st, _) => s"'${esc(st)}'") + " ELSE NULL END END"
      val l = "CASE WHEN stuck OR r = '' THEN 0 ELSE CASE " +
        arms(ps, (_, eff) => eff.length.toString) + " ELSE NULL END END"
      sb ++= s""",
        |wp_${k + 1} AS MATERIALIZED (
        |  SELECT w,
        |    CASE WHEN m IS NULL OR m = '' THEN r ELSE substr(r, l + 1) END AS r,
        |    CASE WHEN m IS NULL OR m = '' THEN acc
        |         ELSE acc || chr(31) || m || chr(30) END AS acc,
        |    stuck OR m IS NULL AS stuck
        |  FROM (SELECT w, r, acc, stuck, $m AS m, $l AS l FROM wp_$k))""".stripMargin
    }
    sb ++= s""",
      |wp_enc AS (
      |  SELECT w, CASE WHEN length(w) > $maxWordChars OR w = '' OR stuck
      |      OR r <> ''
      |    THEN $unk ELSE acc END AS pieces_w
      |  FROM wp_$maxWordChars)""".stripMargin
    sb.toString
  }

  /** Corpus-trained WordPiece ([[trainBpe]]'s counterpart): top-maxWords
    * word counts (deterministic (n desc, w) selection — the bounded
    * codebook-collect contract) feed the pure trainer. */
  def trainWordPiece(df: org.apache.spark.sql.DataFrame, textCol: String,
                     numMerges: Int, maxWords: Int = 100000): Seq[String] = {
    require(numMerges >= 0 && maxWords >= 1, s"bad numMerges=$numMerges / maxWords=$maxWords")
    trainWordPieceFromCounts(df
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(maxWords)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq,
      numMerges)
  }

  /** Generated DuckDB CTE chain that RETRAINS WordPiece from the corpus
    * — the SQL twin of [[trainWordPiece]], closing the train-side gap
    * like [[bpeRetrainCtes]] does for BPE. Each unrolled iteration
    * computes symbol AND pair counts over the current segmentation and
    * picks the argmax of count(ab)/(count(a)·count(b)) EXACTLY via a
    * single sort key: fk = floor(c · 2^96 / (ca·cb)) in HUGEINT. The
    * key SEPARATES every pair of distinct ratios — two distinct
    * rationals with denominators ca·cb ≤ 2^48 differ by ≥ 2^-96, so
    * their floor keys differ by ≥ 1 — hence (fk DESC, a, b) equals the
    * Scala trainer's BigInt cross-multiplied argmax with lexicographic
    * ties for any corpus with symbol counts ≤ 2^24 (a double ratio sort
    * would NOT be exact; an anti-join formulation was, but its
    * per-iteration operator tree held ~20 MB to the end of the query
    * and 16 iterations blew the 128 MB oracle bar). Then each iteration
    * applies the merge as one boundary-wrapped replace (right symbol's
    * `##` strips, the left's marker survives: the WordPiece join rule).
    * ASCII-corpus caveat as bpeRetrainCtes (UTF-16/code-point orders
    * agree).
    *
    * Emits `wpc`, `wp_seqs_i`, `wp_best_i` (1..numMerges) and the final
    * runtime vocab `wpv(sym, eff, is_cont)`; chain
    * [[wordPieceApplyDocCtes]] after it. */
  def wordPieceRetrainCtes(tokensSqlExpr: String, maxWords: Int,
                           numMerges: Int): String = {
    // coalesce: DuckDB's array_to_string([], '') is NULL, which would
    // null the whole seed for single-char words and silently drop them
    // from training (caught by the 6-merge divergence this gate exists
    // to catch)
    val seed = "chr(31) || substr(w, 1, 1) || chr(30) || " +
      "coalesce(array_to_string(list_transform(range(2, length(w) + 1), " +
      "i -> chr(31) || '##' || substr(w, i, 1) || chr(30)), ''), '')"
    val sb = new StringBuilder
    sb ++= s"""wpc AS (
      |  SELECT t AS w, CAST(count(*) AS BIGINT) AS n
      |  FROM (SELECT unnest($tokensSqlExpr) AS t FROM documents)
      |  GROUP BY t ORDER BY n DESC, w LIMIT $maxWords),
      |wp_seqs_0 AS MATERIALIZED (SELECT w, n, $seed AS s FROM wpc)""".stripMargin
    for (i <- 1 to numMerges) {
      val prev = s"wp_seqs_${i - 1}"
      sb ++= s""",
        |wpt_syms_$i AS (
        |  SELECT n, list_filter(string_split(replace(s, chr(30), ''), chr(31)), x -> x <> '') AS syms
        |  FROM $prev),
        |wpt_symc_$i AS (
        |  SELECT sym, CAST(sum(n) AS BIGINT) AS c
        |  FROM (SELECT n, unnest(syms) AS sym FROM wpt_syms_$i) GROUP BY sym),
        |wpt_pairs_$i AS (
        |  SELECT a, b, CAST(sum(n) AS BIGINT) AS c FROM (
        |    SELECT n, syms[j] AS a, syms[j + 1] AS b
        |    FROM (SELECT n, syms, unnest(range(1, len(syms))) AS j
        |          FROM wpt_syms_$i WHERE len(syms) >= 2))
        |  GROUP BY a, b),
        |wp_best_$i AS MATERIALIZED (
        |  SELECT a, b FROM (
        |    SELECT p.a, p.b,
        |      (CAST(p.c AS HUGEINT) * 79228162514264337593543950336) //
        |        (CAST(ca.c AS HUGEINT) * cb.c) AS fk
        |    FROM wpt_pairs_$i p
        |    JOIN wpt_symc_$i ca ON p.a = ca.sym
        |    JOIN wpt_symc_$i cb ON p.b = cb.sym)
        |  ORDER BY fk DESC, a, b LIMIT 1),
        |wp_seqs_$i AS MATERIALIZED (
        |  SELECT w, n, CASE WHEN m.a IS NULL THEN s ELSE
        |    replace(s, chr(31) || m.a || chr(30) || chr(31) || m.b || chr(30),
        |               chr(31) || m.a || substr(m.b, 3) || chr(30)) END AS s
        |  FROM $prev LEFT JOIN wp_best_$i m ON TRUE)""".stripMargin
    }
    val mergeUnion = (1 to numMerges)
      .map(i => s"SELECT a || substr(b, 3) AS sym FROM wp_best_$i")
      .mkString("\n  UNION ALL ")
    sb ++= s""",
      |wp_alpha AS (
      |  SELECT DISTINCT x AS sym
      |  FROM (SELECT unnest(list_filter(string_split(replace(s, chr(30), ''), chr(31)),
      |          x -> x <> '')) AS x
      |        FROM wp_seqs_0)),
      |wpv AS (
      |  SELECT DISTINCT sym,
      |    CASE WHEN sym LIKE '##%' THEN substr(sym, 3) ELSE sym END AS eff,
      |    (sym LIKE '##%') AS is_cont
      |  FROM (SELECT sym FROM wp_alpha
      |  ${if (numMerges > 0) s"UNION ALL $mergeUnion" else ""})
      |  WHERE CASE WHEN sym LIKE '##%' THEN length(sym) > 2
      |        ELSE length(sym) > 0 END)""".stripMargin
    sb.result()
  }

  /** Runtime-vocab longest-match encode over the corpus for a TRAINED
    * `wpv` ([[wordPieceRetrainCtes]]'s output): the fixed-vocab
    * generator's strip chain can't inline arms it doesn't know at
    * generation time, so each unrolled step instead takes its longest
    * match from a LATERAL top-1 probe of `wpv` (length DESC — within a
    * position class, distinct stored pieces have distinct effective
    * texts, so no tie exists). Same latched-stuck / over-length [UNK]
    * contract as the kernel. Emits `wpe_tok(doc_id, w, i)` and
    * `wp_enc(w, pieces_w)`. */
  def wordPieceApplyDocCtes(tokensSqlExpr: String, maxWordChars: Int): String = {
    // Structure chosen by three hard constraints, found the expensive way:
    //  1. ONE recursive walk, not maxWordChars chained MATERIALIZED
    //     steps — every materialized CTE stays allocated until the query
    //     ends, and the chained form's fixed per-step footprint pushed
    //     this oracle over the 128 MB no-spill bar.
    //  2. The longest match per (word, offset) is precomputed OUTSIDE
    //     the recursion (`wp_match`, a plain argmax — no ties: two
    //     distinct same-class pieces matching one offset at one length
    //     would be the same piece), because DuckDB resolves CTE
    //     references made from CORRELATED SUBQUERIES inside a recursive
    //     term against not-yet-populated relations (observed: an
    //     all-[UNK] feed, then a merge-less vocab) — a plain equi-JOIN
    //     in the recursive term resolves correctly.
    //  3. The recursion must be a TOP-LEVEL member of the caller's
    //     WITH, which therefore says WITH RECURSIVE.
    // The walk advances pos by the matched piece's effective length;
    // a stuck offset terminates the word (whole-word [UNK], like the
    // kernel), and the over-length cap applies in wp_enc.
    s"""wpe_tok AS MATERIALIZED (
      |  SELECT doc_id, unnest(ts) AS w, unnest(range(1, len(ts) + 1)) AS i
      |  FROM (SELECT doc_id, $tokensSqlExpr AS ts FROM documents)),
      |wpe_words AS (SELECT DISTINCT w FROM wpe_tok),
      |wp_match AS MATERIALIZED (
      |  SELECT w, o, arg_max(sym, elen) AS sym, max(elen) AS elen
      |  FROM (
      |    SELECT p.w, p.o, v.sym, length(v.eff) AS elen
      |    FROM (SELECT w, unnest(range(1, length(w) + 1)) AS o FROM wpe_words) p
      |    JOIN wpv v ON v.is_cont = (p.o > 1)
      |      AND substr(p.w, p.o, length(v.eff)) = v.eff)
      |  GROUP BY w, o),
      |wpe_steps(w, acc, stuck, pos) AS (
      |  SELECT w, '', FALSE, 1 FROM wpe_words
      |  UNION ALL
      |  SELECT s.w,
      |    CASE WHEN m.sym IS NULL THEN s.acc
      |         ELSE s.acc || chr(31) || m.sym || chr(30) END,
      |    m.sym IS NULL,
      |    CASE WHEN m.sym IS NULL THEN s.pos ELSE s.pos + m.elen END
      |  FROM wpe_steps s LEFT JOIN wp_match m ON m.w = s.w AND m.o = s.pos
      |  WHERE s.pos <= length(s.w) AND NOT s.stuck),
      |wpe_rec AS MATERIALIZED (
      |  SELECT w, arg_max(acc, pos) AS acc, bool_or(stuck) AS stuck,
      |    max(pos) AS pos
      |  FROM wpe_steps GROUP BY w),
      |wp_enc AS (
      |  SELECT w, CASE WHEN length(w) > $maxWordChars OR w = '' OR stuck
      |      OR pos <= length(w)
      |    THEN chr(31) || '[UNK]' || chr(30) ELSE acc END AS pieces_w
      |  FROM wpe_rec)""".stripMargin
  }

  /** WordPiece DECODE — ids back to text ([[decodeBpeIds]]'s counterpart
    * for the longest-match family): ids map through `[UNK] +: vocab` (a
    * plan-literal map, scan-stage), `##` pieces append to the current
    * word, unprefixed pieces start a new space-separated word, unknown
    * ids render `[UNK]`.
    *
    * Identity contract: a word's pieces are verbatim substrings of the
    * word (longest-match never rewrites characters), so for any doc with
    * zero [UNK] ids, decode(encode(text)) equals the normalized token
    * sequence joined by single spaces.
    *
    * @return (id, decoded, n_unk) */
  def decodeWordPieceIds(df: org.apache.spark.sql.DataFrame, idCol: String,
                         idsCol: String, vocab: Seq[String]): org.apache.spark.sql.DataFrame = {
    val CP = graft.functions.WordPieceKernel.ContinuationPrefix
    val unk = graft.functions.WordPieceKernel.Unk
    val entries = (unk +: vocab).zipWithIndex.flatMap { case (p, i) =>
      Seq(lit(i.toLong), lit(p))
    }
    val vocabMap = map(entries: _*)
    df.select(col(idCol),
        transform(col(idsCol), id =>
          coalesce(element_at(vocabMap, id), lit(unk))).as("__pieces"))
      .select(col(idCol),
        aggregate(col("__pieces"), lit(""),
          (acc, p) => when(p.startsWith(CP),
              concat(acc, p.substr(lit(CP.length + 1), length(p))))
            .otherwise(when(acc === "", p).otherwise(concat(acc, lit(" "), p))))
          .as("decoded"),
        size(filter(col("__pieces"), p => p === unk)).cast("long").as("n_unk"))
  }

  /** Generated DuckDB CTE chain that RETRAINS BPE from the corpus — the
    * SQL twin of [[trainBpe]], closing the train-side gap the fixture
    * gates leave (the text_lm_score pattern: the oracle re-derives the
    * trained artifact instead of trusting the engine under test).
    *
    * `numMerges` iterations are UNROLLED as CTEs; iteration i computes
    * adjacent-pair counts over the current wrapped symbol strings, picks
    * the argmax by (count DESC, a, b) — exactly [[trainBpeFromCounts]]'s
    * `minBy((-c, a, b))` (ASCII corpus ⇒ UTF-16 and UTF-8 byte orders
    * agree) — and applies the merge as ONE boundary-wrapped replace
    * (left-to-right non-overlap = the Scala merge pass). `bpe_best_i`
    * goes empty when pairs are exhausted; the guarded LEFT JOIN then
    * passes sequences through unchanged, matching the loop's early stop.
    *
    * Emits CTEs `wc`, `bpe_seqs_i`, `bpe_pairs_i`, `bpe_best_i`
    * (1 ≤ i ≤ numMerges); chain [[bpeApplyDocCtes]] after it to encode
    * documents with the trained merges. */
  def bpeRetrainCtes(tokensSqlExpr: String, maxWords: Int, numMerges: Int): String = {
    val base = "array_to_string(list_transform(string_split(w, ''), " +
      "c -> chr(31) || c || chr(30)), '') || chr(31) || '</w>' || chr(30)"
    val sb = new StringBuilder
    sb ++= s"""wc AS (
      |  SELECT t AS w, CAST(count(*) AS BIGINT) AS n
      |  FROM (SELECT unnest($tokensSqlExpr) AS t FROM documents)
      |  GROUP BY t ORDER BY n DESC, w LIMIT $maxWords),
      |bpe_seqs_0 AS MATERIALIZED (SELECT w, n, $base AS s FROM wc)""".stripMargin
    for (i <- 1 to numMerges) {
      val prev = s"bpe_seqs_${i - 1}"
      sb ++= s""",
        |bpe_syms_$i AS (
        |  SELECT n, list_filter(string_split(replace(s, chr(30), ''), chr(31)), x -> x <> '') AS syms
        |  FROM $prev),
        |bpe_pairs_$i AS (
        |  SELECT a, b, CAST(sum(n) AS BIGINT) AS c FROM (
        |    SELECT n, syms[j] AS a, syms[j + 1] AS b
        |    FROM (SELECT n, syms, unnest(range(1, len(syms))) AS j
        |          FROM bpe_syms_$i WHERE len(syms) >= 2))
        |  GROUP BY a, b),
        |bpe_best_$i AS MATERIALIZED (SELECT a, b FROM bpe_pairs_$i ORDER BY c DESC, a, b LIMIT 1),
        |bpe_seqs_$i AS MATERIALIZED (
        |  SELECT w, n, CASE WHEN m.a IS NULL THEN s ELSE
        |    replace(s, chr(31) || m.a || chr(30) || chr(31) || m.b || chr(30),
        |               chr(31) || m.a || m.b || chr(30)) END AS s
        |  FROM $prev LEFT JOIN bpe_best_$i m ON TRUE)""".stripMargin
    }
    sb.result()
  }

  /** Doc-encode CTE chain applying `bpe_best_1..numMerges` (from
    * [[bpeRetrainCtes]]) to every document: one guarded replace per rank
    * over the concatenated wrapped token string — a LINEAR CTE chain (a
    * nested CASE expression would copy its operand twice per rank and
    * blow up exponentially). Concatenation is safe: a trained pair's
    * first operand can never end in '</w>' (such a pair would have had
    * no successor symbol in training), so no merge can match across a
    * word boundary. Rank-sequential replace equals the kernel's greedy
    * lowest-rank loop for trained lists (same argument as
    * [[bpeEncodeSql]]). Ends at `bpe_doc_<numMerges>(doc_id, s)`. */
  def bpeApplyDocCtes(tokensSqlExpr: String, numMerges: Int): String = {
    val sb = new StringBuilder
    // no generated line may START with '||': these fragments get embedded
    // in callers' stripMargin strings, which would eat the first pipe
    sb ++= s"""bpe_doc_0 AS MATERIALIZED (
      |  SELECT doc_id, array_to_string(list_transform($tokensSqlExpr,
      |    w -> array_to_string(list_transform(string_split(w, ''), c -> chr(31) || c || chr(30)), '')
      |      || chr(31) || '</w>' || chr(30)), '') AS s
      |  FROM documents)""".stripMargin.replace("\n      ||", " ||")
    for (i <- 1 to numMerges) {
      sb ++= s""",
        |bpe_doc_$i AS MATERIALIZED (
        |  SELECT doc_id, CASE WHEN m.a IS NULL THEN s ELSE
        |    replace(s, chr(31) || m.a || chr(30) || chr(31) || m.b || chr(30),
        |               chr(31) || m.a || m.b || chr(30)) END AS s
        |  FROM bpe_doc_${i - 1} LEFT JOIN bpe_best_$i m ON TRUE)""".stripMargin
    }
    sb.result()
  }

  /** Apply a [[buildVocab]] codebook to the corpus: each document's token
    * sequence becomes a same-length id sequence — the corpus→ids encode
    * pass every pretraining pipeline runs after tokenizer training.
    * Out-of-vocabulary tokens map to -1 (length is preserved so token
    * accounting still holds; downstream drops or counts them — an
    * OOV-drop variant is one `array_remove` away).
    *
    * Plan shape (100 TB story): the vocabulary is BOUNDED by contract
    * (a tokenizer codebook — top-k rows, k ≤ a few hundred thousand), so
    * it collects once and folds into the plan as a map literal — the same
    * tiny-codebook exemption as the IVF centroids. Encoding is then a pure
    * scan-stage expression: zero shuffle, no join, no per-token explode
    * (the explode+join+regroup alternative would shuffle EVERY token
    * occurrence in the corpus — the one shape this op exists to avoid).
    *
    * @param vocab (token, id) mapping, e.g. [[buildVocab]]'s output; ids
    *   need not be dense but (token → id) must be a function
    * @return (idCol, ids: array<long>, n_oov: long) */
  def encodeIds(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
                vocab: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val pairs = vocab.select(col("token").cast("string"), col("id").cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    require(pairs.map(_._1).distinct.length == pairs.length,
      s"vocab maps a token to multiple ids (${pairs.length} rows, " +
        s"${pairs.map(_._1).distinct.length} distinct tokens)")
    val m = typedlit[Map[String, Long]](pairs.toMap)
    df.select(col(idCol),
      transform(tokens(col(textCol)), t =>
        coalesce(element_at(m, t), lit(-1L))).as("ids"))
      .withColumn("n_oov",
        size(filter(col("ids"), x => x === -1L)).cast("long"))
  }

  /** BM25 relevance of every document against a bounded query-term set
    * (Robertson/Sparck-Jones; the Lucene `ln(1 + (N-df+0.5)/(df+0.5))`
    * always-positive idf).
    *
    * Plan shape (100 TB story): corpus statistics — N, Σdl, and one df
    * counter per query term — reduce in a single tiny aggregation (partial
    * agg map-side, one row total), broadcast back via a cross join, and
    * the per-doc scoring runs entirely in the second scan's codegen span:
    * tf(t,d) = |ts| − |array_remove(ts, t)| keeps the hot loop in native
    * array ops, no explode, no shuffle of tokens. Query terms are a
    * bounded literal list by contract (a search query, not a vocabulary).
    *
    * Determinism: stats are exact integers (LONG counts; avgdl divides two
    * exact longs), so scores are bit-stable across partitioning/retries —
    * no float summation order in sight.
    */
  def bm25Scores(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], k1: Double = 1.2, b: Double = 0.75)
      : org.apache.spark.sql.DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val withTs = df.select(col(idCol), tokens(col(textCol)).as("ts"))
      .select(col(idCol), col("ts"), size(col("ts")).cast("long").as("dl"))
    val statAggs =
      Seq(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")) ++
        terms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains(col("ts"), t), 1L).otherwise(0L)).as(s"df_$i")
        }
    val stats = withTs.agg(statAggs.head, statAggs.tail: _*)
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val score = terms.zipWithIndex.map { case (t, i) =>
      val dfT = col(s"df_$i").cast("double")
      val idf = log(lit(1.0) +
        (col("n_docs").cast("double") - dfT + lit(0.5)) / (dfT + lit(0.5)))
      val tf = (col("dl") - size(array_remove(col("ts"), t)).cast("long")).cast("double")
      idf * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    }.reduce(_ + _)
    withTs.crossJoin(broadcast(stats))
      .select(col(idCol), round(score, 6).as("bm25"))
  }

  /** DuckDB twin of the [[bm25Scores]] score for the oracle: same exact-
    * integer stats CTE + per-term arithmetic in the same association
    * order. */
  def bm25Sql(terms: Seq[String], tokensSql: String,
              k1: Double = 1.2, b: Double = 0.75): String = {
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(sum(CASE WHEN list_contains(ts, '$t') THEN 1 ELSE 0 END) AS BIGINT) AS df_$i"
    }.mkString(", ")
    val avgdl = "(CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE))"
    val score = terms.zipWithIndex.map { case (t, i) =>
      val idf = s"ln(1.0 + (CAST(s.n_docs AS DOUBLE) - CAST(s.df_$i AS DOUBLE) + 0.5) / (CAST(s.df_$i AS DOUBLE) + 0.5))"
      val tf = s"CAST(d.dl - len(list_filter(d.ts, x -> x <> '$t')) AS DOUBLE)"
      s"($idf * ($tf * ${k1 + 1.0}) / ($tf + $k1 * (${1.0 - b} + $b * CAST(d.dl AS DOUBLE) / $avgdl)))"
    }.mkString(" + ")
    s"""toks AS (
       |  SELECT doc_id, $tokensSql AS ts FROM documents
       |), docs AS (
       |  SELECT doc_id, ts, CAST(len(ts) AS BIGINT) AS dl FROM toks
       |), stats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl, $dfCols FROM docs
       |), scored AS (
       |  SELECT d.doc_id, round($score, 6) AS bm25 FROM docs d CROSS JOIN stats s
       |)""".stripMargin
  }

  /** Per-document unigram (token) Shannon entropy — the RefinedWeb/Dolma-
    * family "natural language" signal: boilerplate, key-value dumps, and
    * single-phrase spam sit far below prose entropy, so a floor on this
    * column is a standard pretraining quality gate. Also emits the
    * type count (type/token ratio = n_types / n_tokens, the lexical-
    * diversity twin signal) for free.
    *
    * Exact integer contract: with q(x) = floor(lnWide(x)·10⁹ + ½) (the
    * [[graft.functions.PortableMath]] wide portable-ln, quantized to
    * nano-nats), the score is
    *
    *   entropy_qn = n·q(n) − Σ_type c_t·q(c_t)
    *
    * i.e. n·H in nano-nats (H = ln n − (1/n)Σc·ln c): an exact LONG from
    * exact longs — partition-order free, and the wide chain's −32·ln 2
    * bias cancels (Σc_t = n). Empty docs score 0 by construction. Safe to
    * ~4·10⁸ tokens/doc before n·q(n) nears Long range — documents, not
    * corpora.
    *
    * Plan shape (100 TB story): ZERO shuffle — type counts come from
    * array ops on the materialized token column, the ln chain is
    * [[graft.functions.PortableMath.lnWideCol]] (pure arithmetic usable
    * inside the lambda), so the whole signal evaluates in the scan stage.
    * Higher-order functions are interpreter-only in Spark (no codegen),
    * so the doc-local algorithm matters: counts are run lengths of the
    * SORTED token array — O(n log n) per doc — not a per-type re-scan of
    * the tokens (O(types·n), which measured ~50× slower interpreted).
    *
    * @return (id, n_tokens, n_types, entropy_qn) one row per input row */
  def tokenEntropy(df: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String): org.apache.spark.sql.DataFrame = {
    val P = graft.functions.PortableMath
    def q(x: Column): Column =
      floor(P.lnWideCol(x) * lit(1.0e9) + lit(0.5e0)).cast("long")
    val n = col("n")
    // 1-based positions where a new run begins in the sorted array (the
    // greatest() clamp keeps element_at in-domain under ANSI when i = 1;
    // the i === 1 branch wins the OR there, so the compared value is moot)
    val starts = filter(sequence(lit(1), n), i =>
      (i === lit(1)) || (element_at(col("sorted"), i) =!=
        element_at(col("sorted"), greatest(i - lit(1), lit(1)))))
    // run length = next start − this start, with a sentinel end at n+1;
    // the sentinel joins only when runs exist (zip_with pads the SHORTER
    // side with NULLs, so the two arrays must agree on length exactly)
    val counts = zip_with(
      col("starts"),
      concat(slice(col("starts"), lit(2), greatest(size(col("starts")) - 1, lit(0))),
        when(size(col("starts")) > 0, array(n + lit(1)))
          .otherwise(typedLit(Seq.empty[Int]))),
      (a, b) => b - a)
    df.select(col(idCol), tokens(col(textCol)).as("ts"))
      .select(col(idCol), size(col("ts")).as("n"), array_sort(col("ts")).as("sorted"))
      .select(col(idCol), n,
        when(n > 0, starts).otherwise(typedLit(Seq.empty[Int])).as("starts"))
      .select(col(idCol), n, counts.as("cs"), size(col("starts")).cast("long").as("n_types"))
      .select(col(idCol), n.cast("long").as("n_tokens"), col("n_types"),
        (n.cast("long") * q(greatest(n.cast("long"), lit(1L))) -
          aggregate(col("cs"), lit(0L),
            (acc, c) => acc + c.cast("long") * q(c.cast("long")))).as("entropy_qn"))
  }

  /** DuckDB twin of [[tokenEntropy]] (CTE chain; the oracle explodes and
    * groups where Spark stays in the scan stage — correctness, not plan
    * shape, is the oracle's job). */
  def tokenEntropySql(tokensSql: String): String = {
    val P = graft.functions.PortableMath
    def flq(ln: String) = s"CAST(floor(($ln) * 1.0E9 + 0.5E0) AS BIGINT)"
    s"""toks AS MATERIALIZED (
       |  SELECT doc_id, $tokensSql AS ts FROM documents
       |), base AS (
       |  SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
       |    CAST(len(list_distinct(ts)) AS BIGINT) AS n_types FROM toks
       |), ex AS (
       |  SELECT doc_id, unnest(ts) AS tok FROM toks
       |), cnt AS (
       |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM ex GROUP BY doc_id, tok
       |), c1 AS (
       |  SELECT doc_id, c, ${P.mWideSql("c")} AS m, ${P.biasWideSql("c")} AS b FROM cnt
       |), c2 AS (
       |  SELECT doc_id, c, ${P.zSql("m")} AS z, b FROM c1
       |), c3 AS (
       |  SELECT doc_id, c, z, (z * z) AS zz, b FROM c2
       |), csum AS (
       |  SELECT doc_id, CAST(sum(c * ${flq(P.lnFromPartsSql("z", "zz", "b"))}) AS BIGINT) AS s
       |  FROM c3 GROUP BY doc_id
       |), n1 AS (
       |  SELECT doc_id, n_tokens, n_types, greatest(n_tokens, 1) AS x FROM base
       |), n2 AS (
       |  SELECT doc_id, n_tokens, n_types, ${P.mWideSql("x")} AS m, ${P.biasWideSql("x")} AS b FROM n1
       |), n3 AS (
       |  SELECT doc_id, n_tokens, n_types, ${P.zSql("m")} AS z, b FROM n2
       |), n4 AS (
       |  SELECT doc_id, n_tokens, n_types, z, (z * z) AS zz, b FROM n3
       |), nq AS (
       |  SELECT doc_id, n_tokens, n_types,
       |    n_tokens * ${flq(P.lnFromPartsSql("z", "zz", "b"))} AS nn FROM n4
       |), ent AS (
       |  SELECT n.doc_id, n.n_tokens, n.n_types,
       |    n.nn - coalesce(c.s, 0) AS entropy_qn
       |  FROM nq n LEFT JOIN csum c USING (doc_id)
       |)""".stripMargin
  }

  /** TF-IDF top-`k` keyword extraction per document — the tagging /
    * routing / topic-sketch primitive every corpus curation stack keeps
    * next to BM25 (same idf statistics, per-DOC ranking instead of a
    * fixed query).
    *
    * Exact integer contract: idf_q(t) = floor((lnWide(N) − lnWide(df_t))
    * ·10⁹ + ½) nano-nats (the wide-chain bias cancels in the difference;
    * df_t ≤ N keeps it ≥ 0), score_q = tf(d,t)·idf_q(t) — exact longs,
    * ranked by the (score_q desc, term asc) total order so ties are
    * deterministic.
    *
    * Plan shape (100 TB story): ONE tokenization pass — (id, term) rows
    * reduce to per-doc tf, and the document frequency rides a
    * count-over-window ON THE TF ROWS partitioned by term (round 19: the
    * groupBy-then-join-back formulation duplicated the whole
    * scan→explode→aggregate subtree on both join sides — two corpus
    * tokenizations and an extra exchange; the window form is the
    * dupPassages one-shuffle shape). The idf ln-chain runs per posting
    * row instead of per distinct term — pure codegen arithmetic, far
    * cheaper than a second corpus pass. The top-k rank is row_number ≤ k,
    * which Spark rewrites to a per-partition WindowGroupLimit — no global
    * sort, no driver funnel. N is a one-row broadcast like
    * [[bm25Scores]]'s stats.
    *
    * @return (doc_id, rank, term, score_q) — k rows per doc with ≥ k
    *         distinct terms, rank 1 = top keyword */
  def tfidfKeywords(df: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, k: Int = 3): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    def lnChain(d: org.apache.spark.sql.DataFrame, x: Column, out: String)
        : org.apache.spark.sql.DataFrame =
      // kernel form of the wide portable-ln chain (bit-identical twin of
      // the oracle's SQL macro; PortableMathSpec pins the equivalence)
      d.withColumn(out, graft.functions.PortableLn.wide(x.cast("long")))
    val tf = df.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val wT = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
    val nDocs = df.agg(count(lit(1)).cast("long").as("n_docs"))
    val scored = lnChain(lnChain(
        tf.withColumn("dft", count(lit(1)).over(wT))
          .crossJoin(broadcast(nDocs)),
        col("n_docs"), "__lnN"), col("dft"), "__lnD")
      .withColumn("idf_q",
        expr("CAST(floor((__lnN - __lnD) * 1.0E9 + 0.5E0) AS BIGINT)"))
      .withColumn("score_q", col("tf") * col("idf_q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score_q").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("score_q"))
  }

  /** Token skip-gram corpus over documents — the text twin of
    * [[graft.ops.Graph.walkSkipGrams]]: directional (center, context)
    * token pairs within `window` positions, multiplicity summed over the
    * corpus. Feeds [[graft.ops.Graph.walkPpmi]] (which is input-agnostic:
    * marginals + the four-term ln chain work on any (center, context,
    * cnt) frame) for classic distributional word features.
    *
    * Plan shape (100 TB story): pairs are generated IN THE SCAN STAGE by
    * array lambdas over each doc's token array (per-doc cost n·2w) and
    * reduced by one aggregation — no positions self-join, so the only
    * exchange carries the map-side-combined (center, context, cnt)
    * rows, never documents or position lists.
    *
    * @return (center, context, cnt), center/context strings */
  def tokenSkipGrams(df: org.apache.spark.sql.DataFrame,
                     textCol: String, window: Int): org.apache.spark.sql.DataFrame = {
    require(window >= 1 && window <= 16, s"bad window: $window")
    val t = col("__ts")
    val n = size(t)
    val pairs = flatten(transform(sequence(lit(1), n), i =>
      transform(
        filter(sequence(greatest(i - window, lit(1)), least(i + window, n)),
          j => j =!= i),
        j => struct(element_at(t, i).as("center"),
          element_at(t, j).as("context")))))
    df.select(tokens(col(textCol)).as("__ts"))
      .where(n >= 2)
      .select(explode(pairs).as("pr"))
      .select(col("pr.center").as("center"), col("pr.context").as("context"))
      .groupBy(col("center"), col("context"))
      .agg(count(lit(1)).cast("long").as("cnt"))
  }

  /** DuckDB twin of [[tokenSkipGrams]]: positions via zipped unnests,
    * pairing as a per-doc position join (correctness, not plan shape, is
    * the oracle's job). Terminal CTE `sg` — composes with
    * [[graft.ops.Graph.walkPpmiSql]] exactly like the walk corpus. */
  def tokenSkipGramsSql(tokensSql: String, window: Int): String =
    s"""ptoks AS MATERIALIZED (
       |  SELECT doc_id, $tokensSql AS ts FROM documents
       |), pex AS MATERIALIZED (
       |  SELECT doc_id, unnest(ts) AS term,
       |    unnest(range(1, len(ts) + 1)) AS pos
       |  FROM ptoks WHERE len(ts) >= 2
       |), sg AS (
       |  SELECT a.term AS center, b.term AS context,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM pex a JOIN pex b ON a.doc_id = b.doc_id
       |    AND a.pos <> b.pos AND abs(a.pos - b.pos) <= $window
       |  GROUP BY 1, 2
       |)""".stripMargin

  /** DuckDB twin of [[tfidfKeywords]]: same tf/df/N statistics, same
    * portable-ln difference, same quantization, same rank order. */
  def tfidfKeywordsSql(tokensSql: String, k: Int): String = {
    val P = graft.functions.PortableMath
    s"""ex AS MATERIALIZED (
       |  SELECT doc_id, unnest($tokensSql) AS term FROM documents
       |), tf AS MATERIALIZED (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM ex GROUP BY doc_id, term
       |), dft AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS dft FROM tf GROUP BY term
       |), nd AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
       |), i1 AS (
       |  SELECT term, ${P.mWideSql("n_docs")} AS mn, ${P.biasWideSql("n_docs")} AS bn,
       |    ${P.mWideSql("dft")} AS md, ${P.biasWideSql("dft")} AS bd
       |  FROM dft CROSS JOIN nd
       |), i2 AS (
       |  SELECT term, ${P.zSql("mn")} AS zn, bn, ${P.zSql("md")} AS zd, bd FROM i1
       |), i3 AS (
       |  SELECT term, zn, (zn * zn) AS zzn, bn, zd, (zd * zd) AS zzd, bd FROM i2
       |), idf AS MATERIALIZED (
       |  SELECT term, CAST(floor((${P.lnFromPartsSql("zn", "zzn", "bn")}
       |    - ${P.lnFromPartsSql("zd", "zzd", "bd")}) * 1.0E9 + 0.5E0) AS BIGINT) AS idf_q
       |  FROM i3
       |), scored AS (
       |  SELECT t.doc_id, t.term, t.tf * i.idf_q AS score_q,
       |    row_number() OVER (PARTITION BY t.doc_id
       |      ORDER BY t.tf * i.idf_q DESC, t.term) AS rnk
       |  FROM tf t JOIN idf i USING (term)
       |), kw AS (
       |  SELECT doc_id, CAST(rnk AS BIGINT) AS rank, term, score_q
       |  FROM scored WHERE rnk <= $k
       |)""".stripMargin
  }

  def keepLineSql(l: String, minWords: Int, maxDigitRatio: Double): String =
    s"""(len(list_filter(regexp_split_to_array(trim($l), '\\s+'), t -> t <> '')) >= $minWords
       | AND (CASE WHEN length(regexp_replace($l, '\\s', '', 'g')) = 0 THEN 1.0
       |       ELSE CAST(length(regexp_replace($l, '[^0-9]', '', 'g')) AS DOUBLE)
       |            / length(regexp_replace($l, '\\s', '', 'g')) END) <= $maxDigitRatio)"""
      .stripMargin.replace("\n", " ")

  /** [[cleanLines]] as DuckDB SQL over document expression `expr`. */
  def cleanLinesSql(expr: String, minWords: Int = 3,
                    maxDigitRatio: Double = 0.5): String =
    s"array_to_string(list_filter(string_split($expr, chr(10)), " +
      s"l -> ${keepLineSql("l", minWords, maxDigitRatio)}), chr(10))"
}
