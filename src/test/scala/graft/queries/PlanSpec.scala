package graft.queries

import graft.SparkSpec

/** Physical-plan assertions: the properties that make these queries hold
  * at 100× data are pinned here, not just eyeballed — filter/column
  * pushdown reaching the parquet scan, broadcasts only on genuinely-small
  * dims, exchange reuse on self-joins, and codegen coverage.
  */
class PlanSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** Input column lists of every KEYED exchange (hash/range/single) in a
    * formatted plan. The fixture loader's round-robin parallelism floor
    * (Tables.adaptiveRebalance) is excluded by partitioning kind: it
    * re-splits the raw input once at fixture scale and disappears at
    * production split counts, so the scale property these pins protect —
    * what crosses a KEYED shuffle as part of the operator's dataflow —
    * is asserted over keyed exchanges only. */
  private def keyedExchangeInputs(fmt: String): Seq[String] =
    "(?s)\\(\\d+\\) Exchange\\s*\\nInput \\[\\d+\\]: \\[([^\\]]*)\\]\\s*\\nArguments: ([^\\n]*)".r
      .findAllMatchIn(fmt)
      .filter(m => !m.group(2).contains("RoundRobinPartitioning"))
      .map(_.group(1)).toSeq

  private def plan(name: String): String = {
    val df = Registry.all(name).build(spark, sf)
    df.collect() // materialize so AQE finalizes the plan (broadcast/reuse decisions)
    df.queryExecution.executedPlan.toString
  }

  test("q6 filter+agg: predicates are pushed into the parquet scan") {
    val p = plan("q6_filter_agg")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
      "expected non-empty pushed filters:\n" + p)
  }

  test("q1 agg: scan reads only the projected columns") {
    val p = plan("q1_agg")
    // lineitem has 16 columns; the aggregation needs far fewer
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(readSchema.nonEmpty, p)
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_shipmode"),
      s"scan is not column-pruned: $readSchema")
  }

  test("q5 multijoin: broadcast HINTS only on the three fixed-size dims") {
    // At test scale AQE may broadcast everything (correct, size-based);
    // the scale invariant is that only supplier/nation/region carry
    // EXPLICIT hints — customer/orders/lineitem grow with SF and must be
    // left to AQE (round-1 verdict: broadcast(customer) was the bug).
    val df = Registry.all("q5_multijoin").build(spark, sf)
    val lp = df.queryExecution.optimizedPlan.toString
    val hinted = "strategy=broadcast".r.findAllIn(lp).size
    assert(hinted === 3, s"expected exactly 3 broadcast hints, got $hinted:\n$lp")
    val p = plan("q5_multijoin")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("decontaminate: benchmark side broadcasts; corpus shingles never shuffle") {
    val df = Registry.all("dedup_decontaminate").build(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the eval-set side (small by definition) must broadcast into a
    // LEFT SEMI probe against the corpus scan — a shuffled semi-join
    // would move the 100 TB side's shingles
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    // post-join exchanges carry (doc_id, doc_ngrams, partial count) —
    // never document text (formatted mode lists each Exchange's inputs)
    val fmt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchangeInputs = keyedExchangeInputs(fmt)
    assert(exchangeInputs.nonEmpty, fmt)
    assert(exchangeInputs.forall(!_.contains("text#")),
      "no exchange may carry document text:\n" + fmt)
    // shingle hashes may shuffle only on the BENCHMARK side (its
    // distinct — small by definition); a corpus-side row is recognizable
    // by its doc_id/doc_ngrams payload
    assert(exchangeInputs.filter(_.contains("hs#"))
        .forall(in => !in.contains("doc_id#") && !in.contains("doc_ngrams#")),
      "corpus-side shingles must never shuffle:\n" + fmt)
  }

  test("passage probe: probe shingles broadcast; postings never shuffle text") {
    val df = Registry.all("dedup_passage_probe").build(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the passage's handful of shingles broadcasts into the alignment
    // join — a shuffled join would move the index side's postings
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      "the alignment join must broadcast the probe side:\n" + p)
    // exchanges carry alignment tuples (doc_id/anchor/counts) — never
    // text, shingle strings, or positions-with-text
    val fmt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchangeInputs = keyedExchangeInputs(fmt)
    assert(exchangeInputs.forall(in => !in.contains("text#") && !in.contains("sh#")),
      "no exchange may carry text or shingle strings:\n" + fmt)
  }

  test("theta overlap: map-side partial sketch; exchanges never carry hashes or shingles") {
    import org.apache.spark.sql.functions.{col, explode}
    // kmvPairwise materializes the sketch relation (localCheckpoint — the
    // maxSets guard + run-the-agg-once contract), so the sketch plan is
    // pinned at the aggregation stage, where the exchange payload bound
    // actually lives
    val hashed = graft.Tables.documents(spark, sf)
      .select(col("source"), graft.ops.TextAnalysis.tokens(col("text")).as("ts"))
      .select(col("source"),
        explode(graft.functions.ShingleHashes.of(col("ts"), 3, "kmv")).as("h"))
    val sk = graft.ops.Sketches.kmvSketches(hashed, "source", col("h"), 64)
    sk.collect()
    val p = sk.queryExecution.executedPlan.toString
    // the KMV aggregate must run a PARTIAL pass in the scan stage so the
    // exchange carries ≤ k longs per (set, partition) — a final-only agg
    // would shuffle every shingle hash in the corpus
    assert(p.contains("partial_kminhash"),
      "expected a map-side partial kminhash:\n" + p)
    val fmt = sk.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchangeInputs = keyedExchangeInputs(fmt)
    assert(exchangeInputs.nonEmpty, fmt)
    // exchanges may carry (set, sketch buffer) — never the per-shingle
    // hash column or document text
    assert(exchangeInputs.forall(in => !in.contains("h#") && !in.contains("text#")),
      "exchanges must carry sketches, not raw hashes or text:\n" + fmt)
    // and the full query still runs end to end on top of the
    // checkpointed sketch relation
    val df = Registry.all("sketch_theta_overlap").build(spark, sf)
    assert(df.collect().nonEmpty)
  }

  test("ngram jaccard: the exploded self-join reuses one exchange") {
    val p = plan("dedup_ngram_jaccard")
    assert(p.contains("ReusedExchange"),
      "self-join should compute the explode+shuffle once:\n" + p)
  }

  test("minhash LSH: the banded candidate self-join reuses one exchange") {
    // Since the signature moved into the scan stage (MinHashSig kernel)
    // there is no upstream agg shuffle, and at TEST scale AQE broadcasts
    // the tiny band side — which plans the banded subplan twice. At data
    // scale the join shuffles both sides, and those exchanges are
    // identical; pin that shape by disabling auto-broadcast here.
    val p = withoutAutoBroadcast(plan("dedup_minhash_lsh"))
    assert(p.contains("ReusedExchange"),
      "band self-join should compute the signature+explode+shuffle once:\n" + p)
  }

  /** Run `body` with auto-broadcast off, restoring BOTH conf keys to their
    * prior value (set-or-unset) — the shared JVM-wide test session must not
    * leak conf mutations into later suites. */
  private def withoutAutoBroadcast[A](body: => A): A = {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val old = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "-1"))
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("embedding near-dup: candidate exchanges carry ids and signatures, never vectors") {
    // module rule 1 for the vector case: the multiprobe candidate join
    // must move (id, sig/psig) rows only; the 64-float payload joins back
    // AFTER dropDuplicates, once per side. With auto-broadcast off (data
    // scale), every signature-keyed exchange must be vector-free (the
    // vector twin of the "digests not text" test above).
    val p = withoutAutoBroadcast {
      val df = Registry.all("dedup_embedding").build(spark, sf)
      df.collect()
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    }
    // formatted mode lists each Exchange with its full Input column list
    val exchangeInputs = keyedExchangeInputs(p)
    assert(exchangeInputs.nonEmpty, p)
    val sigExchanges = exchangeInputs.filter(in => in.contains("sig#") || in.contains("psig#"))
    assert(sigExchanges.nonEmpty, "expected candidate-side exchanges:\n" + p)
    assert(sigExchanges.forall(in => !in.contains("v#") && !in.contains("v_a#") && !in.contains("v_b#")),
      "candidate generation must not shuffle vector payloads:\n" + p)
  }

  test("semantic dedup: candidate exchanges carry ids and cells, never vectors") {
    // the within-cell self-join must move (id, cell) rows only; vectors
    // join back per side for the cosine verify (the embeddingNearDups
    // rule with cluster cells instead of probe signatures)
    val p = withoutAutoBroadcast {
      val emb = graft.Tables.embeddings(spark, sf)
      val cents = graft.ops.Similarity.trainIvfCentroids(emb, "vec_id", "embedding",
        numCentroids = 4, iters = 1)
      val df = graft.ops.Dedup.semanticPairs(emb, "vec_id", "embedding",
        cents, org.apache.spark.sql.functions.lit(0.3))
      df.collect()
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    }
    val exchangeInputs = keyedExchangeInputs(p)
    assert(exchangeInputs.nonEmpty, p)
    val cellExchanges = exchangeInputs.filter(_.contains("cell#"))
    assert(cellExchanges.nonEmpty, "expected cell-keyed candidate exchanges:\n" + p)
    assert(cellExchanges.forall(in => !in.contains("v#") && !in.contains("v_a#") && !in.contains("v_b#")),
      "candidate generation must not shuffle vector payloads:\n" + p)
  }

  test("cms sketch: exchanges carry partial counter buffers, never items") {
    // the sketch aggregation must move partial counter sums only — the
    // token strings stay in the scan stage (module rule: digests/ints in
    // exchanges, payloads never). Two exchanges total: the sketch agg and
    // the presentation orderBy.
    val df = Registry.all("sketch_cms_counts").build(spark, sf)
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchangeInputs = keyedExchangeInputs(p)
    assert(exchangeInputs.nonEmpty, p)
    assert(exchangeInputs.forall(in => !in.contains("it#") && !in.contains("text#")),
      "the sketch shuffles must not carry token payloads:\n" + p)
    assert(exchangeInputs.exists(_.contains("sum#")),
      "expected the partial-sum aggregation exchange:\n" + p)
  }

  test("zipf regime rows: both joins consume the MATERIALIZED corpus scan") {
    // ZipfCorpus.table writes the generated corpus to scratch parquet
    // once per JVM; the brute/prefix joins must plan as parquet scans —
    // an unmaterialized generator would re-run the md5 expression tree
    // per consumer (the prefix join scans its input four times) and the
    // bench would measure hashing, not the join regime.
    Seq("dedup_zipf_brute", "dedup_zipf_prefix").foreach { name =>
      val df = Registry.all(name).build(spark, sf)
      val p = df.queryExecution.executedPlan.toString
      // the prefix join additionally checkpoints its exploded shingle
      // frame (hash once, four consumers — round 19), so its plan reads
      // the materialized RDD instead of the corpus parquet directly; the
      // brute join still scans the scratch parquet. Either way the
      // generation expression must never inline.
      if (name == "dedup_zipf_prefix")
        assert(p.contains("Scan ExistingRDD"),
          s"$name must consume the checkpointed shingle frame:\n$p")
      else assert(p.contains("zipf-corpus"),
        s"$name must scan the materialized corpus parquet:\n$p")
      assert(!p.contains("sequence(0, 59"),
        s"$name must not inline the token-generation expression:\n$p")
      // exact-Jaccard machinery stays equi-join (no cross product sneaks
      // in through the size-ratio prune conditions)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name joins must stay hash-keyed:\n$p")
    }
  }

  test("contamination scan broadcasts the probe side, never shuffles the corpus") {
    val p = plan("text_contamination")
    assert(p.contains("BroadcastHashJoin"),
      "probe shingles must broadcast:\n" + p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the corpus side must not shuffle into the join:\n" + p)
  }

  test("dedup_exact shuffles digests, not text") {
    val p = plan("dedup_exact")
    val exchanges = "Exchange hashpartitioning\\(([^,]+)".r.findAllMatchIn(p).toSeq
    assert(exchanges.nonEmpty, p)
    assert(exchanges.forall(m => !m.group(1).contains("text")),
      "dedup must never shuffle the text column:\n" + p)
  }

  test("hash kernels ride the scan stage: codegen'd exprs present, interpreted HOFs absent") {
    // the ~50× kernels must not silently regress to interpreted
    // transform/aggregate formulations
    val simhash = plan("dedup_simhash")
    assert(simhash.contains("simhash_sig"), simhash)
    val minhash = plan("dedup_minhash_lsh")
    assert(minhash.contains("minhash_sig") && minhash.contains("shingle_hashes"), minhash)
  }

  test("bloom decontamination: sketch screens inside the scan, corpus never broadcast-joins whole") {
    val p = plan("text_decontaminate_bloom")
    // the clean branch is a scan + might_contain filter; only the
    // suspected slice reaches the exact anti-join
    assert(p.contains("might_contain"), p)
    assert(p.contains("Union"), p)
  }

  test("text_quality: single-stage scan, no shuffle at all") {
    val p = plan("text_quality")
    assert(!p.contains("Exchange hashpartitioning"),
      "text scoring must stay inside the scan stage:\n" + p)
  }

  test("sketch_hll_distinct: item strings stay in the scan; exchanges carry register rows") {
    val df = Registry.all("sketch_hll_distinct").build(spark, sf)
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchangeInputs = keyedExchangeInputs(p)
    assert(exchangeInputs.nonEmpty, p)
    assert(exchangeInputs.forall(in => !in.contains("it#") && !in.contains("text#")),
      "raw items must reduce to (group, reg, rank) before any exchange:\n" + p)
  }

  test("dedup_edit_distance: bucket blocking plans an equi-join, not a cross product") {
    val p = plan("dedup_edit_distance")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the length-bucket join must be an equi-join:\n" + p)
  }

  test("pack_sequences: one offset window + one (shard, seq) aggregation — two shuffles") {
    val p = plan("pack_sequences")
    val n = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(n <= 3, s"expected the window + pack aggregation (+ ids join) only, found $n:\n$p")
  }

  test("sample_shuffle: distributed rank, never a single-partition global window") {
    val p = plan("sample_shuffle")
    assert(!p.contains("Exchange SinglePartition"),
      "the epoch shuffle must rank via bucket windows, not one global window:\n" + p)
    assert(p.contains("Exchange hashpartitioning"), p)
  }

  test("text_nb_classify: scoring is scan-stage folds, no shuffle") {
    val p = plan("text_nb_classify")
    assert(!p.contains("Exchange hashpartitioning"),
      "NB scoring must fold literal cost maps inside the scan stage:\n" + p)
  }

  test("text_gopher: structural gate stays inside the scan stage, no shuffle") {
    val p = plan("text_gopher")
    assert(!p.contains("Exchange hashpartitioning"),
      "the Gopher filters must stay scan-stage expressions:\n" + p)
  }

  test("top-k queries plan TakeOrderedAndProject or partial top-k, not global sort") {
    val p = plan("q2_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("bm25: one-row stats broadcast back, corpus never shuffles") {
    val p = plan("text_bm25")
    // the stats side joins via a broadcast nested-loop cross join (one
    // row); the corpus side must reach scoring without any repartitioning
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("Exchange hashpartitioning"),
      "bm25 scoring must not shuffle the corpus:\n" + p)
  }

  test("dup passages: exchanges carry window digests and ids, never text") {
    val df = Registry.all("text_dup_passages").build(spark, sf)
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchangeInputs = keyedExchangeInputs(p)
    assert(exchangeInputs.nonEmpty, p)
    assert(exchangeInputs.forall(cols => !cols.contains("text")),
      "window text must never cross an exchange:\n" + p)
  }

  test("report_corpus: the dup window shuffles digests, never text") {
    val df = Registry.all("report_corpus").build(spark, sf)
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchangeInputs = keyedExchangeInputs(p)
    assert(exchangeInputs.nonEmpty, p)
    assert(exchangeInputs.forall(cols => !cols.contains("text")),
      "document text must never cross an exchange:\n" + p)
  }

  test("sample_percentile: returned plan is broadcast-join + filter, no domain window") {
    // the round-6 scale fix: the per-domain rank window (one task per
    // domain at 100 TB) must be gone from the RETURNED plan — the cutoff
    // is found eagerly by distributed selection and applied as a
    // broadcast-joined scan predicate
    val p = plan("sample_percentile")
    assert(!p.contains("Window"),
      "no rank window may remain in the gate's plan:\n" + p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the corpus must not shuffle into the cutoff join:\n" + p)
  }

  test("tokenizer queries ride the scan stage: bpe kernel present, no hash exchange") {
    // the whole point of the map-literal / kernel design: encoding shuffles
    // nothing — the only exchange is the oracle-ordering range sort
    val p = plan("text_bpe_encode")
    assert(p.contains("bpe_encode"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    val ids = plan("text_bpe_ids")
    assert(ids.contains("bpe_encode"), ids)
    assert(!ids.contains("Exchange hashpartitioning"), ids)
    val enc = plan("text_encode_ids")
    assert(!enc.contains("Exchange hashpartitioning"),
      "vocab application must be a scan-stage map literal, not a join:\n" + enc)
  }

  test("pipeline_pretrain: LM + BPE kernels in the scan, exactly one corpus hash shuffle") {
    val p = plan("pipeline_pretrain")
    assert(p.contains("lm_nll_q6") && p.contains("bpe_encode"),
      "scoring/encoding must ride the scan stage as kernels:\n" + p)
    // count only the FINAL adaptive plan — toString appends an
    // "== Initial Plan ==" section that repeats the same exchange
    val finalPlan = p.split("== Initial Plan ==").head
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan).size
    assert(hashExchanges === 1,
      s"the recipe promises ONE corpus shuffle (the per-shard pack window), found $hashExchanges:\n" + finalPlan)
  }

  test("uniformK: constant-k rank filter gets WindowGroupLimit pushdown") {
    // rk <= k with LITERAL k lets Spark drop all but k rows per group in
    // the partial (map-side) phase — the property that keeps per-group
    // sampling safe when one group dominates a partition. (This is
    // exactly what percentileGate's per-domain FRACTION bound cannot
    // get, which is why it uses distributed cutoff selection instead.)
    val p = plan("sample_uniform_k")
    assert(p.contains("WindowGroupLimit"),
      "constant-k rank must push down as a group limit:\n" + p)
  }

  test("zorder key is a codegen'd scan-stage expression") {
    val p = plan("q21_zorder_key")
    assert(p.contains("zvalue"), p)
    // ordering for the oracle is the only sort; no hash shuffle needed
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("hilbert key is a codegen'd scan-stage expression") {
    val p = plan("q23_hilbert_key")
    assert(p.contains("hilbert_value"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("graph_pagerank: no cartesian product; only the one-row scalar nests") {
    val p = plan("graph_pagerank")
    assert(!p.contains("CartesianProduct"),
      "rank iterations must join on keys; the node-count stitch must " +
        "broadcast its single row:\n" + p)
  }

  test("text_card_mask: Luhn masking stays inside the scan stage, no shuffle") {
    val p = plan("text_card_mask")
    assert(!p.contains("Exchange hashpartitioning"),
      "candidate extraction + checksum + fold are per-row work:\n" + p)
  }

  test("dedup_minhash_sql: the SQL surface plans the same banded self-join reuse") {
    val p = withoutAutoBroadcast(plan("dedup_minhash_sql"))
    assert(p.contains("ReusedExchange"),
      "graft_* SQL functions must resolve to the kernel plan, including " +
        "exchange reuse on the banded self-join:\n" + p)
    assert(p.contains("minhash_sig") && p.contains("band_buckets"), p)
  }

  test("unigram encode: zero exchanges — segmentation is pure scan-stage work") {
    val df = graft.Tables.documents(spark, sf).select(
      graft.functions.UnigramEncode.of(
        graft.ops.TextAnalysis.tokens(org.apache.spark.sql.functions.col("text")),
        TextQueries.UnigramFixtureVocab, 5000000L))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // keyed-exchange-free: the loader's round-robin parallelism floor is
    // not operator dataflow (see keyedExchangeInputs)
    assert(!p.contains("Exchange hashpartitioning") &&
        !p.contains("Exchange rangepartitioning") &&
        !p.contains("Exchange SinglePartition"),
      "Viterbi segmentation must not shuffle anything:\n" + p)
    assert(p.toLowerCase.contains("unigram_encode"), p)
  }

  test("dsir: exchanges carry ids/buckets/weights — document text never shuffles") {
    val df = Registry.all("sample_dsir").build(spark, sf)
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchangeInputs = keyedExchangeInputs(p)
    assert(exchangeInputs.nonEmpty, p)
    assert(exchangeInputs.forall(in => !in.contains("text#") && !in.contains("tok#")),
      "DSIR exchanges must carry bucket ids and counts, never text/tokens:\n" + p)
  }

  test("pipeline_select: no exchange carries the text column end-to-end") {
    // LM gate scores in the scan stage; DSIR reduces to (id, bucket)
    // longs; the 100 selected ids broadcast; mixture rates broadcast;
    // packing shuffles (shard, id, n_tokens). The corpus text itself
    // must cross ZERO exchanges — the property that lets the recipe run
    // at 100 TB with one id-sized shuffle per stage.
    val df = Registry.all("pipeline_select").build(spark, sf)
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchangeInputs = keyedExchangeInputs(p)
    assert(exchangeInputs.nonEmpty, p)
    assert(exchangeInputs.forall(in => !in.contains("text#") && !in.contains("ts#")),
      "pipeline_select exchanges must carry ids/counts, never text/tokens:\n" + p)
  }

  test("removeDupSpans: the document frame itself never shuffles") {
    // the dup-starts side exchanges (id, pos, h) rows; the doc-side scan
    // joins those back without an exchange of its own (broadcast at this
    // scale, SMJ beyond — either way the TEXT column moves zero times
    // before the reassembly projection)
    val df = graft.ops.Dedup.removeDupSpans(
      graft.Tables.documents(spark, sf), "doc_id", "text", windowN = 6)
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchangeInputs = keyedExchangeInputs(p)
    assert(exchangeInputs.nonEmpty, p)
    assert(exchangeInputs.forall(in => !in.contains("ts#") && !in.contains("clean_text#")),
      "span removal must shuffle positions/hashes only, never token arrays:\n" + p)
  }

  test("perceptual near-dup (image + audio): payload bytes never shuffle") {
    // the 100 TB claim of both mm_*_neardup queries: decode happens in
    // the scan-side mapPartitions, and from there only (id, band) rows
    // block and (id, 64-bit hash) pairs verify — media payloads and
    // pixel buffers must appear in NO exchange
    Seq("mm_dhash_neardup", "mm_audio_fp_neardup").foreach { name =>
      val df = Registry.all(name).build(spark, sf)
      df.collect()
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val exchangeInputs = keyedExchangeInputs(p)
      assert(exchangeInputs.nonEmpty, s"$name:\n$p")
      assert(exchangeInputs.forall(in =>
        !in.contains("bytes#") && !in.contains("pixels#")),
        s"$name exchanges must carry ids/bands/hashes, never payloads:\n$p")
    }
  }

  test("graph_triangles: exchanges carry long triples only, never wider rows") {
    val df = Registry.all("graph_triangles").build(spark, sf)
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchangeInputs = keyedExchangeInputs(p)
    assert(exchangeInputs.nonEmpty, p)
    // widest shuffled row is the 3-column wedge/orientation frame
    assert(exchangeInputs.forall(_.split(",").length <= 3),
      "triangle exchanges must stay at most (long, long, long):\n" + p)
  }

  test("graph_ball2: register propagation shuffles (node, reg, r) triples only") {
    val df = Registry.all("graph_ball2").build(spark, sf)
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // exchanges in the (checkpoint-truncated) final stage: the 64-wide
    // register pivot and the output sort. The HyperBall contract is that
    // WIDE rows exist only KEYED/ORDERED BY node — one row per node,
    // |V|-bounded — while anything edge-proportional stays a (node, reg,
    // r) triple; a wide exchange keyed on anything else (or an
    // edge-join of pivoted rows) breaks the bound at 100 TB.
    val blocks = "(?s)\\(\\d+\\) Exchange\\s*\\nInput \\[\\d+\\]: \\[([^\\]]*)\\].*?Arguments: ([^\\n]*)".r
      .findAllMatchIn(p).map(m => (m.group(1), m.group(2))).toSeq
    assert(blocks.nonEmpty, p)
    blocks.foreach { case (input, args) =>
      val wide = input.split(",").length > 3
      assert(!wide || args.contains("partitioning(node"),
        s"wide exchange must be node-keyed, got [$args] carrying [$input]:\n" + p)
    }
  }

  test("graph_linkpredict_aa: ln weights attach BEFORE the wedge fan-out; top-k is partial") {
    val df = Registry.all("graph_linkpredict_aa").build(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // distributed partial top-k, never a global sort of all candidates
    assert(p.contains("TakeOrderedAndProject"),
      "AA ranking must plan TakeOrderedAndProject:\n" + p)
    // the weight column is computed in a project under the degree
    // aggregate (scan side), not recomputed per wedge: the wedge join's
    // build side already carries `w`
    assert(!p.contains("CartesianProduct"), p)
  }

  test("randomWalks hop: adjacency probe is an equi-join on (m, idx) — no residual degree fan-out") {
    import org.apache.spark.sql.functions.{col, row_number, count, lit}
    import spark.implicits._
    // un-checkpointed hop plan (randomWalks itself truncates lineage per
    // hop, so the pin targets the package-private hop builder directly)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("m", "x")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("m")).orderBy(col("x"))
    val adj = edges.select(col("m"), col("x"),
      (row_number().over(w) - 1).cast("long").as("idx"))
      .withColumn("dx", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("x"))))
    val cur = Seq((10L, 1L, 2L), (11L, 3L, 3L)).toDF("walker", "cur", "d")
    val hop = graft.ops.Graph.hopJoin(cur, adj, "pin:1")
    hop.collect()
    val p = hop.queryExecution.executedPlan.toString
    // round-16 verdict: the coin condition must be a JOIN KEY, not a
    // residual filter — a residual probe materializes the walker node's
    // full adjacency (W·Σd²/Σd rows/hop on power-law graphs). The
    // adjacency join's key lists must therefore pair tgt with idx.
    val joinKeys = "(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) (\\[[^\\]]*\\]), (\\[[^\\]]*\\])".r
      .findAllMatchIn(p).map(m => m.group(1) + " " + m.group(2)).toSeq
    assert(joinKeys.exists(k => k.contains("tgt") && k.contains("idx")),
      "adjacency hop join must carry (cur,tgt)=(m,idx) equi-keys:\n" + p)
    // and no join may keep the coin as a residual: Spark prints residual
    // conditions as a trailing predicate on the join line
    val residual = "(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)[^\\n]*".r
      .findAllIn(p).toSeq
    assert(!residual.exists(l => l.contains("%") && l.contains("idx")),
      "coin must not be a residual join predicate:\n" + p)
  }

  test("text_entropy: zero exchanges — the whole signal is scan-stage work") {
    val df = graft.ops.TextAnalysis.tokenEntropy(
      graft.Tables.documents(spark, sf), "doc_id", "text")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning") &&
        !p.contains("Exchange rangepartitioning") &&
        !p.contains("Exchange SinglePartition"),
      "entropy must not shuffle anything — lnWideCol runs in the lambda:\n" + p)
  }

  test("dedup_url: one codegen'd kernel in the scan stage, one aggregate exchange") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"),
      TextQueries.rawUrl(col("doc_id"), col("source")).as("raw"))
    val df = graft.ops.Dedup.byUrl(docs, "doc_id", "raw")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head // AQE prints the plan twice
    assert(p.contains("url_canonicalize"),
      "canonicalization must be the single kernel expression:\n" + p)
    assert(!p.contains("regexp_replace"),
      "the regex-chain formulation must be gone from the hot path:\n" + p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1,
      s"URL dedup is scan + ONE keyed aggregate exchange, got $exchanges:\n" + p)
    assert(!p.contains("text#"),
      "the shuffle carries (canonical, partials), never document text:\n" + p)
  }

  test("sim_kcenter per-round state: min-distance update has no exchange") {
    import org.apache.spark.sql.functions._
    // the round's plan shape: checkpointed state -> filter -> least(dmin,
    // d2(qv, newest-center literal)) — all scan-stage; the only job-wide
    // movement is TakeOrdered's 1-row result
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.select(col("vec_id").cast("long").as("id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * lit(1048576.0) + lit(0.5)).cast("long")).as("qv"))
      .localCheckpoint(true)
    val lits = array((0 until 8).map(i => lit(i.toLong)): _*)
    val state = q.filter(col("id") =!= 0L)
      .withColumn("dmin", aggregate(
        zip_with(col("qv"), lits, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v))
    val p = state.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      "the k-center round update must be exchange-free:\n" + p)
  }

  test("text_keywords: rank filter gets WindowGroupLimit; text never shuffles") {
    val df = graft.ops.TextAnalysis.tfidfKeywords(
      graft.Tables.documents(spark, sf), "doc_id", "text", k = 3)
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("WindowGroupLimit"),
      "top-k per doc must push to a per-partition group limit:\n" + p)
    val exchangeInputs = keyedExchangeInputs(p)
    assert(exchangeInputs.nonEmpty, p)
    assert(exchangeInputs.forall(in => !in.contains("text#")),
      "keyword exchanges carry (id, term, counts) rows, never documents:\n" + p)
  }

  test("graph_ppmi: rank filter gets WindowGroupLimit") {
    val df = Registry.all("graph_ppmi").build(spark, sf)
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("WindowGroupLimit"),
      "top-k contexts per center must push to a per-partition group limit:\n" + p)
  }

  test("sketch_heavy_hitters: the CMS candidate filter runs BEFORE the keyed exchange") {
    val df = Registry.all("sketch_heavy_hitters").build(spark, sf)
    df.collect()
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the scale property: the long tail is dropped in the scan stage —
    // the Filter (least over broadcast-literal counters) must sit below
    // the first Exchange in the final plan, so only candidates shuffle
    val firstExchange = p.indexOf(") Exchange")
    val filterAt = "\\(\\d+\\) Filter".r.findAllMatchIn(p).map(_.start).toSeq
    assert(firstExchange > 0 && filterAt.nonEmpty, p)
    assert(filterAt.exists(_ > firstExchange),
      // formatted plans print leaves LAST: a filter printed after the
      // first exchange header is UPSTREAM of it in execution order
      "expected the candidate filter upstream of the keyed exchange:\n" + p)
    assert(p.contains("element_at"),
      "the estimate must be literal-array lookups, not a join:\n" + p)
  }
}
