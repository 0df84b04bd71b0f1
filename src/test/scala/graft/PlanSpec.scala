package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}

/** Physical-plan regression guards: the scale properties that were verified
  * by hand with .explain (SURVEY §4) are asserted here so a future refactor
  * can't silently lose them. These check plan SHAPE, not results — results
  * are the oracle's job.
  */
class PlanSpec extends SparkSpec {

  /** Shape assertions need the whole operator tree; AQE wraps finished
    * stages in QueryStageExec nodes that collect() can't see through, so
    * plan-shape tests run with AQE off (results are unaffected — the
    * oracle gate runs with AQE on).
    */
  /** Build AND execute inside the conf scope — QueryExecution reads the
    * session conf lazily at action time, so both must happen with AQE off.
    */
  private def executed(df: => DataFrame): SparkPlan =
    withPlanShapeConf()(executedPlan(df))

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sfDir)

  test("q_select_by_id_range: series AND time-range predicates reach the parquet scan") {
    val scan = executed(q("q_select_by_id_range"))
      .collectLeaves().collectFirst { case s: FileSourceScanExec => s }.get
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("EqualTo(user_id,7)"), s"series filter not pushed: $pushed")
    assert(pushed.contains("GreaterThanOrEqual(ts,"), s"range start not pushed: $pushed")
    assert(pushed.contains("LessThanOrEqual(ts,"), s"range end not pushed: $pushed")
  }

  test("q_scan_project: ReadSchema prunes to exactly the 3 selected columns") {
    val scan = executed(q("q_scan_project"))
      .collectLeaves().collectFirst { case s: FileSourceScanExec => s }.get
    val readSchema = scan.requiredSchema.fieldNames.toSet
    assert(readSchema === Set("l_orderkey", "l_linenumber", "l_extendedprice"),
      s"scan reads $readSchema")
  }

  test("q_orderby_limit plans as TakeOrderedAndProject (per-partition top-k, no global sort)") {
    val plan = executed(q("q_orderby_limit"))
    assert(plan.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      s"expected TakeOrderedAndProject in:\n$plan")
  }

  test("q_join_broadcast: both dimension joins are broadcast-hash, fact side never exchanged before the join") {
    val plan = executed(q("q_join_broadcast"))
    val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.length === 2, s"expected 2 broadcast joins, got ${bhj.length}")
    val bcasts = plan.collect { case b: BroadcastExchangeExec => b }
    assert(bcasts.nonEmpty)
  }

  test("q_join_shuffle: the pinned merge hint yields a sort-merge join") {
    val plan = executed(q("q_join_shuffle"))
    assert(plan.collect { case j: SortMergeJoinExec => j }.nonEmpty,
      s"expected SortMergeJoin in:\n$plan")
  }

  test("q_join_asof is a window pass: zero join operators of ANY kind in the plan") {
    import org.apache.spark.sql.execution.joins.{
      BaseJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
    val plan = executed(q("q_join_asof"))
    val joins = plan.collect {
      case j: BaseJoinExec => j // covers BHJ/SMJ/SHJ/BNLJ
      case j: CartesianProductExec => j
    }
    assert(joins.isEmpty, s"as-of must not plan a join, found ${joins.length}")
  }

  test("q_ts_outlier_mad: join-free — one scan, one series-key hash exchange") {
    // r18 rewrite: both rank-selected medians are window conditional
    // aggregates over ONE user_id exchange; the old shape's two median
    // frames re-joined and re-scanned events (4 scans, 2 joins)
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val plan = executed(q("q_ts_outlier_mad"))
    assert(plan.collect { case j: BaseJoinExec => j }.isEmpty,
      s"MAD must not plan a join:\n$plan")
    val scans = plan.collectLeaves().collect { case s: FileSourceScanExec => s }
    assert(scans.length === 1, s"events must scan exactly once, got ${scans.length}")
    val hashEx = plan.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
    }
    assert(hashEx.length === 1,
      s"exactly one series-key hash exchange expected, got ${hashEx.length}:\n$plan")
  }

  test("q_agg_hash: aggregation is two-phase (partial before the exchange)") {
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    val plan = executed(q("q_agg_hash"))
    val aggs = plan.collect { case a: HashAggregateExec => a }
    assert(aggs.length >= 2, s"expected partial+final HashAggregate, got ${aggs.length}")
  }

  test("q_dedup_exact: every exchange carries md5 digests, never document bodies") {
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = executed(q("q_dedup_exact"))
    // at 100 TB the exchange payload IS the cost: the group key must be the
    // 32-hex-char digest computed BEFORE the shuffle, not the raw text
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, "expected at least the aggregation exchange")
    exchanges.foreach { e =>
      assert(!e.output.map(_.name).contains("text"),
        s"exchange shuffles raw document text: ${e.output.map(_.name)}")
    }
    val aggs = plan.collect { case a: HashAggregateExec => a }
    assert(aggs.nonEmpty &&
      aggs.forall(_.groupingExpressions.forall(_.name == "text_md5")),
      s"grouping must be on the digest: ${aggs.map(_.groupingExpressions)}")
  }

  test("q_tpch_q6: all three predicates reach the parquet scan") {
    val scan = executed(q("q_tpch_q6"))
      .collectLeaves().collectFirst { case s: FileSourceScanExec => s }.get
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate,"), s"shipdate not pushed: $pushed")
    assert(pushed.contains("GreaterThanOrEqual(l_discount,0.05)"), s"discount not pushed: $pushed")
    assert(pushed.contains("LessThan(l_quantity,24"), s"quantity not pushed: $pushed")
  }

  test("q_text_contamination: eval shingle dictionary is broadcast, corpus side never shuffles before the join") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = executed(q("q_text_contamination"))
    val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, s"expected the eval-set join to broadcast:\n$plan")
    // the corpus (streamed) side of the broadcast join must be shuffle-free:
    // at 100 TB the whole point is that corpus shingles flow map-side only
    bhj.foreach { j =>
      // streamed side = the child with no BroadcastExchange in its subtree
      val streamed = j.children
        .filter(c => c.collect { case b: BroadcastExchangeExec => b }.isEmpty)
      assert(streamed.nonEmpty)
      val streamedShuffles =
        streamed.flatMap(_.collect { case e: ShuffleExchangeExec => e })
      assert(streamedShuffles.isEmpty,
        s"corpus side shuffles before the contamination join:\n$streamed")
    }
  }

  test("q_split_assign: content-hash split is a pure scan, zero exchanges") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // global ORDER BY at the end is allowed (presentation only) — assert no
    // exchange below the split projection by checking the plan has no
    // hash-partitioned shuffle (the sort's range exchange is the only one)
    val plan = executed(q("q_split_assign"))
    val hashExchanges = plan.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning
            .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] =>
        e
    }
    assert(hashExchanges.isEmpty,
      s"split assignment must not hash-shuffle: $hashExchanges")
  }

  test("q_tpch_q5 with broadcast forced off (100x-stats stand-in) plans sort-merge, no nested loops") {
    import org.apache.spark.sql.execution.joins.{
      BroadcastNestedLoopJoinExec, CartesianProductExec}
    // At 1000-executor scale the dimension tables may stop fitting the
    // broadcast threshold; the plan must then flip to sort-merge on every
    // join, never degrade to a nested-loop/cartesian path.
    val plan = withPlanShapeConf(disableBroadcast = true)(
      executedPlan(q("q_tpch_q5")))
    assert(plan.collect { case j: SortMergeJoinExec => j }.nonEmpty,
      s"expected SortMergeJoin under -1 broadcast threshold:\n$plan")
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.isEmpty,
      "broadcast joins must disappear when the threshold forbids them")
    val degenerate = plan.collect {
      case j: BroadcastNestedLoopJoinExec => j
      case c: CartesianProductExec => c
    }
    assert(degenerate.isEmpty, s"found non-equi fallback joins: $degenerate")
  }

  test("AQE skew-join splits a planted hot key (OptimizeSkewedJoin fires)") {
    // Establishes why q_join_salted's manual salt was retired in r19: for
    // a plain shuffled equi join AQE's runtime skew split handles the hot
    // key by itself (asserted here), so manual salting is only for the
    // cases AQE can't touch — skewed AGGREGATION keys and joins that must
    // keep a particular partitioning. Thresholds are lowered to make a
    // test-sized hot key cross the same code path a 100 TB hot key crosses
    // in production.
    import org.apache.spark.sql.functions.{col, lit}
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    try {
      // left: one pathological key (0) with 60k rows over a 100-key tail;
      // right: uniform 100 keys — the classic hot-fact⋈dim shuffle skew
      val left = spark.range(60000).select(lit(0L).as("k"), col("id").as("lv"))
        .union(spark.range(5000).select((col("id") % 100).as("k"), col("id").as("lv")))
      val right = spark.range(20000).select((col("id") % 100).as("k"), col("id").as("rv"))
      val joined = left.join(right, "k")
      // row count must be exact regardless of how the skew split replicates
      // partitions: 60000*200 (hot key) + 5000*200 (tail)
      assert(joined.count() === 60000L * 200 + 5000L * 200)
      // the executed plan nests the join inside (Result)QueryStageExec
      // leaves — collect across stage boundaries
      import org.apache.spark.sql.execution.adaptive.QueryStageExec
      def deepCollect(p: SparkPlan): Seq[SortMergeJoinExec] = {
        val here = p match { case j: SortMergeJoinExec => Seq(j); case _ => Nil }
        val kids = p.children ++ (p match {
          case q: QueryStageExec => Seq(q.plan)
          case _ => Nil
        })
        here ++ kids.flatMap(deepCollect)
      }
      val plan = executedPlan(joined)
      val smj = deepCollect(plan)
      assert(smj.nonEmpty, s"expected a sort-merge join:\n$plan")
      assert(smj.exists(_.isSkewJoin),
        s"OptimizeSkewedJoin did not fire on the planted hot key:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("q_tpch_q12: the two-year ship band reaches the lineitem scan; only the non-equi residual stays in the join") {
    val scans = executed(q("q_tpch_q12"))
      .collectLeaves().collect { case s: FileSourceScanExec => s }
    val li = scans.find(_.requiredSchema.fieldNames.contains("l_shipdate")).get
    val pushed = li.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate,"),
      s"band start not pushed: $pushed")
    assert(pushed.contains("LessThan(l_shipdate,"),
      s"band end not pushed: $pushed")
  }

  test("q_text_chunk: chunk explode is map-side only, zero hash exchanges") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // same contract as q_split_assign: the presentation sort's range
    // exchange is the only shuffle allowed — the chunk fan-out itself must
    // never move data
    val plan = executed(q("q_text_chunk"))
    val hashExchanges = plan.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning
            .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] =>
        e
    }
    assert(hashExchanges.isEmpty,
      s"chunking must not hash-shuffle: $hashExchanges")
  }

  test("q_tpch_q22: the 1-row average cut rides a broadcast, never a cartesian product") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val plan = executed(q("q_tpch_q22"))
    assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.nonEmpty,
      s"expected the (sum, n) cut as a broadcast nested-loop:\n$plan")
    assert(plan.collect { case j: CartesianProductExec => j }.isEmpty,
      "the scalar cut must never plan a cartesian product")
  }

  test("q_pipeline_rag_prep: no exchange carries chunk text or token arrays, only digests") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // chunk-grain version of the q_dedup_exact contract: the dedup
    // window's shuffle must move (ids, 16-byte digest, n_tokens) — the
    // chunk string and the parent token array must both die at the scan
    val plan = executed(q("q_pipeline_rag_prep"))
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, "expected the dedup-window exchange")
    exchanges.foreach { e =>
      val names = e.output.map(_.name)
      assert(!names.contains("chunk") && !names.contains("w") && !names.contains("text"),
        s"exchange shuffles chunk text: $names")
      e.output.foreach { a =>
        assert(!a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType],
          s"exchange shuffles a token array: ${a.name}")
      }
    }
  }

  test("q_dedup_incremental: both anti-join sides shuffle digests only, never text (broadcast off)") {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    // the non-broadcast decontamination tier: at 100 TB BOTH sides of the
    // anti join are large, so broadcast is forced OFF here — with it on,
    // test-sized data would broadcast the old-corpus side and this test
    // would never see the exchanges it exists to check. Every exchange
    // (and there must be a real shuffled anti join) carries digests; raw
    // document text dies at the two scans.
    val plan = withPlanShapeConf(disableBroadcast = true)(
      executedPlan(q("q_dedup_incremental")))
    val anti = plan.collect {
      case j: SortMergeJoinExec if j.joinType.toString == "LeftAnti" => j
    }
    assert(anti.nonEmpty, s"expected a shuffled LEFT ANTI join:\n$plan")
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, "expected the anti join's exchanges")
    exchanges.foreach { e =>
      assert(!e.output.map(_.name).contains("text"),
        s"exchange shuffles raw text: ${e.output.map(_.name)}")
    }
    assert(plan.collect { case b: BroadcastExchangeExec => b }.isEmpty)
  }

  test("q_dedup_substring: every exchange carries window digests, never text or token arrays") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = executed(q("q_dedup_substring"))
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty)
    exchanges.foreach { e =>
      val names = e.output.map(_.name)
      assert(!names.contains("text") && !names.contains("w"),
        s"exchange shuffles document text/tokens: $names")
    }
  }

  test("q_ts_xcorr / q_ts_acf: one bucket-aggregate exchange, lag joins all broadcast") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    for (name <- Seq("q_ts_xcorr", "q_ts_acf")) {
      val plan = executed(q(name))
      // the lag fan-out and x-y alignment must never shuffle-join: the
      // bucket frame is tiny and rides broadcasts
      assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty,
        s"$name plans a shuffle join for the lag alignment:\n$plan")
      assert(plan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
        s"$name: expected the broadcast alignment join")
    }
  }

  test("q_dedup_semantic: vectors cross exactly one exchange (the cell shuffle, reused by both join sides)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = executed(q("q_dedup_semantic"))
    val vecExchanges = plan.collect {
      case e: ShuffleExchangeExec if e.output.exists(_.name == "embedding") => e
    }
    assert(vecExchanges.length === 1,
      s"vectors must shuffle ONCE into cells (found ${vecExchanges.length} " +
        s"embedding-carrying exchanges — the self-join must reuse the cell exchange)")
  }

  test("q_join_fuzzy: probe segment keys broadcast into a hash join; the catalog never shuffles before it") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
    val plan = executed(q("q_join_fuzzy"))
    // r11: PassJoin turned the non-equi length-band join (broadcast
    // nested loop = O(probes x catalog) levenshtein calls, measured 27x
    // wall for 10x data at sf10) into an EQUI join on (seg_idx, length,
    // segment) — the probe key set broadcasts into a hash join and the
    // catalog is scanned once map-side; candidates shuffle only after
    // the join (the pair dedup), never the catalog itself
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      s"expected the probe segment keys to ride a broadcast hash join:\n$plan")
    assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"the nested-loop band join must be gone (PassJoin candidates):\n$plan")
    assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty,
      s"the catalog side must not shuffle for the probe join:\n$plan")
  }

  test("q_text_search: no exchange ever carries doc rows; top-20 is TakeOrderedAndProject") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = executed(q("q_text_search"))
    assert(plan.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      s"expected TakeOrderedAndProject for the top-20:\n$plan")
    // the only shuffle is the 1-row df aggregate; per-doc tf rows must
    // reach the TakeOrdered without an exchange
    plan.collect { case e: ShuffleExchangeExec => e }.foreach { e =>
      assert(!e.output.exists(_.name == "doc_id"),
        s"doc rows crossed an exchange: ${e.output.map(_.name)}")
    }
  }

  test("q_join_bloom: the bloom membership probe filters the fact scan before the exact semi join") {
    import org.apache.spark.sql.execution.joins.HashJoin
    val plan = executed(q("q_join_bloom"))
    assert(plan.toString.contains("might_contain"),
      s"bloom probe missing from the fact side:\n$plan")
    assert(plan.collect {
      case j: HashJoin if j.joinType.sql == "LEFT SEMI" => j
    }.nonEmpty, s"expected the exact LEFT SEMI verify join:\n$plan")
  }

  test("q_sim_knn_graph: the self-join never pays two shuffles of the input") {
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    for (name <- Seq("q_sim_knn_graph")) {
      val plan = executed(q(name))
      // at test scale Spark may broadcast one self-join side (zero input
      // shuffles — even better); when it shuffle-joins, the two sides must
      // share ONE canonical exchange via ReuseExchange
      val reused = plan.collect { case r: ReusedExchangeExec => r }.nonEmpty
      val bcastSelf = plan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty
      assert(reused || bcastSelf,
        s"$name: self-join sides neither broadcast nor share an exchange:\n$plan")
    }
  }

  test("multimodal decode family is map-side: payloads never cross a hash exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    for (name <- Seq("q_mm_decode", "q_mm_resize", "q_mm_audio_decode", "q_mm_video_decode")) {
      val plan = executed(q(name))
      // at 100 TB the decode must run where the payload lives: the only
      // exchange allowed is the final presentation sort (range partitioning
      // over the already-tiny stats rows) — a hash exchange would mean
      // binary payloads or raw text shuffled before decoding
      val hashEx = plan.collect {
        case e: ShuffleExchangeExec
            if !e.outputPartitioning.isInstanceOf[RangePartitioning] => e
      }
      assert(hashEx.isEmpty,
        s"$name: decode pipeline must be map-side, found hash exchanges:\n$plan")
    }
  }

  test("q_pipeline_dataset_card: no exchange carries document text, only digests + partials") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = executed(q("q_pipeline_dataset_card"))
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.nonEmpty, "expected the aggregation exchange")
    exchanges.foreach { e =>
      assert(!e.output.map(_.name).contains("text"),
        s"exchange shuffles raw document text: ${e.output.map(_.name)}")
    }
  }

  test("q_ts_theilsen: windowed estimator is join-free — two series-key hash exchanges") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    val plan = executed(q("q_ts_theilsen"))
    assert(plan.collect { case j: BaseJoinExec => j }.isEmpty,
      s"windowed Theil-Sen must not self-join:\n$plan")
    val hashEx = plan.collect {
      case e: ShuffleExchangeExec
          if !e.outputPartitioning.isInstanceOf[RangePartitioning] => e
    }
    // r19: the ring-buffer pairing pass replaced the 32-frame lead window
    // (−45% both arms, see the theilsen scaladoc) at the cost of ONE more
    // exchange — the mapPartitions object boundary hides the series
    // partitioning, so the rank-median sort re-shuffles the 16-byte
    // (series, slope) pairs. Exactly two: events by series key into the
    // pairing pass, slope pairs by series key into the median. A third
    // would mean a lost partitioning somewhere new.
    assert(hashEx.length === 2,
      s"expected exactly two hash exchanges, got ${hashEx.length}:\n$plan")
  }

  test("q_ts_sax / q_win_pattern: one series-key hash exchange serves the whole window+agg chain") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    for (name <- Seq("q_ts_sax", "q_win_pattern")) {
      val plan = executed(q(name))
      // HashPartitioning(user_id) satisfies every downstream requirement —
      // ClusteredDistribution on (user_id, seg/grp) and on user_id alone —
      // so the ONLY hash exchange is the first window shuffle; anything
      // more means a groupBy re-partitioned data that was already placed
      // (the final presentation sort's range exchange is expected)
      val hashEx = plan.collect {
        case e: ShuffleExchangeExec
            if !e.outputPartitioning.isInstanceOf[RangePartitioning] => e
      }
      assert(hashEx.length === 1,
        s"$name: expected exactly one series-key hash exchange, got " +
          s"${hashEx.length}:\n$plan")
    }
  }

  test("q_text_dsir: the bucket weight table broadcasts; the only hash exchanges are bucket- or doc-keyed") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    val plan = executed(q("q_text_dsir"))
    assert(plan.collect { case b: BroadcastExchangeExec => b }.nonEmpty,
      s"weight table must broadcast:\n$plan")
    // bigram rows must partial-aggregate before any exchange: every hash
    // exchange carries either the 1024-bucket aggregate or one row per doc
    plan.collect {
      case e: ShuffleExchangeExec
          if !e.outputPartitioning.isInstanceOf[RangePartitioning] => e
    }.foreach { e =>
      val names = e.output.map(_.name)
      assert(!names.contains("bg"),
        s"raw bigram rows crossed an exchange: $names")
    }
  }

  test("q_text_perplexity: the LM broadcasts into the scoring join; no exchange carries raw text") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = executed(q("q_text_perplexity"))
    // the vocab²-bounded model must broadcast — the corpus-sized occurrence
    // side never shuffles for the scoring join
    assert(plan.collect { case b: BroadcastExchangeExec => b }.nonEmpty,
      s"bigram LM must broadcast:\n$plan")
    // the doc text stays at its scan: exchanges may carry words/counts
    // (model build) or per-doc partials, never the text column
    plan.collect { case e: ShuffleExchangeExec => e }.foreach { e =>
      val names = e.output.map(_.name)
      assert(!names.contains("text"),
        s"raw doc text crossed an exchange: $names")
    }
  }

  test("q_ts_downsample_minmax: one series-key hash exchange; q_mix_temperature: weight total broadcasts") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    val mm = executed(q("q_ts_downsample_minmax"))
    val hashEx = mm.collect {
      case e: ShuffleExchangeExec
          if !e.outputPartitioning.isInstanceOf[RangePartitioning] => e
    }
    // both row_number windows and the filters ride the (user_id, bkt)
    // partitioning of ONE exchange; the union of two filters of the same
    // ranked frame must not re-shuffle either branch
    assert(hashEx.length <= 2, // one per union branch pre-ReuseExchange; >2 means a re-partition leaked in
      s"q_ts_downsample_minmax re-partitioned ranked data:\n$mm")
    val mt = executed(q("q_mix_temperature"))
    assert(mt.collect { case b: BroadcastExchangeExec => b }.nonEmpty,
      s"q_mix_temperature: the 1-row weight total must broadcast:\n$mt")
  }

  test("q_sim_range_search: cosine threshold filters before any exchange — no vector ever shuffles") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = executed(q("q_sim_range_search"))
    plan.collect { case e: ShuffleExchangeExec => e }.foreach { e =>
      assert(!e.output.exists(_.name == "embedding"),
        s"range search shuffles vectors: ${e.output.map(_.name)}")
    }
  }

  test("q_tpch_q1: the ship-date predicate reaches the lineitem scan") {
    val scan = executed(q("q_tpch_q1"))
      .collectLeaves().collectFirst { case s: FileSourceScanExec => s }.get
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("LessThanOrEqual(l_shipdate,"),
      s"date bound not pushed: $pushed")
  }

  test("runtime bloom filter from a selective dim reaches the fact side of a shuffle join") {
    // The 100 TB posture check for non-broadcastable selective joins: with
    // broadcast off, Spark's InjectRuntimeFilter should build a bloom
    // filter over the filtered dim's join keys and apply might_contain on
    // the fact side BEFORE the shuffle — a semi-join pushdown that prunes
    // the fact scan without needing the dim to fit the broadcast
    // threshold. Size thresholds are lowered so test-scale data crosses
    // the same code path as production-scale.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "64MB")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      import org.apache.spark.sql.functions.col
      val dim = U.supplier(spark, sfDir).filter(col("s_acctbal") < 0)
      val fact = U.lineitem(spark, sfDir)
      val joined = fact.join(dim, col("s_suppkey") === col("l_suppkey"))
        .groupBy(col("s_suppkey")).count()
      val plan = executedPlan(joined)
      assert(plan.toString.contains("might_contain"),
        s"runtime bloom filter was not injected on the fact side:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("q_quality_expectations: each rule frame executes once — lineitem scanned exactly once") {
    // the stack() unpivot shape: a union-of-projections would re-execute
    // the shared lineitem aggregate per rule (2 scans of the largest table)
    val plan = executed(q("q_quality_expectations"))
    val scansByTable = plan.collectLeaves()
      .collect { case s: FileSourceScanExec => s }
      .flatMap(_.relation.location.rootPaths.headOption.map(_.getName))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(scansByTable.getOrElse("lineitem.parquet", 0) === 1,
      s"lineitem must scan once, got $scansByTable")
    assert(scansByTable.getOrElse("events.parquet", 0) === 1,
      s"events must scan once, got $scansByTable")
    // r18: the FK verdicts ride their table's ONE scan (left-outer
    // null-key counts), so orders scans once and customer twice (the
    // r3 parent side + the r6 child side) — before, each FK rule added
    // its own anti-join scan pair
    assert(scansByTable.getOrElse("orders.parquet", 0) === 1,
      s"orders must scan once, got $scansByTable")
    assert(scansByTable.getOrElse("customer.parquet", 0) <= 2,
      s"customer must scan at most twice, got $scansByTable")
    // the nation FK check broadcasts the 25-row dim into the outer join
    val outerBcast = plan.collect {
      case j: BroadcastHashJoinExec if j.joinType.sql == "LEFT OUTER" => j
    }
    assert(outerBcast.nonEmpty, s"nation FK join must broadcast:\n$plan")
  }

  test("q_quality_drift: the midpoint rides a broadcast; one (type,bucket) hash exchange") {
    val plan = executed(q("q_quality_drift"))
    assert(plan.collect { case b: BroadcastExchangeExec => b }.nonEmpty,
      s"midpoint scalar must broadcast:\n$plan")
    // two passes by construction: a column-pruned min/max pass computes the
    // midpoint, then the bucketing pass consumes it (grouping can't start
    // before the split point is known)
    val scans = plan.collectLeaves().collect { case s: FileSourceScanExec => s }
    assert(scans.length === 2, s"drift is a midpoint pass + a bucketing pass, got ${scans.length}")
    val midScan = scans.map(_.requiredSchema.fieldNames.toSet)
    assert(midScan.exists(_ == Set("ts")),
      s"the midpoint pass must prune to the ts column alone, got $midScan")
  }

  test("q_layout_zorder: both passes prune to the two layout columns; bounds ride a broadcast") {
    val plan = executed(q("q_layout_zorder"))
    val scans = plan.collectLeaves().collect { case s: FileSourceScanExec => s }
    // a bounds pass fixes the quantization domain, then the bucketing pass
    // consumes it — and NEITHER may read past (l_partkey, l_shipdate)
    assert(scans.length === 2, s"bounds pass + bucketing pass, got ${scans.length}")
    scans.foreach { s =>
      assert(s.requiredSchema.fieldNames.toSet === Set("l_partkey", "l_shipdate"),
        s"scan must prune to the two layout dims, got ${s.requiredSchema.fieldNames.toSet}")
    }
    assert(plan.collect { case b: BroadcastExchangeExec => b }.nonEmpty,
      s"quantization bounds must broadcast:\n$plan")
  }

  test("q_ts_theilsen: slope rows cross one exchange and sort once (pairing pass emits them series-grouped)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.SortExec
    val plan = executed(q("q_ts_theilsen"))
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    // r19 ring-buffer pairing (see the theilsen scaladoc): events cross
    // one series-key exchange into the pairing pass, the emitted
    // (series, slope) pairs cross one more into the rank median — the
    // object boundary hides the partitioning — and the only other
    // exchange is the final orderBy's range partitioning over the
    // per-series output rows
    val dataExchanges = exchanges.filterNot(
      _.outputPartitioning.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RangePartitioning])
    assert(dataExchanges.length === 2,
      s"expected exactly two hash exchanges, got ${dataExchanges.length}:\n$plan")
    // two sorts on the way to the median (the pairing pass's
    // (series, ts, event) secondary sort + the median's sm order) plus
    // (possibly) the final orderBy — a fourth would mean a lost
    // partitioning
    val sorts = plan.collect { case s: SortExec => s }
    assert(sorts.length <= 3,
      s"expected at most 3 sorts, got ${sorts.length}:\n$plan")
  }

  test("q_tpch_q18: one wide exchange — the HAVING aggregate IS the output, the qualifying set broadcasts") {
    // the r14 rewrite: the textbook semi-join + re-join + re-aggregate
    // shape shuffled lineitem twice (17×/decade at sf100); the rewritten
    // plan aggregates lineitem once and broadcast-joins the rare
    // qualifying set, so exactly ONE shuffle exchange may touch
    // lineitem-sized data and no sort-merge join may appear
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val plan = executed(q("q_tpch_q18"))
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.length === 1,
      s"expected exactly the lineitem aggregation exchange, got ${exchanges.length}:\n$plan")
    assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty,
      s"q18 must not sort-merge: the qualifying set is rare and broadcasts\n$plan")
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.size === 2,
      "expected orders⋈qualifying and ⋈customer as broadcast joins")
    assert(plan.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      "top-100 must plan as TakeOrderedAndProject, not a global sort")
  }

  test("QTime forced-hash consumer: counts rows like count(), but keeps the Window operators count() prunes") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = q("q_win_rank")
    assert(QTime.evalRows(df, forceHash = true) === df.count(),
      "hash consumer must return the plain row count")
    assert(QTime.evalRows(spark.emptyDataFrame.selectExpr("1 as x").limit(0),
      forceHash = true) === 0L, "empty input must count 0, not fail on null hash agg")
    // the honesty property itself: under count() the optimizer deletes the
    // window; under the hash consumer it cannot (SCALING.md consumer caveat)
    def consumedPlan(force: Boolean): SparkPlan = withPlanShapeConf() {
      import org.apache.spark.sql.functions.{count, lit}
      val d = q("q_win_rank")
      // the SAME consumer expression evalRows executes (QTime.hashConsumer)
      // — a hand-built copy here would keep validating a stale shape if
      // evalRows ever drifted (ADVICE r14)
      val consumer =
        if (force) QTime.hashConsumer(d)
        else d.groupBy().agg(count(lit(1)))
      consumer.queryExecution.executedPlan
    }
    assert(consumedPlan(force = true).collect { case w: WindowExec => w }.nonEmpty,
      "hash consumer lost the Window operator — the measurement is scan-bound again")
    assert(consumedPlan(force = false).collect { case w: WindowExec => w }.isEmpty,
      "count() now RETAINS windows? the consumer caveat documentation is stale")
  }

  test("AutoParts: plan-signal classification and the driver-scale floor") {
    // floor: at sf0.001 every estimate is far below cpus x 32 MB, so auto
    // must reproduce the default seed exactly (the r1-r10 behavior the
    // driver gate runs under)
    for (k <- Seq("q_tpch_q1", "q_win_rolling_median", "q_sim_knn_graph",
        "q_tpch_q21", "q_dedup_embed_lsh"))
      assert(AutoParts.partsFor(q(k), 32) === 32,
        s"$k must floor to cpus at driver scale")
    def sig(k: String) = PlanStats.signals(q(k).queryExecution.optimizedPlan)
    // the LSH bucket self-join is the expansion shape: inner self-join
    // detected, so the SelfJoinWeight multiplier applies
    assert(sig("q_sim_knn_graph").selfJoinChild > 0,
      "knn's inner bucket self-join must register as selfJoinChild")
    // q21's lineitem self-joins are semi/anti (exists / not-exists) —
    // non-expanding, so they must NOT trigger the expansion weight
    val q21 = sig("q_tpch_q21")
    assert(q21.selfJoinChild === BigInt(0),
      "semi/anti self-joins must not count as expansion self-joins")
    assert(q21.joinChild > 0, "q21's join inputs must still be sized")
    // window input trusted only through join/agg-free subtrees: the
    // rolling-median window reads a scan directly (trusted), q1's final
    // sort sits above an aggregate (untrusted - the 6-row sort was
    // 'estimated' at the full scan size before this rule)
    assert(sig("q_win_rolling_median").winSortChild > 0,
      "rolling_median's window input is join/agg-free and must be sized")
    assert(sig("q_tpch_q1").winSortChild === BigInt(0),
      "a sort above an aggregate must not contribute a bogus size signal")
  }

  test("AutoParts: registry seed hint fires only in the spill regime") {
    // q_merge_upsert's measured-optimum hint (512 at sf100,
    // BENCH_autoparts_AB.json) replaces the formula ONLY when the formula
    // is above the cpu floor — i.e. the plan's estimates put the query in
    // the big-SF spill regime. In the spill regime the hint wins:
    assert(AutoParts.chooseSeed("q_merge_upsert", 384, 32) === 512)
    // at the floor (driver-gate scales) the hint is inert — the gate runs
    // the exact r1-r16 geometry:
    assert(AutoParts.chooseSeed("q_merge_upsert", 32, 32) === 32)
    assert(AutoParts.partsFor(q("q_merge_upsert"), 32) === 32,
      "merge_upsert must still floor to cpus at driver scale")
    // keys without a hint keep the formula either way:
    assert(AutoParts.chooseSeed("q_tpch_q1", 384, 32) === 384)
    assert(AutoParts.chooseSeed("q_tpch_q1", 32, 32) === 32)
    // exactly one key carries a hint today — a new hint must come with its
    // own measured A/B artifact before it lands here:
    assert(Registry.all.filter(_.seedHint.isDefined).map(_.name) ===
      Seq("q_merge_upsert"))
  }

  test("AutoParts: checkpoint-poisoned stats floor to cpus, never overflow the cap") {
    // MatCache's localCheckpoints surface as LogicalRDDs whose stats are
    // defaultSizeInBytes-derived garbage (measured 6.9e61 bytes on the
    // pair graph at sf0.1); before the r16 sanity filter + BigInt-domain
    // clamp, partsFor wrapped BigInt->Long->Int into a 1,733,712,384
    // partition seed and the executing JVM OOM'd on 3.4e9 shuffle blocks.
    for (k <- Seq("q_dedup_clusters", "q_graph_pagerank", "q_graph_degrees")) {
      val n = AutoParts.partsFor(q(k), 32)
      assert(n === 32,
        s"$k (checkpoint-backed plan) must floor to cpus at driver scale, got $n")
    }
    // the clamp itself: a synthetic astronomic estimate stays at the cap
    val garbage = BigInt("68781492363497275225038277326762912707510552851647261873377053")
    val raw = (garbage * 16 / AutoParts.TargetPartBytes)
      .min(BigInt(AutoParts.MaxParts)).toLong
    assert(raw === AutoParts.MaxParts.toLong)
    // and the signal-level filter zeroes it before the formula ever sees it
    assert(PlanStats.signals(q("q_dedup_clusters").queryExecution.optimizedPlan)
      .winSortChild < BigInt(1L << 50),
      "garbage checkpoint stats must be filtered at the signal level")
  }
}
