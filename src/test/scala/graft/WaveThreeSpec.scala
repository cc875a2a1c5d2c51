package graft

import graft.ops.{Corpus, Dedup, Profiling, Relational, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-8 wave-III operators: lakehouse certificates (zone maps, IVM,
  * bloom design), robust stats, and the SFT/classifier corpus ops. Each
  * test asserts a SEMANTIC property the oracle hash alone can't localize. */
class WaveThreeSpec extends SparkSpec {

  test("q_zonemap_prune: matching rows are layout-invariant and zorder prunes both dims") {
    val rows = Relational.qZonemapPrune(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("shuffled", "linear_date", "zorder"))
    // the predicate's answer cannot depend on the file layout
    val matching = rows.values.map(_.getAs[Long]("rows_matching")).toSet
    assert(matching.size == 1, s"layout changed the answer: $matching")
    val total = rows.values.map(_.getAs[Long]("rows_total")).toSet
    assert(total.size == 1)
    // a scanned-files reader never reads fewer rows than the true answer
    rows.values.foreach { r =>
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_matching"))
    }
    // hash layout destroys locality: zone maps skip nothing (every file
    // spans the whole key range at this density), so shuffled reads the
    // most; zorder prunes BOTH dimensions so it reads the least
    val sh = rows("shuffled").getAs[Long]("rows_scanned")
    val zo = rows("zorder").getAs[Long]("rows_scanned")
    val ld = rows("linear_date").getAs[Long]("rows_scanned")
    assert(zo < ld && ld < sh, s"expected zorder < linear < shuffled, got $zo / $ld / $sh")
  }

  test("q_zonemap_prune assigns files by arithmetic, not a global sort") {
    val plan = Relational.qZonemapPrune(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning(px") && !plan.contains("rangepartitioning(dx"),
      "layout assignment must be map-side routing, not a sort")
  }

  test("q_ivm_agg: delta maintenance is exact for every group") {
    val rows = Relational.qIvmAgg(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("consistent"),
        s"maintained != recomputed for ${r.getString(0)}")
      assert(r.getAs[Long]("n_maintained") == r.getAs[Long]("n_recomputed"))
    }
  }

  test("q_bloom_fpr: no false negatives by construction, FPR coherent with fill") {
    val r = Profiling.qBloomFpr(spark, sf).collect()(0)
    val (members, bits, probes, fp) = (r.getAs[Long]("n_members"),
      r.getAs[Long]("n_bits_set"), r.getAs[Long]("n_probes"), r.getAs[Long]("n_false_pos"))
    assert(members > 0 && probes > 0)
    assert(bits <= members * 4, "k=4 hashes set at most 4 bits per member")
    assert(fp <= probes)
    // measured FPR must sit near the (fill)^4 estimate — a broken hash
    // (all keys landing on one bit) or a broken probe join lands far away
    val est = r.getAs[Long]("est_fpr_ppm"); val meas = r.getAs[Long]("fpr_ppm")
    assert(meas <= 4 * est + 2000, s"measured $meas ppm vs estimate $est ppm")
  }

  test("q_theil_sen: pair counts are exact and the median sits inside the range") {
    Profiling.qTheilSen(spark, sf).collect().foreach { r =>
      val d = r.getAs[Long]("n_days"); val p = r.getAs[Long]("n_pairs")
      assert(p == d * (d - 1) / 2, s"pairs $p != C($d,2)")
      val ts = r.getAs[Long]("ts_slope_ppm")
      assert(ts >= r.getAs[Long]("min_slope_ppm") && ts <= r.getAs[Long]("max_slope_ppm"))
    }
  }

  test("q_text_classify: confusion matrix conserves the corpus and stays in-label") {
    val docs = Tables.documents(spark, sf)
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).toSet
    val conf = TextAnalysis.qTextClassify(spark, sf).collect()
    assert(conf.map(_.getAs[Long]("n_docs")).sum == docs.count(),
      "every document classifies exactly once")
    conf.foreach { r =>
      assert(langs.contains(r.getString(0)) && langs.contains(r.getString(1)))
    }
  }

  test("q_text_classify broadcasts the weight table (model is vocab-sized)") {
    val plan = TextAnalysis.qTextClassify(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "weights must broadcast, not shuffle")
  }

  test("q_train_test_leakage: split census matches and leaks are real cross-split near-dups") {
    val leak = Dedup.qTrainTestLeakage(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .withColumn("is_test", expr(
        "CAST(conv(substring(md5(concat('split:', CAST(doc_id AS STRING))), 1, 15), " +
          "16, 10) AS BIGINT) % 10 = 0"))
    val testByLang = docs.filter(col("is_test")).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    leak.foreach { r =>
      assert(r.getAs[Long]("n_test") == testByLang(r.getString(0)))
      assert(r.getAs[Long]("n_leaked") <= r.getAs[Long]("n_test"))
    }
    // every leaked doc the banded tier reports must be confirmable by the
    // exact tier: cross-split near pairs at the same threshold
    val split = docs.select(col("doc_id"), col("is_test"))
    val exactPairs = Dedup.qDedupNear(spark, sf)
      .join(split.select(col("doc_id").as("d1"), col("is_test").as("t1")), "d1")
      .join(split.select(col("doc_id").as("d2"), col("is_test").as("t2")), "d2")
    val exactLeaked = exactPairs
      .filter((col("t1") && !col("t2")) || (col("t2") && !col("t1")))
      .select(explode(array(
        when(col("t1"), col("d1")).otherwise(col("d2"))))).distinct().count()
    val reported = leak.map(_.getAs[Long]("n_leaked")).sum
    assert(reported <= exactLeaked,
      s"banded tier reported $reported leaks but exact tier only confirms $exactLeaked")
    assert(exactLeaked == 0 || reported >= (exactLeaked * 9) / 10,
      s"banded recall too low: $reported of $exactLeaked")
  }

  test("q_chat_template: budgets follow the token count and the markup is fixed-size") {
    val rows = Corpus.qChatTemplate(spark, sf).collect()
    val docs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_records")).sum == docs)
    val maxToks = Tables.documents(spark, sf)
      .select(max(size(split(lower(trim(col("text"))), " ")))).collect()(0).getInt(0)
    rows.foreach { r =>
      // seq budget = tokens + 3 markers, bounded by the corpus' longest doc
      assert(r.getAs[Long]("max_seq_tokens") <= maxToks + 3)
      assert(r.getAs[Long]("sum_seq_tokens") > r.getAs[Long]("n_records") * 3)
    }
  }

  test("q_compaction_plan: bins conserve rows and respect the fill target") {
    val plan = Relational.qCompactionPlan(spark, sf).collect()
    val total = Tables.orders(spark, sf).count()
    assert(plan.map(_.getAs[Long]("group_rows")).sum == total,
      "every file lands in exactly one merge group")
    val target = total / 8 + 1
    plan.foreach { r =>
      // a group only exceeds target by its last (straddling) file
      assert(r.getAs[Long]("group_rows") < target + r.getAs[Long]("largest_file_rows"))
      assert(r.getAs[Long]("smallest_file_rows") <= r.getAs[Long]("largest_file_rows"))
    }
  }

  test("q_filter_sweep: selectivity is monotone in the threshold") {
    val sweep = Corpus.qFilterSweep(spark, sf).collect().sortBy(_.getAs[Int]("k"))
    assert(sweep.length == 9)
    sweep.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_docs_kept") <= a.getAs[Long]("n_docs_kept"),
        "a stricter threshold can never keep more docs")
      assert(b.getAs[Long]("threshold_bucket") >= a.getAs[Long]("threshold_bucket"))
    }
    // decile thresholds: the k-th cut keeps at most the top (10-k+1)/10
    // (bucket granularity can round up at the boundary, never below)
    val n = Tables.documents(spark, sf).count()
    assert(sweep.last.getAs[Long]("n_docs_kept") <= (n * 2) / 10 + 1)
  }

  test("q_stream_topk: every window emits a complete, count-ordered board") {
    val rows = graft.ops.StreamingShaped.qStreamTopk(spark, sf).collect()
    rows.groupBy(_.getAs[java.sql.Timestamp]("wstart")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rk"))
      assert(byRank.map(_.getAs[Int]("rk")).toSeq == (1 to byRank.length),
        "ranks are dense from 1")
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a.getAs[Long]("n") >= b.getAs[Long]("n"))
        case _ =>
      }
    }
  }

  test("q_golden_record: priority-wins survivorship picks the right feed per attribute") {
    val g = Dedup.qGoldenRecord(spark, sf).collect()
      .map(r => r.getAs[Long]("c_custkey") -> r).toMap
    val c = Tables.customer(spark, sf).collect()
      .map(r => r.getAs[Long]("c_custkey") -> r).toMap
    assert(g.keySet == c.keySet, "one golden record per entity")
    g.foreach { case (k, r) =>
      val name = c(k).getAs[String]("c_name")
      if (k % 7 == 0) { // CRM gap → billing's uppercased name wins
        assert(r.getAs[String]("golden_name") == name.toUpperCase)
        assert(r.getAs[Long]("name_prio") == 2L)
      } else {
        assert(r.getAs[String]("golden_name") == name)
        assert(r.getAs[Long]("name_prio") == 1L)
      }
      // balance: CRM drops k%3=0 → billing (fresh) backfills, never legacy's stale value
      assert(r.getAs[Long]("bal_prio") == (if (k % 3 == 0) 2L else 1L))
      assert(r.getAs[Long]("n_feeds") == (if (k % 5 == 0) 2L else 3L))
    }
  }

  test("q_join_dpp: the fact scan carries a runtime dynamic-pruning partition filter") {
    val df = Relational.qJoinDpp(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      "partition filter must come from the broadcast dim at runtime:\n" +
        plan.linesIterator.take(25).mkString("\n"))
    // and the answer matches a direct quarter filter on the source
    val direct = Tables.orders(spark, sf)
      .filter(expr("year(o_orderdate) = 1996 AND month(o_orderdate) <= 3")).count()
    assert(df.agg(sum("n")).collect()(0).getLong(0) == direct)
  }

  test("q_skew_salt_plan: salting bounds every task at the target") {
    val plan = graft.ops.Joins.qSkewSaltPlan(spark, sf).collect()
    assert(plan.map(_.getAs[Long]("rows_total")).sum ==
      Tables.lineitem(spark, sf).count(), "plan conserves the fact rows")
    assert(plan.exists(_.getAs[Long]("n_salts") > 1), "planted skew must need salting")
    plan.foreach { r =>
      assert(r.getAs[Long]("max_task_rows_after") <= r.getAs[Long]("target_rows"),
        s"salts=${r.getAs[Long]("n_salts")}: task bound violated")
      assert(r.getAs[Long]("max_task_rows_after") <= r.getAs[Long]("max_task_rows_before"))
    }
  }

  test("q_watermark_lateness: late counts shrink as the delay grows") {
    val rows = graft.ops.StreamingShaped.qWatermarkLateness(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum == Tables.events(spark, sf).count())
    rows.foreach { r =>
      val l = Seq("late_0s", "late_60s", "late_300s", "late_900s").map(r.getAs[Long])
      assert(l == l.sorted.reverse, s"lateness must be monotone in delay: $l")
      assert(l.head <= r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("max_disorder_us") >= 0L)
    }
  }

  test("q_ann_nndescent: the NoN round adds candidates and never loses recall") {
    val rows = Similarity.qAnnNndescent(spark, sf).collect().sortBy(_.getAs[Long]("round"))
    assert(rows.length == 2)
    val (r0, r1) = (rows(0), rows(1))
    // >= is the algorithm's invariant (cand1 includes u); the STRICT gain
    // is a property of the two-code-table composition on this corpus
    // (cand1 == cand0 is possible under one bucket table), so assert the
    // invariant and let recall monotonicity carry the quality claim.
    assert(r1.getAs[Long]("n_candidates") >= r0.getAs[Long]("n_candidates"),
      "the NoN candidate set includes the symmetrized graph itself")
    assert(r1.getAs[Long]("recall_ppm") >= r0.getAs[Long]("recall_ppm"),
      "rescoring a superset of candidates can only improve top-4 recall")
    val n = Tables.embeddings(spark, sf)
      .filter(expr("size(embedding) = 64")).count()
    rows.foreach(r => assert(r.getAs[Long]("knn_edges") <= 4 * n))
  }

  test("q_f2_sketch: the CMS row dot product never underestimates F2") {
    val r = Profiling.qF2Sketch(spark, sf).collect()(0)
    assert(r.getAs[Long]("f2_est") >= r.getAs[Long]("f2_exact"),
      "cross terms are non-negative — the estimate is one-sided")
    assert(r.getAs[Long]("over_ppm") >= 0L)
    assert(r.getAs[Long]("f2_exact") >= Tables.lineitem(spark, sf).count(),
      "F2 >= F1 always")
  }

  test("q_sql_pivot: the SQL PIVOT clause conserves the grouped rows") {
    val p = graft.ops.Reshape.qSqlPivot(spark, sf).collect()
    assert(p.length == 5, "one row per priority")
    val pivotN = p.map(r => Seq("1995_n", "1996_n", "1997_n").map(r.getAs[Long]).sum).sum
    val direct = Tables.orders(spark, sf)
      .filter(expr("year(o_orderdate) BETWEEN 1995 AND 1997")).count()
    assert(pivotN == direct)
  }

  test("q_rank_tau: pair algebra is exact and tau is bounded") {
    graft.ops.Evaluation.qRankTau(spark, sf).collect().foreach { r =>
      val (c, d, t) = (r.getAs[Long]("concordant"), r.getAs[Long]("discordant"),
        r.getAs[Long]("ties"))
      assert(c + d + t == r.getAs[Long]("n_pairs"))
      assert(r.getAs[Long]("n_pairs") == 30L * 29 / 2)
      assert(math.abs(r.getAs[Long]("tau_ppm")) <= 1000000L)
    }
  }

  test("q_prefix_cache: group arithmetic conserves docs and bounds the hit rate") {
    val rows = Corpus.qPrefixCache(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_prefixes") <= r.getAs[Long]("n_docs"))
      val hit = r.getAs[Long]("cache_hit_ppm")
      assert(hit >= 0L && hit < 1000000L)
      assert((r.getAs[Long]("hottest_prefix_docs") > 1) == (hit > 0L))
    }
  }

  test("q_rouge_overlap: one row per mined pair, F1 bounded, grams tighter than unigrams") {
    val mined = Corpus.qPreferencePairs(spark, sf).count()
    val rows = Corpus.qRougeOverlap(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == mined)
    rows.foreach { r =>
      assert(r.getAs[Long]("mean_uni_f1_ppm") <= 1000000L)
      // shared bigrams require shared unigrams: bigram F1 can't exceed ~uni
      assert(r.getAs[Long]("mean_bi_f1_ppm") <= r.getAs[Long]("mean_uni_f1_ppm"))
      assert(r.getAs[Long]("n_degenerate") <= r.getAs[Long]("n_pairs"))
    }
  }

  test("q_dataset_card: facts are internally consistent") {
    val card = Corpus.qDatasetCard(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("value")).toMap
    assert(card("n_docs") == Tables.documents(spark, sf).count())
    assert(card("p50_doc_tokens") <= card("p90_doc_tokens"))
    assert(card("mean_doc_tokens_milli") >= card("p50_doc_tokens") * 1000 / 2)
    assert(card("dup_doc_ppm") <= 1000000L && card("short_doc_ppm") <= 1000000L)
    assert(card("n_tokens") >= card("n_docs") * 30, "generator docs are ≥30 tokens")
  }
}
