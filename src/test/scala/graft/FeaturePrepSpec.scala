package graft

import graft.ops.{FeaturePrep, Similarity}
import org.apache.spark.sql.functions._

/** FeaturePrep + PCA: each operator's exact-arithmetic contract is
  * replicated in plain Scala (BigInt / Double) from the raw tables and
  * compared value-for-value — the same discipline as the DuckDB oracle but
  * independent of SQL, so an error shared by both SQL engines would still
  * be caught here. */
class FeaturePrepSpec extends SparkSpec {

  test("tree_split: histogram splits replay in BigInt; gain is nonnegative SSE reduction") {
    val rows = Tables.lineitem(spark, sf)
      .select(expr("CAST(round(l_quantity) AS BIGINT)"),
        expr("CAST(round(l_discount * 100) AS BIGINT)"),
        expr("CAST(round(l_extendedprice) AS BIGINT)")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def splits(binsOf: ((Long, Long, Long)) => Long, feature: String) = {
      val bins = rows.groupBy(binsOf).toSeq.map { case (b, xs) =>
        (b, xs.length.toLong, xs.map(_._3).sum) }.sortBy(_._1)
      val (nT, sT) = (bins.map(_._2).sum, bins.map(_._3).sum)
      var (nL, sL) = (0L, 0L)
      bins.flatMap { case (b, n, s) =>
        nL += n; sL += s
        if (nL < nT) {
          val gain = (BigInt(sL) * sL / nL + BigInt(sT - sL) * (sT - sL) / (nT - nL)
            - BigInt(sT) * sT / nT).toLong
          Some((feature, b, nL, sL, nT - nL, sT - sL, gain))
        } else None
      }
    }
    val want = (splits(_._2, "discount") ++ splits(_._1, "quantity"))
      .sortBy(t => (t._1, t._2))
    val got = FeaturePrep.qTreeSplit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want, "every candidate split must replay bin for bin")
    // true gain >= 0 by convexity; the three floor divisions can shave at
    // most 2 below an exact-zero gain
    assert(got.forall(_._7 >= -2L), "SSE reduction can't go below floor slack")
  }

  test("feature_scale: z and minmax recompute from plain-Scala group stats") {
    val rows = FeaturePrep.qFeatureScale(spark, sf).collect()
    assert(rows.nonEmpty)
    val raw = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byType = raw.groupBy(_._2)
    val stats = byType.map { case (t, rs) =>
      val vs = rs.map(_._3)
      val n = vs.length.toDouble
      val sv = vs.map(BigInt(_)).sum
      val sv2 = vs.map(v => BigInt(v) * BigInt(v)).sum
      val mean = sv.toDouble / n
      val std = math.sqrt((n * sv2.toDouble - sv.toDouble * sv.toDouble) / (n * (n - 1.0)))
      t -> (mean, std, vs.min, vs.max)
    }
    val vcById = raw.map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { r =>
      val (t, vc) = vcById(r.getLong(0))
      val (mean, std, mn, mx) = stats(t)
      assert(vs6(r.getDouble(3)) == vs6((vc.toDouble - mean) / std), s"z for ${r.getLong(0)}")
      assert(vs6(r.getDouble(4)) == vs6((vc - mn).toDouble / (mx - mn).toDouble))
    }
    // degenerate groups (n<=1 / zero spread) are absent, others complete
    val emitted = rows.map(_.getString(1)).toSet
    val expected = stats.collect {
      case (t, (_, std, mn, mx)) if std > 0 && mx > mn && byType(t).length > 1 => t
    }.toSet
    assert(emitted == expected)
  }

  test("decay_score: dyadic half-life terms recompute exactly in BigInt") {
    val rows = FeaturePrep.qDecayScore(spark, sf).collect()
    val raw = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_date(CAST(ts AS DATE))").as("ed"),
        expr("CAST(round(value * 100) AS BIGINT)").as("vc"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val ref = raw.map(_._2).max
    val expect = raw.groupBy(_._1).map { case (u, rs) =>
      val st = rs.map { case (_, d, vc) =>
        val k = math.min((ref - d) / 14, 20)
        BigInt(vc) << (20 - k)
      }.sum
      u -> (rs.length.toLong, st.toDouble / 104857600.0)
    }
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (n, s) = expect(r.getLong(0))
      assert(r.getLong(1) == n)
      assert(vs6(r.getDouble(2)) == vs6(s), s"user ${r.getLong(0)}")
    }
  }

  test("target_encode: LOO excludes self, smoothing shrinks toward the global mean") {
    val rows = FeaturePrep.qTargetEncode(spark, sf).collect()
    val raw = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySeg = raw.groupBy(_._2)
    val sAll = raw.map(r => BigInt(r._3)).sum
    val nAll = BigInt(raw.length)
    val expect = raw.collect { case (k, seg, x) if bySeg(seg).length > 1 =>
      val n = bySeg(seg).length
      val s = bySeg(seg).map(r => BigInt(r._3)).sum
      val loo = (s - x).toDouble / (n - 1).toDouble / 100.0
      val smooth = ((s - x) * nAll + 100 * sAll).toDouble /
        ((BigInt(n - 1 + 100)) * nAll).toDouble / 100.0
      k -> (vs6(loo), vs6(smooth))
    }.toMap
    assert(rows.length == expect.size && rows.nonEmpty)
    rows.foreach { r =>
      val (loo, smooth) = expect(r.getLong(0))
      assert(vs6(r.getDouble(2)) == loo, s"order ${r.getLong(0)} loo")
      assert(vs6(r.getDouble(3)) == smooth, s"order ${r.getLong(0)} smooth")
    }
    // smoothing must land strictly between the LOO mean and the global mean
    // (prior weight pulls toward global; equality only if they coincide)
    val gmean = sAll.toDouble / nAll.toDouble / 100.0
    rows.foreach { r =>
      val (loo, smooth) = (r.getDouble(2), r.getDouble(3))
      assert((smooth >= math.min(loo, gmean) - 1e-6)
        && (smooth <= math.max(loo, gmean) + 1e-6),
        s"order ${r.getLong(0)}: smoothed $smooth outside [$loo, $gmean]")
    }
  }

  test("woe_encode: WOE and IV recompute from plain-Scala smoothed shares") {
    val got = FeaturePrep.qWoeEncode(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val rows = Tables.orders(spark, sf).select("o_orderpriority", "o_orderstatus").collect()
      .map(r => (r.getString(0), r.getString(1) == "F"))
    val posT = rows.count(_._2).toLong
    val negT = rows.length - posT
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val want = rows.groupBy(_._1).toSeq.map { case (cat, xs) =>
      val p = xs.count(_._2).toLong
      val n = xs.length - p
      val woe = math.log(((p + 0.5) / posT.toDouble) / ((n + 0.5) / negT.toDouble))
      val iv = ((p + 0.5) / posT.toDouble - (n + 0.5) / negT.toDouble) * woe
      (cat, p, n.toLong, r6(woe), r6(iv))
    }.sortBy(_._1)
    assert(got.toSeq == want, "smoothed WOE/IV must agree to 6 dp")
    // sanity: a category over-represented among positives has positive WOE
    got.foreach { case (_, p, n, woe, _) =>
      val lift = (p + 0.5) / posT.toDouble - (n + 0.5) / negT.toDouble
      assert(math.signum(woe) == math.signum(lift) || woe == 0.0)
    }
  }

  test("label_balance: weights rebalance to n_total and shares sum to 1") {
    val rows = FeaturePrep.qLabelBalance(spark, sf).collect()
    val nTotal = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.map(_.getLong(1)).sum == nTotal)
    // sklearn "balanced" invariant: sum over examples of its class weight = n_total
    val rebalanced = rows.map(r => r.getLong(1) * r.getDouble(3)).sum
    assert(math.abs(rebalanced - nTotal) < 1e-2 * nTotal)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-4)
  }

  test("feature_hash: buckets bounded, mass conserved, assignment deterministic") {
    val rows = graft.ops.FeaturePrep.qFeatureHash(spark, sf).collect()
    assert(rows.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0 && b < 64
    })
    val nCustomers = Tables.customer(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == 3 * nCustomers,
      "every (row, feature) lands in exactly one bucket")
    // the hash is a pure function of the feature string: rerun is identical
    val again = graft.ops.FeaturePrep.qFeatureHash(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("quantile_norm: uniform on [0,1], extremes pinned, order-preserving") {
    val rows = graft.ops.FeaturePrep.qQuantileNorm(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val q = r.getAs[Double]("q"); q >= 0.0 && q <= 1.0
    })
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (et, rs) =>
      val byV = rs.sortBy(r => (r.getAs[Double]("value"), r.getAs[Long]("event_id")))
      assert(byV.head.getAs[Double]("q") == 0.0, s"$et: min value must map to 0")
      assert(byV.last.getAs[Double]("q") == 1.0, s"$et: max value must map to 1")
      // rank transform is monotone in (value, event_id)
      byV.map(_.getAs[Double]("q")).sliding(2).foreach {
        case Array(a, b) => assert(a <= b, s"$et: quantiles not monotone")
        case _ =>
      }
    }
  }

  test("pca_power: loadings replay the integer power iteration exactly and align with G·v") {
    val rows = Similarity.qPcaPower(spark, sf).collect()
    assert(rows.length == 64)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(size(col("embedding")) === 64)
      .select(expr("transform(embedding, v -> CAST(round(v * 1e6) AS BIGINT))"))
      .collect().map(_.getSeq[Long](0).toArray)
    val d = 64
    val g = Array.ofDim[BigInt](d, d)
    for (i <- 0 until d; j <- 0 until d)
      g(i)(j) = vecs.map(q => BigInt(q(i)) * BigInt(q(j))).sum
    var v = Array.fill(d)(1000000L)
    for (_ <- 1 to 5) {
      val w = (0 until d).map(i => (0 until d).map(j => g(i)(j) * v(j)).sum).toArray
      val m = w.map(_.abs).max.max(BigInt(1))
      v = w.map(x => math.round(x.toDouble / m.toDouble * 1e6))
    }
    rows.foreach { r =>
      assert(r.getDouble(1) == v(r.getInt(0)) / 1e6, s"dim ${r.getInt(0)}")
    }
    // eigen property: after 5 iterations G·v is nearly parallel to v
    val vd = v.map(_.toDouble)
    val gv = (0 until d).map(i => (0 until d).map(j => g(i)(j).toDouble * vd(j)).sum).toArray
    val cos = dot(gv, vd) / math.sqrt(dot(gv, gv) * dot(vd, vd))
    assert(cos > 0.99, s"alignment $cos")
  }

  test("negative_sampling: negatives never collide with positives, <=8 per user, deterministic") {
    val rows = FeaturePrep.qNegativeSampling(spark, sf).collect()
    assert(rows.nonEmpty)
    val pos = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val np = spark.read.parquet(s"$sf/part.parquet")
      .agg(max(col("p_partkey"))).collect()(0).getLong(0)
    rows.foreach { r =>
      val (u, item) = (r.getLong(0), r.getLong(3))
      assert(!pos.contains((u, item)), s"negative collides with a positive: ($u,$item)")
      // 1..max(p_partkey): every negative is a REAL catalog id (TPC-H
      // partkeys are dense from 1) — id 0 / gap phantoms would pass the
      // anti-join trivially, since no one ever bought a nonexistent part
      assert(item >= 1 && item <= np, s"negative outside catalog: $item")
    }
    // per-user caps + rank contiguity (1..n, n <= 8)
    rows.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      val rks = rs.map(_.getInt(1)).sorted.toList
      assert(rks == (1 to rks.length).toList, s"ranks not contiguous for $u")
      assert(rks.length <= 8)
    }
    // determinism: a second evaluation emits the identical pair set
    val again = FeaturePrep.qNegativeSampling(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(again == rows.map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet)
  }

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  /** Round to 6 dp the way both engines do (half away from zero). */
  private def vs6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
