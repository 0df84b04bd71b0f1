package graft

import org.apache.spark.sql.functions._

/** Property verification for the hash-dependent (no-oracle) operators
  * (SURVEY.md §2.4 I, §5.2.3): the probabilistic/approximate paths are
  * checked against their exact counterparts on real testdata.
  */
class DedupSimSpec extends SparkSpec {

  test("minhash near-dup pairs at 0.8 match exact n-gram Jaccard pairs at 0.8") {
    // Both queries end with an exact-Jaccard verify; at jaccard >= 0.8 the
    // LSH banding (8 bands x 4 rows) has >= 1-(1-0.8^4)^8 ~ 98% recall per
    // pair; the sf0.001 corpus's near-dups are planted at ~0.9+, where
    // recall is ~1 - so the candidate pruning must not lose any pair.
    val exact = SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sfDir)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("q_dedup_near_minhash")(spark, sfDir)
      .filter(col("jaccard") >= 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact)
  }

  test("minhash pairs are a superset check: every reported pair really has jaccard >= 0.7") {
    val pairs = SparkEntry.queries("q_dedup_near_minhash")(spark, sfDir).collect()
    assert(pairs.forall(_.getAs[Double]("jaccard") >= 0.7))
  }

  test("simhash near-dup: hamming <= 3 and symmetric-free (a < b)") {
    val rows = SparkEntry.queries("q_dedup_simhash")(spark, sfDir).collect()
    assert(rows.forall(r => r.getAs[Long]("hamming") <= 3))
    assert(rows.forall(r => r.getAs[Long]("a") < r.getAs[Long]("b")))
  }

  test("exact dedup canonical ids: one row per distinct text, copies sum to corpus size") {
    val out = SparkEntry.queries("q_dedup_exact")(spark, sfDir)
    val total = out.agg(sum("n_copies")).head().getLong(0)
    val corpus = U.documents(spark, sfDir).count()
    assert(total === corpus)
    assert(out.select("text_md5").distinct().count() === out.count())
  }

  test("ANN LSH top-k cosines are genuine cosines from the brute-force ranking") {
    val brute = SparkEntry.queries("q_sim_topk")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos_sim")).toMap
    val ann = SparkEntry.queries("q_sim_ann_lsh")(spark, sfDir).collect()
    // every ANN result's cosine must equal the brute-force cosine for that id
    // when that id appears in the brute-force top-20
    ann.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      brute.get(id).foreach(c => assert(math.abs(c - r.getAs[Double]("cos_sim")) < 1e-9))
    }
    assert(ann.nonEmpty)
  }

  test("approx quantiles bracket the exact quantiles") {
    val approx = SparkEntry.queries("q_agg_approx_quantile")(spark, sfDir)
      .collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p95"))).toMap
    val li = U.lineitem(spark, sfDir)
    approx.foreach { case (k, (p50, p95)) =>
      val vals = li.filter(col("l_returnflag") === k)
        .select("l_extendedprice").collect().map(_.getDouble(0)).sorted
      def exact(q: Double) = vals(math.min(vals.length - 1, (q * vals.length).toInt))
      // GK sketch with accuracy 1000 -> rank error <= n/1000; generous bound
      assert(math.abs(p50 - exact(0.5)) / exact(0.5) < 0.05, s"$k p50 $p50 vs ${exact(0.5)}")
      assert(math.abs(p95 - exact(0.95)) / exact(0.95) < 0.05, s"$k p95 $p95 vs ${exact(0.95)}")
    }
  }

  test("approx_count_distinct within rsd bound of exact") {
    val approx = SparkEntry.queries("q_agg_approx_distinct")(spark, sfDir)
      .collect().map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("approx_parts")).toMap
    val exact = U.lineitem(spark, sfDir)
      .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n")).toMap
    exact.foreach { case (k, n) =>
      val a = approx(k).toDouble
      assert(math.abs(a - n) / n < 0.10, s"group $k: approx $a vs exact $n")
    }
  }
}
