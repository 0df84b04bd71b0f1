package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

/** Salted aggregation correctness: identical results to the direct groupBy
  * on a deliberately skewed frame (one key holding ~90% of rows), and the
  * partial stage really fans the hot key over multiple salt shards.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = {
    val hot = (1 to 9000).map(i => ("hot", i.toDouble))
    val cold = (1 to 1000).map(i => (s"k${i % 50}", i.toDouble))
    (hot ++ cold).toDF("k", "v")
  }

  test("saltedStats equals direct groupBy on a skewed frame") {
    val salted = Skew.saltedStats(skewed, col("k"), col("v"))
      .orderBy("key").collect()
    val direct = skewed.groupBy(col("k").as("key"))
      .agg(
        sum(col("v").cast(U.Dec)).cast("double").as("sum_value"),
        count(lit(1)).as("n_rows"),
        (sum(col("v").cast(U.Dec)).cast("double") / count(lit(1))).as("avg_value"))
      .orderBy("key").collect()
    assert(salted.length === direct.length)
    salted.zip(direct).foreach { case (s, d) =>
      assert(s.getString(0) === d.getString(0))
      assert(s.getDouble(1) === d.getDouble(1))
      assert(s.getLong(2) === d.getLong(2))
      assert(math.abs(s.getDouble(3) - d.getDouble(3)) < 1e-9)
    }
  }

  test("the hot key spreads over multiple salt shards in the partial stage") {
    val shards = skewed
      .withColumn("__salt", pmod(xxhash64(col("v")), lit(16L)))
      .filter(col("k") === "hot")
      .select("__salt").distinct().count()
    assert(shards > 8, s"hot key landed on only $shards of 16 shards")
  }
}
