package graft.ops

import graft.{Q, U}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.4 group F — global sort / limit and set operations. The
  * reference emits results in physical row order (`main.rs:126-137`); these
  * do ordering right: `orderBy.limit` plans as TakeOrderedAndProject (per-
  * partition top-k then a k-row merge on the driver — no global sort shuffle
  * at any scale).
  */
object SetOps {

  val qs: Seq[Q] = Seq(
    Q(
      "q_orderby_limit",
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin) {
      (s, d) =>
        U.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
          .orderBy(
            col("l_extendedprice").desc,
            col("l_orderkey"),
            col("l_linenumber"))
          .limit(100)
    },

    // UNION ALL preserves duplicates; aggregated so the result is compact
    // and deterministically ordered.
    Q(
      "q_union_all",
      """SELECT k, count(*) AS n FROM (
        |  SELECT o_custkey AS k FROM orders
        |  UNION ALL
        |  SELECT c_custkey AS k FROM customer) t
        |GROUP BY k ORDER BY k""".stripMargin) { (s, d) =>
      U.orders(s, d)
        .select(col("o_custkey").as("k"))
        .union(U.customer(s, d).select(col("c_custkey").as("k")))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"))
        .orderBy("k")
    },
    Q(
      "q_union_distinct",
      """SELECT o_custkey AS k FROM orders
        |UNION
        |SELECT c_custkey AS k FROM customer ORDER BY k""".stripMargin) { (s, d) =>
      U.orders(s, d)
        .select(col("o_custkey").as("k"))
        .union(U.customer(s, d).select(col("c_custkey").as("k")))
        .distinct()
        .orderBy("k")
    },
    Q(
      "q_intersect",
      """SELECT c_custkey AS k FROM customer
        |INTERSECT
        |SELECT o_custkey AS k FROM orders ORDER BY k""".stripMargin) { (s, d) =>
      U.customer(s, d)
        .select(col("c_custkey").as("k"))
        .intersect(U.orders(s, d).select(col("o_custkey").as("k")))
        .orderBy("k")
    },
    Q(
      "q_except",
      """SELECT c_custkey AS k FROM customer
        |EXCEPT
        |SELECT o_custkey AS k FROM orders ORDER BY k""".stripMargin) { (s, d) =>
      U.customer(s, d)
        .select(col("c_custkey").as("k"))
        .except(U.orders(s, d).select(col("o_custkey").as("k")))
        .orderBy("k")
    }
  )
}
