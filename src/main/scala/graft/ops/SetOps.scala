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
    },

    // Bag semantics: INTERSECT ALL keeps min(multiplicity), EXCEPT ALL
    // subtracts multiplicities — the SQL-standard ALL variants the distinct
    // forms above don't cover. Aggregated to (k, n) so output is compact
    // and deterministically ordered at any SF.
    Q(
      "q_intersect_all",
      """SELECT k, count(*) AS n FROM (
        |  SELECT o_custkey AS k FROM orders
        |  INTERSECT ALL
        |  SELECT c_custkey AS k FROM customer) t
        |GROUP BY k ORDER BY k""".stripMargin) { (s, d) =>
      U.orders(s, d)
        .select(col("o_custkey").as("k"))
        .intersectAll(U.customer(s, d).select(col("c_custkey").as("k")))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"))
        .orderBy("k")
    },
    Q(
      "q_except_all",
      """SELECT k, count(*) AS n FROM (
        |  SELECT o_custkey AS k FROM orders
        |  EXCEPT ALL
        |  SELECT c_custkey AS k FROM customer) t
        |GROUP BY k ORDER BY k""".stripMargin) { (s, d) =>
      U.orders(s, d)
        .select(col("o_custkey").as("k"))
        .exceptAll(U.customer(s, d).select(col("c_custkey").as("k")))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"))
        .orderBy("k")
    },

    // Position-independent union: UNION ALL BY NAME aligns columns by NAME
    // (schema-evolution-friendly append — the column-order bug in plain
    // positional UNION simply can't happen). Missing columns null-fill via
    // allowMissingColumns, mirrored by DuckDB's BY NAME semantics.
    Q(
      "q_union_byname",
      """SELECT k, src, count(*) AS n FROM (
        |  SELECT o_custkey AS k, 'o' AS src FROM orders
        |  UNION ALL BY NAME
        |  SELECT 'c' AS src, c_custkey AS k FROM customer) t
        |GROUP BY k, src ORDER BY k, src""".stripMargin) { (s, d) =>
      U.orders(s, d)
        .select(col("o_custkey").as("k"), lit("o").as("src"))
        .unionByName(
          U.customer(s, d).select(lit("c").as("src"), col("c_custkey").as("k")),
          allowMissingColumns = true)
        .groupBy(col("k"), col("src"))
        .agg(count(lit(1)).as("n"))
        .orderBy("k", "src")
    }
  )
}
