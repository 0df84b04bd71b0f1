package graft.ops

import graft.{Q, U}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.4 group G — scalar function families (string / date / math /
  * JSON / array). The reference's only scalar computation is two comparisons
  * (`main.rs:131-134,398`); these exercise each built-in family end to end.
  * Everything stays inside whole-stage codegen — no UDFs.
  *
  * Output normalization for the DuckDB oracle: ints → BIGINT, timestamps →
  * epoch micros, booleans → 0/1 BIGINT, natural-log and friends rounded.
  */
object FnOps {

  val qs: Seq[Q] = Seq(
    Q(
      "q_fn_string",
      """SELECT c_custkey,
        |  upper(c_name) AS uname,
        |  substring(c_name, 1, 8) AS prefix8,
        |  c_mktsegment || '-' || c_name AS seg_name,
        |  CAST(length(c_name) AS BIGINT) AS name_len,
        |  CAST(CASE WHEN c_name LIKE '%1%' THEN 1 ELSE 0 END AS BIGINT) AS has_one,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS digits
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      U.customer(s, d)
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("uname"),
          substring(col("c_name"), 1, 8).as("prefix8"),
          concat(col("c_mktsegment"), lit("-"), col("c_name")).as("seg_name"),
          length(col("c_name")).cast("long").as("name_len"),
          when(col("c_name").like("%1%"), 1L).otherwise(0L).as("has_one"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"))
        .orderBy("c_custkey")
    },

    Q(
      "q_fn_date",
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  CAST(day(o_orderdate) AS BIGINT) AS dy,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  epoch_us(date_trunc('month', o_orderdate)) AS month_start_us,
        |  epoch_us(o_orderdate + INTERVAL 7 DAY) AS plus7_us,
        |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      U.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dy"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          unix_micros(date_trunc("month", col("o_orderdate")))
            .as("month_start_us"),
          unix_micros(col("o_orderdate") + expr("INTERVAL 7 DAYS"))
            .as("plus7_us"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy("o_orderkey")
    },

    Q(
      "q_fn_math",
      """SELECT l_orderkey, l_linenumber,
        |  round(abs(l_extendedprice - 1000.0), 2) AS absv,
        |  round(ln(l_extendedprice), 6) AS lnv,
        |  round(power(l_quantity, 2), 2) AS sqv,
        |  round(sqrt(l_extendedprice), 6) AS sqrtv,
        |  CAST(ceil(l_discount * 100) AS BIGINT) AS ceilv,
        |  CAST(floor(l_discount * 100) AS BIGINT) AS floorv
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      U.lineitem(s, d)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          round(abs(col("l_extendedprice") - 1000.0), 2).as("absv"),
          round(log(col("l_extendedprice")), 6).as("lnv"),
          round(pow(col("l_quantity"), 2), 2).as("sqv"),
          round(sqrt(col("l_extendedprice")), 6).as("sqrtv"),
          ceil(col("l_discount") * 100).cast("long").as("ceilv"),
          floor(col("l_discount") * 100).cast("long").as("floorv"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // JSON extraction from the events.props wire-format string — the
    // reference's HTTP ingest body (main.rs:329) interpreted server-side.
    Q(
      "q_fn_json",
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      U.events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("long").as("k_num"))
        .orderBy("event_id")
    },

    // Higher-order array functions over the embedding vectors.
    Q(
      "q_fn_array",
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  round(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
        |  round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 6) AS l2_norm,
        |  CAST(len(list_filter(embedding, x -> x > 0.1)) AS BIGINT) AS n_big
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      U.embeddings(s, d)
        .select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 6)
            .as("first_elem"),
          round(sqrt(graft.functions.VecDot.vecDot(col("embedding"), col("embedding"))), 6)
            .as("l2_norm"),
          size(filter(col("embedding"), x => x > 0.1)).cast("long").as("n_big"))
        .orderBy("vec_id")
    },

    // Regex family: capture-group extraction + boolean match. The pattern
    // set stays in the RE2 ∩ java.util.regex common dialect (classes,
    // groups, alternation, anchors) so Spark and the DuckDB oracle agree;
    // pure codegen'd per-row scan, zero shuffle.
    Q(
      "q_fn_regex",
      """SELECT o_orderkey,
        |  regexp_extract(o_orderpriority, '([0-9])-([A-Z]+)', 1) AS prio_num,
        |  regexp_extract(o_orderpriority, '([0-9])-([A-Z]+)', 2) AS prio_word,
        |  regexp_matches(o_orderpriority, 'URGENT|HIGH') AS is_hot
        |FROM orders WHERE o_orderkey % 10 = 0 ORDER BY o_orderkey""".stripMargin) {
      (s, d) =>
        U.orders(s, d)
          .filter(col("o_orderkey") % 10 === 0)
          .select(
            col("o_orderkey"),
            regexp_extract(col("o_orderpriority"), "([0-9])-([A-Z]+)", 1)
              .as("prio_num"),
            regexp_extract(col("o_orderpriority"), "([0-9])-([A-Z]+)", 2)
              .as("prio_word"),
            col("o_orderpriority").rlike("URGENT|HIGH").as("is_hot"))
          .orderBy("o_orderkey")
    },

    // Bitwise family: and/or/xor/shifts/popcount on BIGINT keys — the
    // primitives behind hash partitioning, bloom probes, and bitmap
    // indexes. Pure codegen'd scan, zero shuffle.
    Q(
      "q_fn_bitwise",
      """SELECT o_orderkey,
        |  CAST(o_orderkey & 255 AS BIGINT) AS k_and,
        |  CAST(o_orderkey | 4096 AS BIGINT) AS k_or,
        |  CAST(xor(o_orderkey, o_custkey) AS BIGINT) AS k_xor,
        |  CAST(o_orderkey << 3 AS BIGINT) AS k_shl,
        |  CAST(o_orderkey >> 2 AS BIGINT) AS k_shr,
        |  CAST(bit_count(o_orderkey) AS BIGINT) AS k_pop
        |FROM orders WHERE o_orderkey % 7 = 0 ORDER BY o_orderkey""".stripMargin) {
      (s, d) =>
        U.orders(s, d)
          .filter(col("o_orderkey") % 7 === 0)
          .select(
            col("o_orderkey"),
            col("o_orderkey").bitwiseAND(255).as("k_and"),
            col("o_orderkey").bitwiseOR(4096).as("k_or"),
            col("o_orderkey").bitwiseXOR(col("o_custkey")).as("k_xor"),
            shiftleft(col("o_orderkey"), 3).as("k_shl"),
            shiftright(col("o_orderkey"), 2).as("k_shr"),
            bit_count(col("o_orderkey")).cast("long").as("k_pop"))
          .orderBy("o_orderkey")
    },

    // Edit distance (plain unweighted Levenshtein — identical definitions in
    // Spark and DuckDB) over a bounded candidate set of short part names.
    // Pairwise edit distance is O(|a|·|b|) per pair and O(n²) pairs, so at
    // scale the candidate set ALWAYS comes from a blocking stage first
    // (LSH buckets / shared tokens, as in the dedup family); this operator
    // is the verifier that runs inside each small block.
    Q(
      "q_fn_levenshtein",
      """SELECT a.p_partkey AS pa, b.p_partkey AS pb,
        |  a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM part a JOIN part b ON a.p_partkey < b.p_partkey
        |WHERE a.p_partkey <= 60 AND b.p_partkey <= 60
        |  AND levenshtein(a.p_name, b.p_name) <= 6
        |ORDER BY pa, pb""".stripMargin) { (s, d) =>
      val pa = U.part(s, d)
        .filter(col("p_partkey") <= 60)
        .select(col("p_partkey").as("pa"), col("p_name").as("name_a"))
      val pb = U.part(s, d)
        .filter(col("p_partkey") <= 60)
        .select(col("p_partkey").as("pb"), col("p_name").as("name_b"))
      pa.join(
          broadcast(pb),
          col("pa") < col("pb") &&
            levenshtein(col("name_a"), col("name_b")) <= 6)
        .select(
          col("pa"),
          col("pb"),
          col("name_a"),
          col("name_b"),
          levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
        .orderBy("pa", "pb")
    }
  )
}
