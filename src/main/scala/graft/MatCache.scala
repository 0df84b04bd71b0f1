package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.util.concurrent.ConcurrentHashMap

/** Session-scoped materialization cache for the small derived frames the
  * operator families share: the near-dup pair graph (consumed by
  * ngram-jaccard, triangles, PageRank, and connected components) and the
  * trained IVF / PQ codebooks (consumed by the ANN family and SemDeDup).
  *
  * This is the "materialize the index once for the whole family" discipline
  * a production deployment runs as an offline job — expressed engine-side,
  * so four graph queries in one session pay the inverted-index pipeline
  * ONCE instead of four times. Only node-sized artifacts belong here (pair
  * lists, 16..64-row codebooks, each already localCheckpoint'd by its
  * builder); corpus-sized frames must never be cached — the memory cost
  * would scale with the data, not the schema.
  *
  * Keyed by (session identity, builder key): a DataFrame is only valid in
  * the session that built it, and tests that run the same builder against
  * fixture directories get distinct entries per directory.
  */
object MatCache {
  private val m = new ConcurrentHashMap[(Int, String), DataFrame]()

  def df(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    m.computeIfAbsent((System.identityHashCode(s), key), _ => build)
}
