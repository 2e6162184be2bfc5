package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.expressions.CosineSimilarity

/** Deterministic random-hyperplane sign-LSH over embeddings.
  *
  * Plane components are derived from md5 of a fixed seed string, so
  * signatures are reproducible across runs, engines, and cluster sizes —
  * no RNG state to ship to executors (the planes are tiny plan-time
  * literals), and the DuckDB oracle can re-derive the very same planes in
  * SQL ([[signatureSqlCtes]]) because both sides compute
  * `signed_int32(md5(seed)) / Int.MaxValue` with exact integer inputs and
  * one correctly-rounded division — bit-identical doubles by construction.
  *
  * Banding: the `numPlanes`-bit signature is split into bands of
  * `rowsPerBand` consecutive bits; two vectors are join candidates iff they
  * agree on at least one whole band. For a pair at angle θ the per-plane
  * agreement probability is p = 1 − θ/π, so candidate recall is
  * 1 − (1 − p^r)^B — r (rows per band) sets selectivity, B (bands) buys
  * recall. The engine's defaults (B=32, r=4) are sized for the weak
  * similarity regime of the synthetic corpus (cos ≈ 0.45 ⇒ p ≈ 0.65,
  * recall ≈ 0.999); production near-dup thresholds (cos ≥ 0.9 ⇒ p ≈ 0.86)
  * reach the same recall with far fewer, wider bands (e.g. B=16, r=8),
  * which is what makes the bucket join prune hard at 100 TB.
  *
  * Sign-bit robustness: the bit compares a dot product against zero, and
  * engines may disagree on the last ulp of the dot. Measured on the test
  * corpus the smallest |dot| against any plane is ~3e-7 — seven orders of
  * magnitude above accumulated rounding error — so a cross-engine bit flip
  * cannot occur (and the sign of `cosine_sim` equals the sign of the dot
  * exactly: IEEE division by the positive norm product preserves sign).
  */
object Lsh {

  /** A banded sign-LSH index geometry: `bands` bands of `rowsPerBand`
    * bits each over a `bands · rowsPerBand`-bit signature. */
  final case class BandGeometry(bands: Int, rowsPerBand: Int) {
    def totalBits: Int = bands * rowsPerBand
  }

  /** Corpus-size-derived band geometry at a FIXED signature width — the
    * mechanism behind the r17 sweep's occupancy adjudication (q378's
    * fixed-32×4 tail was the candidate-pair term ~N²/2^r; "production
    * re-tunes band bits" is this function, not prose): a band with r
    * bits has 2^r buckets, so the expected uniform bucket load is
    * N/2^r and random-collision candidate pairs grow ~N²/2^r per band.
    * The rule picks the SMALLEST r in {4, 8, 16} (divisors of the
    * 128-bit signature — smallest = widest-recall geometry that still
    * bounds occupancy) whose expected load N/2^r stays ≤ `targetLoad`,
    * falling back to the widest band when none qualifies; bands =
    * totalBits / r keeps the signature width (and the oracle's plane
    * family) constant, so re-tuning changes only how the SAME bits are
    * re-segmented. Recall trade, stated: wider bands prune harder and
    * lower recall at a fixed similarity threshold (1 − (1 − p^r)^B);
    * at production near-dup thresholds (cos ≥ 0.9 ⇒ p ≈ 0.86) r = 8
    * still clears 0.999 and r = 16 ≈ 0.53 — q380's tuning table is
    * what an operator reads to trade the two, and raising totalBits
    * buys recall back when the bar is higher. The declared queries pin
    * the DEFAULT geometry (32×4) for the oracle contract; deployments
    * apply this rule via `spark.graft.lsh.bands` /
    * `spark.graft.lsh.rowsPerBand` (read by
    * [[graft.queries.SimilarityQueries.lshScoredPairs]]), which is how
    * the scaling sweep's tuned sf~1 row runs. Spec-pinned equal to
    * q380's `chosen` column row-for-row (LshTuningSpec). */
  def tunedGeometry(nVectors: Long, totalBits: Int = 128,
      targetLoad: Long = 512L): BandGeometry = {
    val rs = Seq(4, 8, 16).filter(totalBits % _ == 0)
    val r = rs.find(r => nVectors <= targetLoad * (1L << r))
      .getOrElse(rs.last)
    BandGeometry(totalBits / r, r)
  }

  private def md5Int(s: String): Int = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    ((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) |
      ((d(2) & 0xff) << 8) | (d(3) & 0xff)
  }

  /** `numPlanes` hyperplanes of dimension `dim`, components in [-1, 1). */
  def hyperplanes(numPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(numPlanes, dim) { (h, j) =>
      md5Int(s"graft-lsh:$h:$j").toDouble / Int.MaxValue.toDouble
    }

  /** Array of band keys for `v`: element b is the `rowsPerBand`-bit string
    * of band b's planes, computed by the fused native expression
    * (graft.expressions.LshBandKeys — one flat-matrix loop per row; the
    * compositional per-plane form was ~100× slower, see its scaladoc).
    * Explode with `posexplode` so the band index rides along for free. */
  def bandKeysCol(v: Column, planes: Array[Array[Double]],
      bands: Int, rowsPerBand: Int): Column = {
    require(planes.length == bands * rowsPerBand, "plane count mismatch")
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.expressions.LshBandKeys(
        org.apache.spark.sql.GraftSqlBridge.expression(v),
        planes.map(_.toIndexedSeq).toIndexedSeq, rowsPerBand))
  }

  /** The banded-signature relation shared by the ANN and near-dup bucket
    * joins (q51/q44): `(idCol, band, bkey)` rows, one per (vector, band).
    * The input is spread over a PINNED partition count first: these
    * corpora arrive as few scan partitions, and the exchanges feeding the
    * downstream bucket joins are small enough that AQE's size-based
    * coalescing would otherwise funnel the work-amplifying join (and the
    * exact re-scoring behind it) into one task — user-pinned counts
    * (REPARTITION_BY_NUM) are exempt from coalescing. */
  def bandsDf(vectors: org.apache.spark.sql.DataFrame, idCol: String,
      vecCol: String, bands: Int, rowsPerBand: Int, dim: Int)
      : org.apache.spark.sql.DataFrame = {
    val planes = hyperplanes(bands * rowsPerBand, dim)
    val n = vectors.sparkSession.sessionState.conf.numShufflePartitions
    vectors.repartition(n)
      .select(col(idCol),
        posexplode(bandKeysCol(col(vecCol), planes, bands, rowsPerBand)))
      .toDF(idCol, "band", "bkey")
  }

  /** DuckDB CTE fragments re-deriving the SAME planes and signatures in
    * SQL, for oracle parity. Expects a prior CTE `e(vec_id, v DOUBLE[])`;
    * defines `planes(h, p)` and `sigs(vec_id, sig)`. */
  def signatureSqlCtes(numPlanes: Int, dim: Int): String =
    s"""planes AS (
       |  SELECT h, list(comp ORDER BY j) AS p FROM (
       |    SELECT h, j,
       |      (u - CASE WHEN u >= 2147483648 THEN 4294967296 ELSE 0 END)
       |        / 2147483647.0 AS comp
       |    FROM (
       |      SELECT h, j,
       |        CAST('0x' || substr(md5('graft-lsh:' || h || ':' || j), 1, 8)
       |          AS BIGINT) AS u
       |      FROM (SELECT unnest(generate_series(0, ${numPlanes - 1})) AS h),
       |           (SELECT unnest(generate_series(0, ${dim - 1})) AS j)))
       |  GROUP BY h),
       |sigs AS (
       |  SELECT vec_id,
       |    string_agg(CASE WHEN list_dot_product(v, p) >= 0
       |      THEN '1' ELSE '0' END, '' ORDER BY h) AS sig
       |  FROM e, planes GROUP BY vec_id)""".stripMargin

  /** DuckDB mirror of [[bandsExpr]]: `bands(vec_id, band, bkey)` from a
    * prior `sigs` CTE. */
  def bandsSqlCte(bands: Int, rowsPerBand: Int): String =
    s"""bands AS (
       |  SELECT vec_id, band, substr(sig, band * $rowsPerBand + 1, $rowsPerBand) AS bkey
       |  FROM sigs, (SELECT unnest(generate_series(0, ${bands - 1})) AS band) b)""".stripMargin
}
