package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.expressions.CosineSimilarity
import graft.functions.Rounding.roundf

/** The user-facing ANN API: "top-k most similar corpus vectors for each
  * query vector", with the candidate-generation strategy as a parameter —
  * the composed form of the q50/q51/q56 oracle-checked queries.
  *
  * All strategies share the exact cosine re-rank (native codegen'd
  * [[CosineSimilarity]], 4-decimal grid ordering with id tiebreak — the
  * cross-engine-deterministic ranking rule); they differ only in which
  * (query, candidate) pairs reach it:
  *
  *  - [[Brute]]: every pair. Exact; the query set must be small enough to
  *    broadcast (it is the ONLY thing broadcast — the corpus never moves).
  *  - [[BandLsh]]: sign-LSH band buckets; candidates share ≥ 1 band with
  *    the query. The corpus-side band table shuffles on (band, bucket) —
  *    the 100 TB path when queries are bounded but the corpus is not.
  *  - [[IvfProbe]]: bounded deterministic centroids ([[Ivf]]); each
  *    vector lives in its nearest cell, queries probe their nprobe
  *    nearest cells. The centroid table is capped regardless of corpus
  *    size, so both assignment passes are broadcast joins.
  *
  * Recall characteristics and parameter guidance live in the
  * SimilarityQueries scaladoc; SimilaritySpec pins recall ≥ 0.8 for the
  * approximate strategies on the test corpus.
  */
object SimilaritySearch {

  sealed trait Method
  case object Brute extends Method
  /** bands × rowsPerBand sign bits; dim must match the vector length. */
  final case class BandLsh(bands: Int = 32, rowsPerBand: Int = 4,
      dim: Int = 64) extends Method
  /** Hash-rate centroid sampling (1-in-rate, hard cap), nprobe cells. */
  final case class IvfProbe(rate: Int = 31, cap: Int = 4096,
      nprobe: Int = 6) extends Method
  /** Product-quantization ADC scan: m per-subspace codebooks (k
    * centroids each, deterministic fixed-point [[KMeans]]) compress each
    * corpus vector to m small code ids; every (query, vector) pair is
    * then scored with m integer TABLE LOOKUPS (the query's precomputed
    * per-centroid distance tables ride along as broadcast maps) instead
    * of a dim-wide dot product, and only the `shortlist` best pairs per
    * query reach the exact re-rank. The asymmetric-distance scan of
    * IVF-PQ: the corpus is read as codes (m ints, not dim floats — the
    * compression that makes a 100 TB corpus scannable), nothing big is
    * ever broadcast, and the ADC ordering is exact integer arithmetic so
    * the shortlist is deterministic. Recall depends on codebook fit;
    * raise `shortlist` (or m) to trade scan cost for recall. */
  final case class PqAdc(m: Int = 8, kCodes: Int = 16, iters: Int = 2,
      shortlist: Int = 128, dim: Int = 64) extends Method
  /** IVF-PQ — the billion-scale index architecture (FAISS's workhorse):
    * IVF cells bound WHICH vectors are scanned (queries probe their
    * nprobe nearest cells), PQ codes bound HOW MUCH each scanned vector
    * costs (m table lookups, not a dim-wide dot product), and the exact
    * re-rank bounds the error of both. Encodes raw vectors, not
    * residuals — deterministic fixed-point codebooks shared corpus-wide;
    * the residual refinement is a recall/size trade documented, not
    * implemented. State scales as corpus·m codes + capped centroids;
    * per-query cost as (probed fraction)·m lookups. */
  final case class IvfPq(rate: Int = 31, cap: Int = 4096, nprobe: Int = 8,
      m: Int = 8, kCodes: Int = 16, iters: Int = 2,
      shortlist: Int = 128, dim: Int = 64) extends Method

  /** Top-k per query: (qIdCol, idCol, cos, rank), rank 1-based by
    * (cos desc, id).
    *
    * `excludeSelf = true` (the default) drops corpus rows whose id
    * EQUALS the query id — correct when the queries are drawn from the
    * corpus itself (the q50/q51/q56 convention). Pass `false` when the
    * query id space is unrelated to the corpus id space: with the
    * default, an external query whose id happens to collide with a
    * corpus id would silently lose that corpus vector from its top-k. */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, qIdCol: String, k: Int = 10,
      method: Method = Brute, excludeSelf: Boolean = true): DataFrame = {
    val e = corpus.select(col(idCol), col(vecCol).as("__v"))
    val qv = queries.select(col(qIdCol).as("__qid"), col(vecCol).as("__qv"))
    val cand: DataFrame = method match {
      case Brute =>
        e.crossJoin(broadcast(qv))
      case BandLsh(bands, rowsPerBand, dim) =>
        val cb = Lsh.bandsDf(e, idCol, "__v", bands, rowsPerBand, dim)
        val qb = Lsh.bandsDf(
          qv.select(col("__qid"), col("__qv")), "__qid", "__qv",
          bands, rowsPerBand, dim)
        cb.join(broadcast(qb), Seq("band", "bkey"))
          .select(col(idCol), col("__qid")).distinct()
          .join(e, idCol)
          .join(broadcast(qv), "__qid")
      case IvfProbe(rate, cap, nprobe) =>
        ivfPairs(e, qv, idCol, rate, cap, nprobe)
          .join(e, idCol)
          .join(broadcast(qv), "__qid")
          .select(col(idCol), col("__v"), col("__qid"), col("__qv"))
      case PqAdc(m, kc, iters, shortlist, dim) =>
        val (codes, qTables, adc) = pqIndex(e, qv, idCol, m, kc, iters, dim)
        adcShortlist(
          codes.crossJoin(broadcast(qTables))
            .select(col("vid"), col("__qid"), adc.as("__adc")),
          e, qv, idCol, shortlist)
      case IvfPq(rate, cap, nprobe, m, kc, iters, shortlist, dim) =>
        val (codes, qTables, adc) = pqIndex(e, qv, idCol, m, kc, iters, dim)
        val pairs = ivfPairs(e, qv, idCol, rate, cap, nprobe)
          .select(col(idCol).as("vid"), col("__qid"))
        adcShortlist(
          pairs.join(codes, "vid")
            .join(broadcast(qTables), "__qid")
            .select(col("vid"), col("__qid"), adc.as("__adc")),
          e, qv, idCol, shortlist)
    }
    val w = Window.partitionBy("__qid")
      .orderBy(col("cos").desc, col(idCol))
    val paired =
      if (excludeSelf) cand.filter(col(idCol) =!= col("__qid")) else cand
    paired
      .select(col("__qid"), col(idCol),
        roundf(CosineSimilarity.sim(col("__v"), col("__qv")), 4).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("__qid").as(qIdCol), col(idCol), col("cos"), col("rank"))
      .orderBy(qIdCol, "rank")
  }

  /** (idCol, __qid) candidate pairs via IVF cell probing: every corpus
    * vector lives in its nearest of the capped centroid set; each query
    * probes its nprobe nearest cells. Both assignment passes broadcast
    * only the capped centroids. */
  private def ivfPairs(e: DataFrame, qv: DataFrame, idCol: String,
      rate: Int, cap: Int, nprobe: Int): DataFrame = {
    val cent = Ivf.selectCentroids(
      e.select(col(idCol), col("__v").as("v")), idCol, "v", rate, cap)
    val wAssign = Window.partitionBy(idCol)
      .orderBy(col("__ccos").desc, col("c_id"))
    val assigned = e.crossJoin(broadcast(cent))
      .select(col(idCol), col("c_id"),
        roundf(CosineSimilarity.sim(col("__v"), col("cv")), 4)
          .as("__ccos"))
      .withColumn("__rn", row_number().over(wAssign))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("c_id"))
    val wProbe = Window.partitionBy("__qid")
      .orderBy(col("__qcos").desc, col("c_id"))
    val probes = qv.crossJoin(broadcast(cent))
      .select(col("__qid"), col("c_id"),
        roundf(CosineSimilarity.sim(col("__qv"), col("cv")), 4)
          .as("__qcos"))
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nprobe)
      .select(col("__qid"), col("c_id"))
    assigned.join(broadcast(probes), Seq("c_id"))
      .select(col(idCol), col("__qid"))
  }

  /** PQ index pieces: the corpus as an m-code table keyed `vid`, the
    * per-query broadcastable distance-lookup tables keyed `__qid`, and
    * the ADC scoring column (m integer map lookups) that joins them. */
  private def pqIndex(e: DataFrame, qv: DataFrame, idCol: String,
      m: Int, kc: Int, iters: Int, dim: Int)
      : (DataFrame, DataFrame, Column) = {
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val sub = dim / m
    // independent per-subspace fits train on concurrent driver threads
    // (each is deterministic, so the composed index is too)
    val fits = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      Await.result(Future.sequence((0 until m).toList.map { j =>
        Future {
          val sv = e.select(col(idCol),
            slice(col("__v"), j * sub + 1, sub).as("sv"))
          KMeans.fit(sv, idCol, "sv", sub, kc, iters)
        }
      }), Duration.Inf)
    }
    val codes = fits.zipWithIndex.map { case ((_, asg), j) =>
      asg.select(col("vid"), col("cid").as(s"__c$j"))
    }.reduce(_.join(_, "vid"))
    val dts = fits.zipWithIndex.map { case ((cents, _), j) =>
      qv.select(col("__qid"),
          KMeans.quantize(slice(col("__qv"), j * sub + 1, sub),
            1000000.0).as("__qq"))
        .crossJoin(broadcast(cents))
        .select(col("__qid"), col("cid"),
          KMeans.sqDist(col("__qq"), col("cq")).as("d"))
        .groupBy("__qid")
        .agg(map_from_entries(
          collect_list(struct(col("cid"), col("d"))))
          .as(s"__dt$j"))
    }
    val qTables = dts.reduce(_.join(_, "__qid"))
    val adc = (0 until m).map(j =>
      element_at(col(s"__dt$j"), col(s"__c$j"))).reduce(_ + _)
    (codes, qTables, adc)
  }

  /** Keep the `shortlist` best ADC pairs per query (rank pushdown makes
    * this a per-partition heap, not a global sort) and reattach the real
    * vectors for the exact re-rank. */
  private def adcShortlist(scored: DataFrame, e: DataFrame, qv: DataFrame,
      idCol: String, shortlist: Int): DataFrame = {
    val wAdc = Window.partitionBy("__qid").orderBy(col("__adc"), col("vid"))
    scored
      .withColumn("__rn", row_number().over(wAdc))
      .filter(col("__rn") <= shortlist)
      .select(col("vid").as(idCol), col("__qid"))
      .join(e, idCol)
      .join(broadcast(qv), "__qid")
      .select(col(idCol), col("__v"), col("__qid"), col("__qv"))
  }
}
