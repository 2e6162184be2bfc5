package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** The trained-gate model family as a composable API — train once
  * (offline, over the reference corpus), score anywhere: the same
  * `scoreNb` call serves the batch audit queries
  * (graft.queries.QualityModelQueries q363/q365/q366) and the streaming
  * ingest path (score each micro-batch of arriving documents against the
  * FROZEN model inside `foreachBatch` — scoring is stateless per doc, so
  * incremental scoring needs no cross-batch state and equals the batch
  * run by construction; StreamingSpec pins that equality).
  *
  * Model tables are VOCAB-scale (one row per training token), never
  * corpus-scale; `totals` is one row. At 100 TB the model is written
  * once as a table and broadcast at score time — exactly what the
  * `broadcast(totals)` hint and the vocab-keyed join here do locally.
  *
  * Float discipline (the q350/q115 lattice): every ln runs on a ratio of
  * integer-exact doubles and floors onto the e6 grid per TOKEN, before
  * the per-doc sum — so scores are exact int64 and a DuckDB oracle
  * hash-matches them. */
object QualityModels {

  private def dbl(c: Column): Column = c.cast("double")

  private def lnE6(num: Column, den: Column): Column =
    floor(log(num / den) * lit(1000000.0) + lit(0.5)).cast("long")

  /** Train the multinomial NB reference-vs-rest model.
    * @param train  training documents
    * @param textCol whitespace-tokenizable text column
    * @param labelCol 0/1 long column (1 = reference class)
    * @return (model(tok, c_pos, c_neg),
    *          totals(n_pos, n_neg, v, d_pos, d_neg)) — vocab-scale and
    *          1-row respectively. */
  def trainNb(train: DataFrame, textCol: String,
      labelCol: String): (DataFrame, DataFrame) = {
    val model = train
      .select(col(labelCol).as("y"),
        explode(TextAnalysis.tokensCol(col(textCol))).as("tok"))
      .groupBy("tok")
      .agg(sum("y").as("c_pos"), (count(lit(1)) - sum("y")).as("c_neg"))
    val totals = model
      .agg(sum("c_pos").as("n_pos"), sum("c_neg").as("n_neg"),
        count(lit(1)).as("v"))
      .crossJoin(train.agg(sum(col(labelCol)).as("d_pos"),
        (count(lit(1)) - sum(col(labelCol))).as("d_neg")))
    (model, totals)
  }

  /** Score documents against a frozen NB model: keyCols plus the exact
    * e6 log-odds score (sum of per-token Laplace llr on the e6 lattice
    * plus the e6 class prior). Works identically on a batch frame and on
    * a `foreachBatch` micro-batch — scoring is per-doc stateless. */
  def scoreNb(docsDf: DataFrame, keyCols: Seq[String], textCol: String,
      model: DataFrame, totals: DataFrame): DataFrame =
    docsDf
      .select(keyCols.map(col) :+
        explode(TextAnalysis.tokensCol(col(textCol))).as("tok"): _*)
      .join(model, Seq("tok"), "left")
      .crossJoin(broadcast(totals))
      .select(keyCols.map(col) :+
        lnE6(
          dbl(coalesce(col("c_pos"), lit(0L)) + lit(1L)) *
            dbl(col("n_neg") + col("v")),
          dbl(coalesce(col("c_neg"), lit(0L)) + lit(1L)) *
            dbl(col("n_pos") + col("v"))).as("llr_e6") :+
        lnE6(dbl(col("d_pos")), dbl(col("d_neg"))).as("prior_e6"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg((sum("llr_e6") + first("prior_e6")).as("score_e6"))
}
