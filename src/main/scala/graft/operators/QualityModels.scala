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
    (model, nbTotals(model, train, labelCol))
  }

  /** The NB totals row derived from a model table plus the train frame.
    * Split out of [[trainNb]] so a caller that MATERIALIZES the model
    * (localCheckpoint/table write) can derive the counts half of totals
    * from the materialized frame instead of replaying the corpus-scale
    * token explode a second time; d_pos/d_neg still come from the train
    * split (a doc-scale scan, not the explode). */
  def nbTotals(model: DataFrame, train: DataFrame,
      labelCol: String): DataFrame =
    model
      .agg(sum("c_pos").as("n_pos"), sum("c_neg").as("n_neg"),
        count(lit(1)).as("v"))
      .crossJoin(train.agg(sum(col(labelCol)).as("d_pos"),
        (count(lit(1)) - sum(col(labelCol))).as("d_neg")))

  /** Per-doc lead bigrams of a tokenized text column — the q321/q329
    * construction (doc-keyed window, never a global sort). */
  private def bigrams(df: DataFrame, keyCols: Seq[String],
      textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.head).orderBy("pos")
    df.select(keyCols.map(col) :+
        posexplode(TextAnalysis.tokensCol(col(textCol)))
          .as(Seq("pos", "tok")): _*)
      .withColumn("w2", lead("tok", 1).over(w))
      .filter(col("w2").isNotNull)
      .select(keyCols.map(col) :+ col("tok").as("w1") :+ col("w2"): _*)
  }

  /** Train the add-one bigram LM on a reference corpus.
    * @return (big(w1, w2, c12), ctx(w1, c1), vocab(v)) — bigram counts,
    *         context counts (c1 = Σ_w2 c12), and the 1-row unigram-type
    *         count; all vocab-scale or smaller. */
  def trainLm(ref: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame, DataFrame) = {
    val big = bigrams(ref, Seq(idCol), textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val ctx = big.groupBy("w1").agg(sum("c12").as("c1"))
    val vocab = ref
      .select(explode(TextAnalysis.tokensCol(col(textCol))).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    (big, ctx, vocab)
  }

  /** Score documents against a frozen LM: keyCols plus the exact e6 mean
    * per-bigram negative log-probability (add-one smoothing,
    * nll = ln((c1+V)/(c12+1)) per bigram on the e6 lattice; the mean is
    * the exact truncating division of non-negative longs). Docs with no
    * bigram (< 2 tokens) are not scorable and emit no row. The first
    * keyCol must identify the document (it keys the bigram window).
    * Stateless per doc — identical on a batch frame and a foreachBatch
    * micro-batch. */
  def scoreLm(docsDf: DataFrame, keyCols: Seq[String], textCol: String,
      big: DataFrame, ctx: DataFrame, vocab: DataFrame): DataFrame =
    bigrams(docsDf, keyCols, textCol)
      .join(big, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(keyCols.map(col) :+
        lnE6(dbl(coalesce(col("c1"), lit(0L)) + col("v")),
          dbl(coalesce(col("c12"), lit(0L)) + lit(1L))).as("nll_e6"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(graft.functions.Rounding
        .intDiv(sum("nll_e6"), count(lit(1))).as("ce_e6"))

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
