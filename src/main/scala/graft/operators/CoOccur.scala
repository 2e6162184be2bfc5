package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket pair mining as a reusable operator (the q128 shape):
  * items co-occurring in the same basket at least `minSupport` times —
  * candidate generation for frequent-itemset mining and the
  * co-occurrence statistic behind item-item recommenders.
  *
  * ONE scan: each basket's distinct items collect to a sorted array
  * (agg buffer O(basket), not O(basket²)), the basket-size cap bounds
  * pair fan-out at C(maxBasket, 2) — so one pathological mega-basket
  * contributes NOTHING instead of quadratically exploding a reducer
  * (CoOccurSpec pins exactly that) — and ordered pairs expand via
  * codegen'd array lambdas. groupBy → explode → groupBy: two exchanges.
  */
object CoOccur {

  /** (item_a, item_b, n_baskets) with item_a < item_b, support ≥
    * `minSupport`, from baskets of ≤ `maxBasket` distinct items. */
  def pairs(df: DataFrame, basketCol: String, itemCol: String,
      maxBasket: Int = 8, minSupport: Long = 2): DataFrame = {
    val baskets = df
      .groupBy(col(basketCol))
      .agg(sort_array(collect_set(col(itemCol))).as("__items"))
      .filter(size(col("__items")) <= maxBasket)
    val expand = flatten(transform(col("__items"), (x, i) =>
      transform(
        slice(col("__items"), i + lit(2), size(col("__items"))),
        y => struct(x.as("item_a"), y.as("item_b")))))
    baskets
      .select(explode(expand).as("__p"))
      .groupBy(col("__p.item_a").as("item_a"),
        col("__p.item_b").as("item_b"))
      .agg(count(lit(1)).as("n_baskets"))
      .filter(col("n_baskets") >= minSupport)
  }
}
