package graft.operators

import graft.SparkSuite

/** The co-occurrence miner on known baskets: correct ordered pairs and
  * support filtering, duplicate items collapsed, and the basket cap's
  * whole point — a mega-basket contributes nothing instead of C(n,2)
  * pair rows. */
class CoOccurSpec extends SparkSuite {
  import spark.implicits._

  test("counts ordered pairs with support, collapsing duplicate items") {
    val df = Seq(
      (1L, "a"), (1L, "b"), (1L, "b"), (1L, "c"), // dup b collapses
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"), (3L, "d"),
      (4L, "c"), (4L, "d")
    ).toDF("basket", "item")
    val got = CoOccur.pairs(df, "basket", "item",
        maxBasket = 8, minSupport = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    // (a,b) appears in baskets 1,2,3; everything else is support 1
    assert(got == Set(("a", "b", 3L)))
  }

  test("a mega-basket past the cap contributes zero pairs") {
    val mega = (0 until 10000).map(i => (99L, s"i$i"))
    val small = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"))
    val df = (mega ++ small).toDF("basket", "item")
    val got = CoOccur.pairs(df, "basket", "item",
      maxBasket = 8, minSupport = 2)
    // only the small baskets' (x, y) survives; the 10k-item basket —
    // which would have produced ~50M pair rows — is capped out entirely
    assert(got.collect().map(r => (r.getString(0), r.getString(1)))
      .toSeq == Seq(("x", "y")))
  }
}
