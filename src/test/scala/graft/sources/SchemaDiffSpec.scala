package graft.sources

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The schema-evolution audit on known evolutions: adds, drops, retypes,
  * nested paths, array elements, and the additive-only compatibility
  * verdict. Pure metadata — no Spark session needed. */
class SchemaDiffSpec extends AnyFunSuite {
  import SchemaDiff._

  private val v1 = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("price", DoubleType),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("ts", TimestampType)))),
    StructField("tags", ArrayType(StructType(Seq(
      StructField("k", StringType), StructField("v", StringType)))))))

  test("identical schemas diff to nothing and are compatible") {
    assert(diff(v1, v1).isEmpty)
    assert(isCompatible(v1, v1))
  }

  test("adds, drops, and retypes are reported with dotted paths") {
    val v2 = StructType(Seq(
      StructField("id", LongType),
      StructField("price", StringType), // retyped
      StructField("lang", StringType), // added
      StructField("meta", StructType(Seq(
        StructField("source", StringType)))), // meta.ts dropped
      StructField("tags", ArrayType(StructType(Seq(
        StructField("k", StringType), StructField("v", StringType),
        StructField("w", LongType))))))) // tags[].w added
    val d = diff(v1, v2)
    assert(d.collect { case Dropped(p, _) => p } ==
      Seq("meta.ts", "name"))
    assert(d.collect { case Added(p, _) => p } == Seq("lang", "tags[].w"))
    assert(d.collect { case Retyped(p, was, now) => (p, was, now) } ==
      Seq(("price", DoubleType, StringType)))
    assert(!isCompatible(v1, v2))
  }

  test("additive-only evolution is compatible") {
    val v2 = v1.add(StructField("extra", LongType))
    assert(isCompatible(v1, v2))
    assert(!isCompatible(v2, v1)) // reversing it is a drop
  }

  test("nullability changes are reported uniformly and judged by direction") {
    // field nullable flip
    val req = StructType(Seq(StructField("id", LongType, nullable = false)))
    val opt = StructType(Seq(StructField("id", LongType, nullable = true)))
    assert(diff(opt, req) == Seq(Renulled("id", true, false)))
    assert(isCompatible(opt, req)) // tightening only restricts writers
    assert(!isCompatible(req, opt)) // loosening breaks readers
    // array containsNull flip over a STRUCT element — the case a
    // type-equality diff silently swallows
    val sa = StructType(Seq(StructField("tags", ArrayType(
      StructType(Seq(StructField("k", StringType))), containsNull = true))))
    val sb = StructType(Seq(StructField("tags", ArrayType(
      StructType(Seq(StructField("k", StringType))), containsNull = false))))
    assert(diff(sa, sb) == Seq(Renulled("tags[]", true, false)))
    assert(!isCompatible(sb, sa))
  }
}
