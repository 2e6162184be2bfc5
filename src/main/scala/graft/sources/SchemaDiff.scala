package graft.sources

import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Schema-evolution audit between two dataset versions — the
  * compatibility gate a lakehouse runs before promoting a new producer
  * (the reference's fuzzy column matching sidesteps this by renaming at
  * read time; at 100 TB you want the break detected at WRITE time, not
  * discovered by every consumer independently).
  *
  * Pure metadata (two `StructType`s — obtained from a footer read or a
  * catalog, never a data scan). Nested structs recurse with dotted
  * paths; array element types recurse with `[]`.
  */
object SchemaDiff {

  sealed trait Change { def path: String }
  /** Column the new schema lost — breaks existing readers. */
  final case class Dropped(path: String, was: DataType) extends Change
  /** Column the new schema gained — additive, readers null-fill. */
  final case class Added(path: String, now: DataType) extends Change
  /** Type changed in place — breaking unless an implicit widening. */
  final case class Retyped(path: String, was: DataType, now: DataType)
      extends Change
  /** Nullability changed in place (field nullable / array containsNull).
    * false→true breaks readers that assumed no nulls; true→false only
    * restricts writers. */
  final case class Renulled(path: String, wasNullable: Boolean,
      nowNullable: Boolean) extends Change

  /** All changes old → new, sorted by path. Nullability is diffed the
    * same way everywhere — on fields AND on array element containsNull —
    * so the verdict never depends on whether an element type happens to
    * be a struct or a primitive. */
  def diff(oldSchema: StructType, newSchema: StructType): Seq[Change] = {
    def diffType(path: String, a: DataType, b: DataType): Seq[Change] =
      (a, b) match {
        case (x: StructType, y: StructType) => walk(path + ".", x, y)
        case (ArrayType(x, cnA), ArrayType(y, cnB)) =>
          (if (cnA != cnB) Seq(Renulled(path + "[]", cnA, cnB))
           else Seq.empty) ++ diffType(path + "[]", x, y)
        case (x, y) if x != y => Seq(Retyped(path, x, y))
        case _ => Seq.empty
      }
    def walk(prefix: String, o: StructType, n: StructType): Seq[Change] = {
      val newF = n.fields.map(f => f.name -> f).toMap
      val oldF = o.fields.map(f => f.name -> f).toMap
      val dropped = o.fields.filterNot(f => newF.contains(f.name))
        .map(f => Dropped(prefix + f.name, f.dataType)).toSeq
      val added = n.fields.filterNot(f => oldF.contains(f.name))
        .map(f => Added(prefix + f.name, f.dataType)).toSeq
      val common = o.fields.filter(f => newF.contains(f.name)).toSeq
      val changed = common.flatMap { f =>
        val g = newF(f.name)
        (if (f.nullable != g.nullable)
           Seq(Renulled(prefix + f.name, f.nullable, g.nullable))
         else Seq.empty) ++
          diffType(prefix + f.name, f.dataType, g.dataType)
      }
      dropped ++ added ++ changed
    }
    walk("", oldSchema, newSchema).sortBy(_.path)
  }

  /** Reader-safe evolution: adds null-fill, and nullable→required only
    * restricts writers — every existing reader keeps working. Drops,
    * retypes, and required→nullable (readers may assume no nulls) are
    * breaking. */
  def isCompatible(oldSchema: StructType, newSchema: StructType): Boolean =
    diff(oldSchema, newSchema).forall {
      case _: Added => true
      case Renulled(_, true, false) => true
      case _ => false
    }
}
