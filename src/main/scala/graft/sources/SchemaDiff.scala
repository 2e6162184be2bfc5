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

  /** All changes old → new, sorted by path. */
  def diff(oldSchema: StructType, newSchema: StructType): Seq[Change] = {
    def walk(prefix: String, o: StructType, n: StructType): Seq[Change] = {
      val oldF = o.fields.map(f => f.name -> f.dataType).toMap
      val newF = n.fields.map(f => f.name -> f.dataType).toMap
      val dropped = o.fields.filterNot(f => newF.contains(f.name))
        .map(f => Dropped(prefix + f.name, f.dataType)).toSeq
      val added = n.fields.filterNot(f => oldF.contains(f.name))
        .map(f => Added(prefix + f.name, f.dataType)).toSeq
      val common = o.fields.filter(f => newF.contains(f.name)).toSeq
      val changed = common.flatMap { f =>
        (f.dataType, newF(f.name)) match {
          case (a: StructType, b: StructType) =>
            walk(prefix + f.name + ".", a, b)
          case (ArrayType(a: StructType, _), ArrayType(b: StructType, _)) =>
            walk(prefix + f.name + "[].", a, b)
          case (a, b) if a != b =>
            Seq(Retyped(prefix + f.name, a, b))
          case _ => Seq.empty
        }
      }
      dropped ++ added ++ changed
    }
    walk("", oldSchema, newSchema).sortBy(_.path)
  }

  /** Additive-only evolution (no drops, no retypes) is the safe kind:
    * every existing reader keeps working, new columns null-fill. */
  def isCompatible(oldSchema: StructType, newSchema: StructType): Boolean =
    diff(oldSchema, newSchema).forall {
      case _: Added => true
      case _ => false
    }
}
