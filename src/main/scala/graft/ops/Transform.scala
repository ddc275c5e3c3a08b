package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{ArrayType, DataType}

import graft.schema.FieldSpec

/** TransformSpec — the reference's worker-side user-function surface
  * (transform.py:27-89): an arbitrary batch function plus declarative
  * schema edits, applied post-decode in the read pipeline.
  *
  * In Spark the "batch function" is any DataFrame→DataFrame (typed
  * `Dataset.map`/`mapPartitions`, UDF withColumn, joins — anything),
  * and the schema edits mirror the reference's three lists:
  *
  *  - `editedFields` (edit_fields, transform.py:27-57): declares the
  *    fields the func ADDS or RESHAPES, as [[FieldSpec]]s (the same
  *    5-tuple the Unischema uses). Where the reference needs the
  *    declaration to know the post-transform schema up front (its
  *    func runs on opaque numpy dicts), Spark derives the schema from
  *    the plan — so here the declaration is VALIDATED against what
  *    the func actually produced: a declared field must exist with
  *    the declared type (shaped fields as a flat array of the element
  *    type; nullability is advisory, matching the reference's
  *    unenforced is_nullable flag). A func that silently emits the
  *    wrong type fails at build time, not at epoch 3.
  *  - `removedFields` / `selectedFields` (order-preserving,
  *    transform.py:60-89). `func` runs first, then the edit checks,
  *    then removals, then the (ordered) selection.
  */
final case class TransformSpec(
    func: DataFrame => DataFrame = identity,
    editedFields: Seq[FieldSpec] = Nil,
    removedFields: Seq[String] = Nil,
    selectedFields: Seq[String] = Nil) {

  def apply(df: DataFrame): DataFrame = {
    val applied = func(df)
    editedFields.foreach { e =>
      val actual = applied.schema.fields.find(_.name == e.name).getOrElse(
        throw new IllegalArgumentException(
          s"edit_fields declares '${e.name}' but the transform func " +
            s"produced only: ${applied.columns.mkString(", ")}"))
      val expected: DataType =
        if (e.shape.nonEmpty) ArrayType(e.dataType) else e.dataType
      require(
        DataType.equalsStructurally(actual.dataType, expected,
          ignoreNullability = true),
        s"edit_fields declares '${e.name}' as ${expected.simpleString} " +
          s"but the transform func produced ${actual.dataType.simpleString}")
    }
    val removed =
      if (removedFields.isEmpty) applied
      else applied.drop(removedFields: _*)
    if (selectedFields.isEmpty) removed
    else {
      val missing = selectedFields.filterNot(removed.columns.contains)
      require(missing.isEmpty,
        s"selected_fields not in transformed schema: ${missing.mkString(", ")}")
      removed.select(selectedFields.head, selectedFields.tail: _*)
    }
  }
}
