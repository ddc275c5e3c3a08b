package graft.ops

import org.apache.spark.sql.DataFrame

/** TransformSpec — the reference's worker-side user-function surface
  * (transform.py:27-89): an arbitrary batch function plus declarative
  * schema edits, applied post-decode in the read pipeline.
  *
  * In Spark the "batch function" is any DataFrame→DataFrame (typed
  * `Dataset.map`/`mapPartitions`, UDF withColumn, joins — anything),
  * and the schema edits mirror `removed_fields` / `selected_fields`
  * (order-preserving, transform.py:60-89). `func` runs first, then
  * removals, then the (ordered) selection.
  */
final case class TransformSpec(
    func: DataFrame => DataFrame = identity,
    removedFields: Seq[String] = Nil,
    selectedFields: Seq[String] = Nil) {

  def apply(df: DataFrame): DataFrame = {
    val applied = func(df)
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
