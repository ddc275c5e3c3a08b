package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Model-based check of the CDC feed across EVERY version pair of a
  * lineage that mixes keyed upserts, metadata-only renames, COW
  * deletes, additive evolution and a colmap-resetting overwrite —
  * the op mix whose dropped-side physical resolution round 17 made
  * lineage-aware. The spec maintains an in-memory model of each
  * version's (schema, rows) — columns tracked by CANONICAL identity,
  * so a rename is NOT a value change — and asserts, for all
  * fromV < toV, that `Snapshots.changes` either REFUSES LOUDLY (only
  * on the documented unprovable compound: a rename and a colmap
  * reset both inside the range) or emits exactly the model diff
  * under toV's schema — the silent-wrong class (renamed columns
  * reading as NULL on the dropped side) has nowhere to hide. */
class CdcLineageModelSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): String = scratch(
    s"cdcmodel_$tag/${java.util.UUID.randomUUID().toString.take(8)}")

  /** One version's model: value columns as (canonical id → logical
    * name) in schema order, and rows keyed by id with values keyed
    * CANONICALLY (None = null/absent). */
  private case class MV(cols: Seq[(String, String)],
      rows: Map[Long, Map[String, Option[Long]]])

  /** Model diff projected under toV's canonical column order:
    * (change, key, values). */
  private def modelDiff(a: MV, b: MV)
      : Set[(String, Long, Seq[Option[Long]])] = {
    val canon = b.cols.map(_._1)
    def proj(r: Map[String, Option[Long]]): Seq[Option[Long]] =
      canon.map(c => r.getOrElse(c, None))
    val out = Set.newBuilder[(String, Long, Seq[Option[Long]])]
    b.rows.foreach { case (k, r) =>
      a.rows.get(k) match {
        case None => out += (("insert", k, proj(r)))
        case Some(old) =>
          if (proj(old) != proj(r)) out += (("update", k, proj(r)))
      }
    }
    a.rows.foreach { case (k, r) =>
      if (!b.rows.contains(k)) out += (("delete", k, proj(r)))
    }
    out.result()
  }

  test("changes() over a rename/overwrite/evolution lineage: every " +
      "version pair either refuses loudly or equals the model diff") {
    val url = fresh("lineage")
    val model = Seq.newBuilder[MV]
    def last: MV = model.result().last

    // canonical "A" = the a/x column; canonical "B" = the b column
    def row(k: Long, a: Long): (Long, Map[String, Option[Long]]) =
      k -> Map("A" -> Some(a))
    def row2(k: Long, a: Long, b: Long)
        : (Long, Map[String, Option[Long]]) =
      k -> Map("A" -> Some(a), "B" -> Some(b))

    // v1 create: keys 1..6, a = 10*k
    Snapshots.create(spark, url,
      (1L to 6L).map(k => (k, k * 10)).toDF("id", "a"), nFiles = 2)
    model += MV(Seq("A" -> "a"),
      (1L to 6L).map(k => row(k, k * 10)).toMap)

    // v2 upsert: update 2, insert 7
    Snapshots.upsert(spark, url,
      Seq((2L, 222L), (7L, 70L)).toDF("id", "a"), "id")
    model += MV(Seq("A" -> "a"),
      last.rows + row(2L, 222L) + row(7L, 70L))

    // v3 rename a -> x: METADATA ONLY — same canonical column
    Snapshots.renameColumn(spark, url, "a", "x")
    model += MV(Seq("A" -> "x"), last.rows)

    // v4 COW delete keys 3..4
    Snapshots.deleteWhere(spark, url, "id", 3L, 4L)
    model += MV(Seq("A" -> "x"),
      last.rows.filter { case (k, _) => k < 3 || k > 4 })

    // v5 evolution: append key 8 with NEW column b (old rows null b)
    Snapshots.append(spark, url,
      Seq((8L, 80L, 800L)).toDF("id", "x", "b"))
    model += MV(Seq("A" -> "x", "B" -> "b"),
      last.rows + row2(8L, 80L, 800L))

    // v6 upsert post-rename (files store physical 'a' under colmap)
    Snapshots.upsert(spark, url,
      Seq((5L, 555L, 55L)).toDF("id", "x", "b"), "id")
    model += MV(Seq("A" -> "x", "B" -> "b"),
      last.rows + row2(5L, 555L, 55L))

    // v7 overwrite: colmap RESETS (new files store 'x' physically)
    Snapshots.overwrite(spark, url,
      Seq((1L, 111L, 1L), (9L, 90L, 9L)).toDF("id", "x", "b"),
      nFiles = 1)
    model += MV(Seq("A" -> "x", "B" -> "b"),
      Map(row2(1L, 111L, 1L), row2(9L, 90L, 9L)))

    // v8 upsert after the reset
    Snapshots.upsert(spark, url,
      Seq((9L, 999L, 99L)).toDF("id", "x", "b"), "id")
    model += MV(Seq("A" -> "x", "B" -> "b"),
      last.rows + row2(9L, 999L, 99L))

    val mvs = model.result()
    val n = mvs.length
    assert(Snapshots.latest(spark, url) == n)

    var checked = 0; var refused = 0
    for (i <- 1 to n; j <- (i + 1) to n) {
      val (a, b) = (mvs(i - 1), mvs(j - 1))
      val got =
        try Some(Snapshots.changes(spark, url, "id", i, j)
          .collect().map { r =>
            (r.getAs[String]("_change"), r.getAs[Long]("id"),
              b.cols.map { case (_, logical) =>
                Option(r.getAs[Any](logical))
                  .map(_.asInstanceOf[Long]) })
          }.toSet)
        catch {
          case e: RuntimeException
              if e.getMessage.contains("split the feed range") ||
                e.getMessage.contains("cannot be reconstructed") =>
            None
        }
      got match {
        case None =>
          // refusal is legitimate ONLY for the documented compound:
          // the rename (v3) and the reset (v7) both inside the range
          assert(i < 3 && j >= 7,
            s"changes($i, $j) refused outside the rename+reset compound")
          refused += 1
        case Some(feed) =>
          val want = modelDiff(a, b)
          assert(feed == want,
            s"changes($i, $j):\n got  $feed\n want $want")
          checked += 1
      }
    }
    // every pair covered; the refusal set is exactly the compound
    assert(checked + refused == n * (n - 1) / 2)
    assert(refused == 2 * 2, // i ∈ {1,2} × j ∈ {7,8}
      s"expected exactly the 4 compound ranges to refuse, got $refused")
  }
}
