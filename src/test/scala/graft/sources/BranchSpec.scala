package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Branch/merge workflow: O(files) fork, independent mutation on
  * both sides, manifest-diff-priced merge-back with key-level
  * three-way conflict detection. */
class BranchSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): String =
    scratch(s"branch_$tag/${java.util.UUID.randomUUID().toString.take(8)}")

  private def mk(url: String): Int =
    Snapshots.create(spark, url,
      (1L to 50L).map(i => (i, s"v$i", i * 10)).toDF("id", "s", "n"),
      nFiles = 4, clusterBy = Some("id"))

  test("fork is independent both ways; mergeBack lands the net " +
      "insert/update/delete delta as one commit") {
    val main = fresh("main"); val br = fresh("br")
    mk(main)
    val forkV = Branch.fork(spark, main, br)
    assert(Snapshots.read(spark, br).count() == 50L)
    // branch mutations: update 3, delete 7, insert 99
    Snapshots.upsert(spark, br,
      Seq((3L, "patched", 33L)).toDF("id", "s", "n"), "id")
    Snapshots.deleteWhere(spark, br, "id", 7L, 7L)
    Snapshots.append(spark, br,
      Seq((99L, "new", 990L)).toDF("id", "s", "n"))
    // main unaffected by branch writes
    assert(Snapshots.read(spark, main).count() == 50L)
    // main moves on DISJOINT keys — still mergeable
    Snapshots.upsert(spark, main,
      Seq((40L, "mainside", 400L)).toDF("id", "s", "n"), "id")
    // branch unaffected by main writes
    assert(Snapshots.read(spark, br)
      .filter(col("s") === "mainside").isEmpty)
    val merged = Branch.mergeBack(spark, br, "id")
    assert(merged == Snapshots.latest(spark, main))
    val now = Snapshots.read(spark, main)
    assert(now.count() == 50L) // -1 delete +1 insert
    assert(now.filter(col("id") === 3L).select("s")
      .as[String].head() == "patched")
    assert(now.filter(col("id") === 7L).isEmpty)
    assert(now.filter(col("id") === 99L).select("n")
      .as[Long].head() == 990L)
    assert(now.filter(col("id") === 40L).select("s")
      .as[String].head() == "mainside")
    assert(forkV == 1)
  }

  test("key-level conflict: both sides touched the same key since " +
      "the fork — merge refuses, naming the key") {
    val main = fresh("cmain"); val br = fresh("cbr")
    mk(main)
    Branch.fork(spark, main, br)
    Snapshots.upsert(spark, br,
      Seq((5L, "branchside", 1L)).toDF("id", "s", "n"), "id")
    // main DELETES the same key → three-way conflict
    Snapshots.deleteWhere(spark, main, "id", 5L, 5L)
    val e = intercept[IllegalArgumentException] {
      Branch.mergeBack(spark, br, "id")
    }
    assert(e.getMessage.contains("conflict") &&
      e.getMessage.contains("5"))
    // main kept its state (nothing half-merged)
    assert(Snapshots.read(spark, main).count() == 49L)
  }

  test("upsert's expectedParentVersion pin refuses a moved head — " +
      "the mergeBack check-then-commit window stays closed") {
    val url = fresh("pin")
    mk(url)
    val v1 = Snapshots.latest(spark, url)
    Snapshots.append(spark, url,
      Seq((60L, "moved", 600L)).toDF("id", "s", "n"))
    val e = intercept[IllegalArgumentException] {
      Snapshots.upsert(spark, url,
        Seq((1L, "x", 1L)).toDF("id", "s", "n"), "id",
        expectedParentVersion = v1)
    }
    assert(e.getMessage.contains("re-run"))
    // unpinned (default) still lands
    Snapshots.upsert(spark, url,
      Seq((1L, "x", 1L)).toDF("id", "s", "n"), "id")
    assert(Snapshots.read(spark, url)
      .filter(col("s") === "x").count() == 1L)
  }

  test("no-op merges, pinned-version forks, and non-fork refusal") {
    val main = fresh("nmain"); val br = fresh("nbr")
    val v1 = mk(main)
    Snapshots.append(spark, main,
      Seq((51L, "later", 510L)).toDF("id", "s", "n"))
    // fork at the PINNED v1: the branch sees 50 rows, not 51
    Branch.fork(spark, main, br, version = v1)
    assert(Snapshots.read(spark, br).count() == 50L)
    // a branch with no commits past its fork merges as a no-op
    assert(Branch.mergeBack(spark, br, "id") ==
      Snapshots.latest(spark, main))
    // merging a store that is not a fork refuses
    intercept[IllegalArgumentException] {
      Branch.mergeBack(spark, main, "id")
    }
  }

  test("rebase after a refused merge: conflicts returned, clean " +
      "keys replayed onto a fresh fork, then the merge lands") {
    val main = fresh("rmain"); val br = fresh("rbr")
    val br2 = fresh("rbr2")
    mk(main)
    Branch.fork(spark, main, br)
    // branch: update 5 (conflict), update 9, delete 11, insert 99
    Snapshots.upsert(spark, br,
      Seq((5L, "branchside", 1L), (9L, "brnine", 9L))
        .toDF("id", "s", "n"), "id")
    Snapshots.deleteWhere(spark, br, "id", 11L, 11L)
    Snapshots.append(spark, br,
      Seq((99L, "brnew", 990L)).toDF("id", "s", "n"))
    // main: update 5 (conflict) + insert 77
    Snapshots.upsert(spark, main,
      Seq((5L, "mainside", 2L), (77L, "mainnew", 770L))
        .toDF("id", "s", "n"), "id")
    intercept[IllegalArgumentException] {
      Branch.mergeBack(spark, br, "id")
    }
    val (newForkV, conflicts) =
      Branch.rebase(spark, br, br2, "id")
    assert(newForkV == Snapshots.latest(spark, main)) // fork of head
    assert(conflicts == Seq(5L), s"conflicts: $conflicts")
    val b2 = Snapshots.read(spark, br2)
    // conflicting key keeps MAIN's value until resolved
    assert(b2.filter(col("id") === 5L).select("s")
      .as[String].head() == "mainside")
    // clean branch work replayed
    assert(b2.filter(col("id") === 9L).select("s")
      .as[String].head() == "brnine")
    assert(b2.filter(col("id") === 11L).isEmpty)
    assert(b2.filter(col("id") === 99L).count() == 1L)
    // main-side work visible on the rebased branch
    assert(b2.filter(col("id") === 77L).count() == 1L)
    // and the rebased branch now merges cleanly
    Branch.mergeBack(spark, br2, "id")
    val now = Snapshots.read(spark, main)
    assert(now.filter(col("id") === 5L).select("s")
      .as[String].head() == "mainside")
    assert(now.filter(col("id") === 9L).select("s")
      .as[String].head() == "brnine")
    assert(now.filter(col("id") === 11L).isEmpty)
    assert(now.filter(col("id") === 99L).count() == 1L)
    assert(now.count() == 51L) // 50 - 1 del + 99 + 77 = 51
  }

  test("rebase strategies: ours replays the conflicting key, a " +
      "resolver callback merges both sides, stray resolver keys " +
      "refuse") {
    def build(tag: String): (String, String, String) = {
      val main = fresh(s"${tag}m"); val br = fresh(s"${tag}b")
      val br2 = fresh(s"${tag}b2")
      mk(main)
      Branch.fork(spark, main, br)
      Snapshots.upsert(spark, br,
        Seq((5L, "branchside", 1L), (9L, "brnine", 9L))
          .toDF("id", "s", "n"), "id")
      Snapshots.upsert(spark, main,
        Seq((5L, "mainside", 2L)).toDF("id", "s", "n"), "id")
      (main, br, br2)
    }
    // OURS: the branch's delta wins on the conflicting key too
    val (_, ob, ob2) = build("ro")
    val (_, oConf) = Branch.rebase(spark, ob, ob2, "id",
      strategy = Branch.RebaseOurs)
    assert(oConf == Seq(5L))
    assert(Snapshots.read(spark, ob2).filter(col("id") === 5L)
      .select("s").as[String].head() == "branchside")
    assert(Snapshots.read(spark, ob2).filter(col("id") === 9L)
      .select("s").as[String].head() == "brnine")
    // RESOLVER: sees ours (delta shape) and theirs (main head rows),
    // returns the resolution — here, merge both sides' fields
    val (_, rb, rb2) = build("rr")
    val (_, rConf) = Branch.rebase(spark, rb, rb2, "id",
      strategy = Branch.RebaseResolve { (ours, theirs) =>
        ours.alias("o").join(theirs.alias("t"), "id")
          .select(col("id"),
            concat(col("o.s"), lit("+"), col("t.s")).as("s"),
            (col("o.n") + col("t.n")).as("n"),
            col("o._change").as("_change"))
      })
    assert(rConf == Seq(5L))
    assert(Snapshots.read(spark, rb2).filter(col("id") === 5L)
      .select(col("s"), col("n")).as[(String, Long)].head() ==
      (("branchside+mainside", 3L)))
    // a resolver returning keys OUTSIDE the conflict set refuses
    val (_, sb, sb2) = build("rs")
    intercept[IllegalArgumentException] {
      Branch.rebase(spark, sb, sb2, "id",
        strategy = Branch.RebaseResolve { (ours, _) =>
          ours.withColumn("id", col("id") + 1000L)
        })
    }
  }

  test("fork crash recovery: a provenance-less clone completes iff " +
      "it matches this call's fork point, else instructs deletion") {
    val main = fresh("fmain"); val br = fresh("fbr")
    mk(main)
    // simulate a crash between cloneStore and the meta write
    Snapshots.cloneStore(spark, main, br,
      Snapshots.latest(spark, main))
    val v = Branch.fork(spark, main, br) // completes the fork
    assert(Branch.forkPoint(spark, br) ==
      (main, Snapshots.latest(spark, main)))
    assert(v == Snapshots.latest(spark, main))
    // a non-matching provenance-less store refuses with instruction
    val br3 = fresh("fbr3")
    Snapshots.cloneStore(spark, main, br3, 1)
    Snapshots.append(spark, main,
      Seq((200L, "late", 1L)).toDF("id", "s", "n"))
    val err = intercept[IllegalArgumentException] {
      Branch.fork(spark, main, br3) // head moved past the stale clone
    }
    assert(err.getMessage.contains("delete the directory"))
  }

  test("rebase composes with column mapping: conflicts and replay " +
      "on a renamed store use logical names end to end") {
    val main = fresh("rrmain"); val br = fresh("rrbr")
    val br2 = fresh("rrbr2")
    mk(main)
    Snapshots.renameColumn(spark, main, "id", "doc")
    Branch.fork(spark, main, br)
    Snapshots.upsert(spark, br,
      Seq((5L, "branchside", 1L), (9L, "brnine", 9L))
        .toDF("doc", "s", "n"), "doc")
    Snapshots.upsert(spark, main,
      Seq((5L, "mainside", 2L)).toDF("doc", "s", "n"), "doc")
    intercept[IllegalArgumentException] {
      Branch.mergeBack(spark, br, "doc")
    }
    val (_, conflicts) = Branch.rebase(spark, br, br2, "doc")
    assert(conflicts == Seq(5L))
    Branch.mergeBack(spark, br2, "doc")
    val now = Snapshots.read(spark, main)
    assert(now.columns.contains("doc"))
    assert(now.filter(col("doc") === 5L).select("s")
      .as[String].head() == "mainside")
    assert(now.filter(col("doc") === 9L).select("s")
      .as[String].head() == "brnine")
  }
}
