package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev profiling harness (guide §1: measure first, §7.1 empirical
  * loop — the UI is disabled in the sandbox, so this is its stand-in
  * for the one question the stage pages answer: WHERE inside a
  * multi-job query the wall-clock goes).
  *
  * `runMain graft.ProfileQ <sfDir> <query-prefix> [query-prefix ...]`
  * runs each matching query once to warm the session, once measured
  * under a listener that records every Spark job's wall time and
  * submitting callsite, then prints jobs sorted by duration plus the
  * measured total and the gap (= driver-side time outside any job:
  * planning, manifest IO, file listings). Never part of the driver
  * contract; timings go to stderr, nothing is written. */
object ProfileQ {
  private final case class Job(id: Int, site: String, desc: String,
      start: Long, var end: Long)

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfileQ <sfDir> <qprefix> ...")
    val sfDir = args(0)
    val prefixes = args.drop(1).toSeq
    val spark = GraftSession.build("graft-profile")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = e.stageInfos.lastOption.map(_.name).getOrElse("?")
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(e.jobId, Job(e.jobId, site, desc, e.time, -1L))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) j.end = e.time
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // per-ACTION attribution: every DataFrame action's QueryExecution
    // (funcName, wall ns, plan head) — catches what job callsites
    // can't (SQL executions run on the captured-thread-local pool)
    val actions = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, String)]()
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = {
          val head = qe.logical.toString.linesIterator
            .take(3).mkString(" | ").take(160)
          actions.add((funcName, durationNs, head))
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.exists(n.startsWith))
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Unit =
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      once() // warmup (JIT, codegen cache, footer cache)
      jobs.clear(); actions.clear()
      val t0 = System.nanoTime()
      once()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus delivery is async
      import scala.jdk.CollectionConverters._
      val done = jobs.values.asScala.toSeq.filter(_.end > 0)
        .sortBy(j => -(j.end - j.start))
      val jobSum = done.map(j => (j.end - j.start) / 1e3).sum
      System.err.println(
        f"== $name wall=$wall%.2fs jobs=${done.size} " +
          f"jobTime=$jobSum%.2fs driverGap=${wall - jobSum}%.2fs")
      // group by callsite: count + total time per site tells which
      // CODE path spawns the jobs (a 0.1s job is pure fixed cost;
      // 200 of them from one site is the optimization target)
      done.groupBy(_.site).toSeq
        .map { case (site, js) =>
          (site, js.size, js.map(j => (j.end - j.start) / 1e3).sum) }
        .sortBy(-_._3).take(25)
        .foreach { case (site, n, tot) =>
          System.err.println(f"   $tot%7.2fs  n=$n%-4d $site") }
      val acts = actions.asScala.toSeq
      System.err.println(f"   -- actions=${acts.size} " +
        f"actionTime=${acts.map(_._2).sum / 1e9}%.2fs (wall incl. plan)")
      acts.sortBy(-_._2).take(25).foreach { case (fn2, ns, head) =>
        System.err.println(f"   ${ns / 1e9}%7.3fs  $fn2%-18s $head") }
    }
    spark.stop()
  }
}
