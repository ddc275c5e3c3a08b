package graft
/** Spot-timer for individual queries (dev tool): warmup + measured
  * run per query name, sf dir from SPARK_GRAFT_SF_DIR. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.build("timeq")
    args.foreach { name =>
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      println(f"TIMING $name ${once()}%.2f s")
    }
    spark.stop()
  }
}
