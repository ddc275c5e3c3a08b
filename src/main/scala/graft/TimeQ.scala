package graft
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("timeq")
    args.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
        .write.format("noop").mode("overwrite").save()
      println(f"TIMING $name ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
