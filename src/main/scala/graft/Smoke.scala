package graft

/** Dev smoke runner mirroring the driver's t1 check: entry() on
  * sf0.001 must return rows > 0.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Session.local(cores = 4)
    val df = SparkEntry.entry(spark)
    df.show(10, truncate = false)
    println(s"[smoke] entry rows = ${df.count()}")
    spark.stop()
  }
}
