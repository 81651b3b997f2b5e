package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites. */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = graft.engine.Session.builder(master = "local[4]", shufflePartitions = 4)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf = "/root/testdata/sf0.001"
}
