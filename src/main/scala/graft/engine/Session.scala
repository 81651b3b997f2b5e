package graft.engine

import org.apache.spark.sql.SparkSession

/** Session factory encoding the engine's scale posture.
  *
  * Mirrors the reference pipeline's tuning surface
  * (/root/reference/main_pipeline.py:245-260 — AQE, skew-join
  * handling, dynamic allocation) re-expressed as Spark-4 conf:
  * AQE on (runtime coalesce + skew split), broadcast threshold for
  * dim tables, shuffle partitions sized to the cluster rather than
  * the 200 default.
  */
object Session {
  def builder(
      master: String = "local[*]",
      shufflePartitions: Int = 32,
      appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      // Typed aggregates run on ObjectHashAggregate, whose sort-based
      // fallback kicks in at a default of 128 distinct keys per
      // partition — far too eager for high-cardinality gram/band keys.
      // 32768 keys is safe because every object-agg state in the
      // engine is bounded: TopKAgg heaps (d6's df cap, the Dedup
      // maxBucket posting-list cap) hold <= k entries, so 32k keys of
      // state is a few MB. The one unbounded state — ewma's per-key
      // series array (documented sensor-scale assumption) — groups by
      // sensor key, whose cardinality is far below any threshold, and
      // a sort-based fallback would not bound a single key's array
      // anyway.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "32768")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = 4): SparkSession = {
    val s = builder(master = s"local[$cores]", shufflePartitions = cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
