package graft.llm

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins both modes of the [[Guards]] broadcast knob on an actual
  * guard call site ([[BandedHamming.dropOverCap]]): `"force"`
  * (default) plans the hinted broadcast anti-join; `"auto"` with the
  * broadcast threshold disabled degrades to a shuffled join — the
  * no-driver-OOM fallback for guard sets whose increment-size bound
  * is not trusted — and with the default threshold AQE still
  * recovers the broadcast at runtime, so auto mode does not lose the
  * fast path when the set IS small. Survivor rows are identical in
  * every mode. */
class GuardBroadcastSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // 600 hot rows in 6 over-cap (band, key) buckets + 3000 singleton
  // buckets: the guard drops the hot buckets, survivors = singletons
  private def keyed = spark.range(3600).select(
    col("id").as("media_id"),
    (col("id") % 3).as("band"),
    when(col("id") < 600, col("id") % 6).otherwise(col("id")).as("key"))

  private def guarded: DataFrame =
    BandedHamming.dropOverCap(keyed, Seq("band", "key"), 50)

  private def executedPlan(df: DataFrame): String = {
    df.collect() // let AQE finalize the plan it actually ran
    df.queryExecution.executedPlan.toString
  }

  test("force (default) broadcasts the guard set") {
    val df = guarded
    val p = executedPlan(df)
    assert(p.contains("BroadcastExchange"), s"no broadcast in:\n$p")
    assert(df.count() === 3000)
  }

  test("auto with broadcasts disabled degrades to a shuffled anti-join, same survivors") {
    val conf = spark.conf
    val oldThresh = conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    conf.set(Guards.ConfKey, "auto")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = guarded
      val p = executedPlan(df).split("== Initial Plan ==")(0)
      assert(!p.contains("BroadcastExchange"),
        s"auto mode with threshold -1 must not broadcast:\n$p")
      assert(df.count() === 3000)
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldThresh)
      conf.unset(Guards.ConfKey)
    }
  }

  test("an unrecognized knob value throws instead of silently forcing") {
    spark.conf.set(Guards.ConfKey, "Auto")
    try {
      val e = intercept[IllegalArgumentException](guarded)
      assert(e.getMessage.contains("Auto"))
    } finally spark.conf.unset(Guards.ConfKey)
  }

  test("auto with the default threshold recovers the broadcast at runtime via AQE") {
    spark.conf.set(Guards.ConfKey, "auto")
    try {
      val df = guarded
      val p = executedPlan(df).split("== Initial Plan ==")(0)
      assert(p.contains("BroadcastExchange"),
        s"AQE should re-plan the small guard set to a broadcast:\n$p")
      assert(df.count() === 3000)
    } finally spark.conf.unset(Guards.ConfKey)
  }
}
