package graft.graphs

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphDatasetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def frames(n: Int) =
    (1 to n).flatMap(g => (1 to 5).map(r => (s"g$g", 1, g.toLong, s"p$r")))
      .toDF("graph_id", "period_id", "frame_id", "id")
      .withColumn("game_id", lit("m1"))

  test("withSplit: leakage-free, deterministic, fraction-accurate, no shuffle") {
    val df = frames(2000)
    val split = GraphDataset.withSplit(df, 0.6, 0.3, 0.1, byGraphId = true, seed = 11L)
    // leakage: every row of a graph_id gets one split
    val perGraph = split.groupBy("graph_id")
      .agg(countDistinct("split").as("n")).agg(max("n")).head.getLong(0)
    assert(perGraph === 1L)
    // determinism
    val a = split.groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = GraphDataset.withSplit(df, 0.6, 0.3, 0.1, byGraphId = true, seed = 11L)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
    // fractions within 5% absolute of target on 2000 graphs
    val total = a.values.sum.toDouble
    assert(math.abs(a("train") / total - 0.6) < 0.05)
    assert(math.abs(a("test") / total - 0.3) < 0.05)
    assert(math.abs(a.getOrElse("validation", 0L) / total - 0.1) < 0.05)
    // scale contract: the plan has no exchange (row-local projection)
    val plan = split.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"split assignment must not shuffle:\n$plan")
    // different seed -> different assignment of at least one graph
    val other = GraphDataset.withSplit(df, 0.6, 0.3, 0.1, byGraphId = true, seed = 12L)
    val diff = split.select("graph_id", "split")
      .except(other.select("graph_id", "split")).count()
    assert(diff > 0)
  }

  test("withSplit: exactHash path agrees with its own rerun and honors fractions") {
    val df = frames(500)
    val s1 = GraphDataset.withSplit(df, 0.7, 0.2, 0.1, byGraphId = true, seed = 3L, exactHash = true)
    val counts = s1.groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") / counts.values.sum.toDouble - 0.7) < 0.07)
  }

  test("withSplitExact: reference floor/remainder cardinalities, leakage-free, deterministic") {
    val df = frames(997) // prime count → fractions can't be exact
    val split = GraphDataset.withSplitExact(df, 0.6, 0.3, 0.1, byGraphId = true, seed = 5L)
    val byGraph = split.select("graph_id", "split").distinct().cache()
    // leakage control
    assert(byGraph.count() === 997L)
    // exact reference counts: floor(0.6·997)=598 train, floor(0.3·997)=299
    // test, remainder 100 validation (graph_dataset.py:168-175)
    val c = byGraph.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c("train") === 598L)
    assert(c("test") === 299L)
    assert(c("validation") === 100L)
    // deterministic across reruns and across the two hash modes' contract
    val c2 = GraphDataset.withSplitExact(df, 0.6, 0.3, 0.1, byGraphId = true, seed = 5L)
      .select("graph_id", "split").distinct().groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c === c2)
    // exactHash flavor keeps the same exact cardinalities (different permutation)
    val c3 = GraphDataset.withSplitExact(df, 0.6, 0.3, 0.1, byGraphId = true,
      seed = 5L, exactHash = true)
      .select("graph_id", "split").distinct().groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c3("train") === 598L && c3("test") === 299L && c3("validation") === 100L)
    byGraph.unpersist()
  }

  test("withSplitExact: no-validation mode gives train the floor and test the remainder") {
    val df = frames(10)
    val c = GraphDataset.withSplitExact(df, 0.65, 0.35, 0.0, byGraphId = true, seed = 1L)
      .select("graph_id", "split").distinct().groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c("train") === 6L && c("test") === 4L && !c.contains("validation"))
  }

  test("withSplit rejects bad fractions") {
    assertThrows[IllegalArgumentException](
      GraphDataset.withSplit(frames(5), 0.5, 0.2, 0.1))
    assertThrows[IllegalArgumentException](
      GraphDataset.withSplit(frames(5), 0.2, 0.5, 0.3))
  }

  test("balanced: works with LongType labels and hits the target ratio") {
    val df = (1 to 900).map(i => (i.toLong, if (i <= 600) 0L else 1L))
      .toDF("row_id", "label")
    val bal = GraphDataset.balanced(df, "label", ratio = 1.0, seed = 5L)
    val counts = bal.groupBy("label").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // majority (neg=600) down-sampled toward pos=300
    assert(counts(1L) === 300L)
    assert(math.abs(counts(0L) - 300L) < 60L)
  }

  test("balanced: IntegerType labels work too; single-class passes through") {
    val df = (1 to 100).map(i => (i, if (i <= 80) 0 else 1)).toDF("row_id", "label")
    val bal = GraphDataset.balanced(df, "label", ratio = 1.0, seed = 5L)
    assert(bal.count() < 100L)
    val one = (1 to 50).map(i => (i, 1)).toDF("row_id", "label")
    assert(GraphDataset.balanced(one, "label").count() === 50L)
  }

  test("shuffled is a seeded permutation (same rows, deterministic order)") {
    val df = (1 to 100).map(i => (i, s"v$i")).toDF("k", "v")
    val s1 = GraphDataset.shuffled(df, 9L).collect().map(_.getInt(0)).toSeq
    val s2 = GraphDataset.shuffled(df, 9L).collect().map(_.getInt(0)).toSeq
    assert(s1 === s2)
    assert(s1.sorted === (1 to 100))
    assert(s1 !== (1 to 100))
  }

  private def graphTable(fromFrame: Long, n: Int) =
    (0 until n).map { i =>
      val frame = fromFrame + i
      (frame, Seq(Seq(1.0, 2.0), Seq(3.0, 4.0), Seq(5.0, 6.0)),
        Seq(Seq(0.5), Seq(0.7)), (frame % 2).toInt)
    }.toDF("frame_id", "x", "e", "label")

  test("add unions compatible graph tables, rejects schema drift") {
    val merged = GraphDataset.add(graphTable(0, 3), graphTable(10, 2))
    assert(merged.count() === 5)
    intercept[IllegalArgumentException] {
      GraphDataset.add(graphTable(0, 1), graphTable(0, 1).drop("label"))
    }
  }

  test("dimensions: (N, F, S, n_out, n) in one aggregate pass") {
    assert(GraphDataset.dimensions(graphTable(0, 4)) === ((3, 2, 1, 2L, 4L)))
  }
}
