package graft

import graft.graphs.{GraphConverter, GraphSettings}
import graft.tracking._
import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEntry.configure(SparkSession.builder(), "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    def input = {
      val trk = SyntheticTracking.df(spark, d)
      val kin = Kinematics(trk, TrackingSettings(), None, None)
      Possession.inferBallCarrier(kin, TrackingSettings())
        .drop("ax", "ay", "az", "a")
    }
    // warm-up
    input.count()
    import org.apache.spark.sql.functions._
    def force(df: org.apache.spark.sql.DataFrame): Long = {
      val nums = df.schema.fields.filter(f =>
        f.dataType.typeName == "double" || f.dataType.typeName == "long").map(f => sum(col(f.name)))
      df.agg(nums.head, nums.tail: _*).collect(); df.count()
    }
    time("raw scan")(SyntheticTracking.df(spark, d).count())
    time("kinematics FULL")(force(Kinematics(SyntheticTracking.df(spark, d), TrackingSettings(), None, None)))
    time("kin+possession FULL")(force(input))
    time("padFrames")(GraphConverter.padFrames(input).count())
    val settings = GraphSettings(pad = true)
    val inputP = input.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("input materialize")(inputP.count())
    println("PROFILE input partitions = " + inputP.rdd.getNumPartitions)
    time("pad+idx over cached input")(
      GraphConverter.withNodeIndex(GraphConverter.padFrames(inputP)).count())
    val prepared = GraphConverter.withNodeIndex(GraphConverter.padFrames(inputP))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("prepared materialize")(prepared.count())
    time("node features+agg") {
      import org.apache.spark.sql.functions._
      GraphConverter.withNodeFeatures(prepared, settings)
        .groupBy(col("game_id"), col("period_id"), col("frame_id"))
        .agg(array_sort(collect_list(struct(col("node_idx"), col("x_features"), col("id")))).as("n"))
        .count()
    }
    time("pairs only")(GraphConverter.pairs(prepared, settings).count())
    time("pairs + agg") {
      import org.apache.spark.sql.functions._
      GraphConverter.pairs(prepared, settings)
        .groupBy(col("game_id"), col("period_id"), col("frame_id"))
        .agg(array_sort(collect_list(struct(col("i_node_idx"), col("j_node_idx"), col("a")))).as("ac"),
          array_sort(collect_list(when(col("a") === 1,
            struct(col("i_node_idx"), col("j_node_idx"), col("e_features"))))).as("ec"))
        .count()
    }
    prepared.unpersist()
    spark.catalog.clearCache()
    time("graphFrames nested")(GraphConverter.graphFrames(input, GraphSettings(pad = true)).count())
    spark.catalog.clearCache()
    val q = SparkEntry.allQueries.find(_.name == "q_graph_frames").get
    time("q_graph_frames full")(q.run(spark, d).count())

    // ---- minhash dedup stages ----
    import graft.llm._
    val docs = graft.core.Tables.documents(spark, d)
    time("mh shingleHashes")(MinHash.shingleHashes(docs, "doc_id", "text", 3, TextHash.polyHash).count())
    val sh = MinHash.shingleHashes(docs, "doc_id", "text", 3, TextHash.polyHash).distinct()
    time("mh sh distinct")(sh.count())
    time("mh signatures")(MinHash.signatures(docs, "doc_id", "text").count())
    time("mh candidates")(MinHash.candidatePairs(MinHash.signatures(docs, "doc_id", "text"), "doc_id").count())
    time("mh nearDuplicates full")(MinHash.nearDuplicates(docs, "doc_id", "text", 3, 0.01).count())
    spark.stop()
  }
}
