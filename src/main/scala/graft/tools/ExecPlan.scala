package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Executes a named query (count sink, like the bench) and prints the
  * FINAL adaptive plan — the shape AQE actually ran, including
  * ReusedExchange/stage-reuse nodes the pre-execution explain hides. */
object ExecPlan {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_pi_pairs")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(SparkSession.builder(), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val inner = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => Nil
      }
      p +: (p.children ++ inner).flatMap(flatten)
    }
    val nodes = flatten(df.queryExecution.executedPlan)
    println(s"=== $name executed nodes ===")
    nodes.map(_.nodeName).groupBy(identity).toSeq.sortBy(-_._2.size)
      .foreach { case (n, xs) => println(f"${xs.size}%3d  $n") }
    if (args.length > 1) {
      val out = args(1)
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        df.queryExecution.executedPlan.toString.getBytes("UTF-8"))
      println(s"wrote $out")
    }
    spark.stop()
  }
}
