package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 soak-data generator: scales the driver's read-only sf0.1
  * testdata 10× by key-shifted replication into `/tmp/graft_sf1`, for
  * the empirical scaling soak (`SCALING.md`). NOT an oracle input —
  * the point is measuring how the bench plans scale, so the scaled set
  * must grow the way real data grows:
  *
  *  - fact tables (lineitem, orders, events) get 10 key-shifted copies
  *    — group/frame/order cardinality grows 10×, per-key row counts
  *    stay constant (more matches, not denser frames);
  *  - dimension tables (region…part) stay fixed, like real dims under
  *    fact growth;
  *  - documents are salted per copy (a distinct token appended) so
  *    exact/near-dup structure doesn't explode combinatorially — 10
  *    verbatim copies would give every doc 9 twins and grow LSH
  *    candidate pairs 45× instead of 10×;
  *  - embeddings get a tiny deterministic per-copy perturbation on one
  *    component so top-k has no artificial ties.
  *
  * Output is written with 32 files per fact table (the driver's sf0.1
  * parquets are single-row-group files, which serializes the scan; the
  * soak should measure plan scaling, not a single-task scan
  * bottleneck).
  */
object ScaleGen {

  val Copies = 10

  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    // optional 2nd arg: copy count (10 = sf1, 100 = sf10 — the 100×
    // soak tier; key shifts use a 10M stride so 100 copies stay well
    // inside the long keyspace)
    val nCopies = if (args.length > 1) args(1).toInt else Copies
    val srcDir = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(SparkSession.builder(), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    def write(df: DataFrame, t: String, files: Int): Unit =
      df.repartition(files).write.mode("overwrite").parquet(s"$outDir/$t.parquet")

    // dims: verbatim
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(t => write(read(t), t, 1))

    def copies(df: DataFrame): DataFrame =
      df.crossJoin(spark.range(nCopies).select(col("id").as("__c")))

    val liK = 10000000L // > max l_orderkey at sf0.1 (1.5M keyspace)
    write(copies(read("lineitem"))
      .withColumn("l_orderkey", col("l_orderkey") + col("__c") * liK)
      .drop("__c"), "lineitem", 32)
    write(copies(read("orders"))
      .withColumn("o_orderkey", col("o_orderkey") + col("__c") * liK)
      .drop("__c"), "orders", 8)
    // user_id stays unshifted: users are a dimension-like key, and the
    // customer dim is fixed — shifting would leave ~90% of event rows
    // FK-unmatched and understate join cost in the soak
    write(copies(read("events"))
      .withColumn("event_id", col("event_id") + col("__c") * liK)
      .drop("__c"), "events", 8)
    write(copies(read("documents"))
      .withColumn("doc_id", col("doc_id") + col("__c") * liK)
      .withColumn("text", concat(col("text"), lit(" copysalt"), col("__c")))
      .withColumn("n_chars", length(col("text"))) // of the salted text
      .drop("__c"), "documents", 8)
    write(copies(read("embeddings"))
      .withColumn("vec_id", col("vec_id") + col("__c") * liK)
      .withColumn("embedding",
        transform(col("embedding"), (v, i) =>
          when(i === 0, v + col("__c").cast("float") * lit(1e-4f)).otherwise(v)))
      .drop("__c"), "embeddings", 4)

    println(s"[scalegen] wrote $outDir (${nCopies}x sf0.1)")
    spark.stop()
  }
}
