package graft.tools

import graft.core.Tables
import graft.llm.{MinHash, TextHash}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-conditions A/B for the q_doc_minhash_dedup band-key shape
  * (r17 verdict item 2): the r17 union→explode change improved the plan
  * (24 → 12 printed scans) and the builder's solo A/B (1.63 → 1.40 s),
  * but the driver's cold-JVM run regressed 17%. This tool times the
  * same query body under the bench methodology (count sink, warm-up,
  * min-of-3, clearCache between runs) for one variant per JVM — run it
  * once per variant back-to-back, fresh JVM each, so the comparison
  * matches the driver's cold-start conditions.
  *
  * Variants:
  *  - `explode` — the r17 production shape (one explode over band
  *    structs; ReusedExchange serves both join sides).
  *  - `union`   — the r16 shape (one projection per band, unioned;
  *    4 independent band subtrees run in parallel but each re-executes
  *    the scan→shingle→signature pipeline).
  *  - `repart`  — explode + an explicit (band, key) repartition under
  *    the join (restores fan-out parallelism after the serialized
  *    explode at single-row-group scale factors).
  */
object MinHashAb {

  private[tools] def ndVariant(docs: DataFrame, variant: String): DataFrame = {
    val idCol = "doc_id"
    val sh = MinHash.shingleHashes(docs, idCol, "text", 3, TextHash.polyHash).distinct()
    val sigs = MinHash.signaturesFromHashes(sh, idCol, MinHash.Bands * MinHash.Rows)
    val bandRows = variant match {
      case "union" =>
        (0 until MinHash.Bands).map { b =>
          sigs.select(col(idCol), lit(b).as("band"),
            struct((0 until MinHash.Rows).map(r =>
              col(s"mh${b * MinHash.Rows + r}").as(s"k$r")): _*).as("key"))
        }.reduce(_ unionByName _)
      case "repart" =>
        MinHash.bandKeyRows(sigs, idCol, MinHash.Bands, MinHash.Rows)
          .repartition(col("band"), col("key"))
      case _ =>
        MinHash.bandKeyRows(sigs, idCol, MinHash.Bands, MinHash.Rows)
    }
    val l = bandRows.toDF("id_a", "band", "key")
    val r = bandRows.toDF("id_b", "band", "key")
    val pairs = l.join(r, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    MinHash.exactJaccardVerify(sh, idCol, pairs, 0.01)
  }

  def main(args: Array[String]): Unit = {
    val variant = args.headOption.getOrElse("explode")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SparkEntry.configure(SparkSession.builder(), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(): Long = ndVariant(Tables.documents(spark, sfDir), variant).count()
    val rows = run() // warm-up, same as Bench
    spark.catalog.clearCache()
    val t = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      run()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }.min
    println(s"""{"metric":"minhash_ab","variant":"$variant","rows":$rows,"min3_sec":$t}""")
    spark.stop()
  }
}
