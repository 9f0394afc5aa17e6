package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkEntry.configure(SparkSession.builder(), "4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class QueriesSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = SparkTestSession.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query name has unique registration") {
    val names = SparkEntry.allQueries.map(_.name)
    assert(names.distinct.size === names.size)
  }

  for (q <- SparkEntry.allQueries) {
    test(s"${q.name} runs on sf0.001") {
      val df = q.run(spark, sf)
      assert(df.columns.nonEmpty)
      df.count() // materialize — anti joins may legitimately be empty
    }
  }
}
