package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RFC 4180 CSV round trip through the native from_csv: the quoting
  * trap class (embedded comma/quote/newline), and the negative pin —
  * Spark's DEFAULT backslash escape mis-reads doubled quotes, which is
  * exactly why q175 sets `escape='"'`.
  */
class TabularOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("q175 on sf0.001: every hostile cell round-trips exactly") {
    import spark.implicits._
    val rows = TabularOps.q175CsvRoundTrip(spark, "/root/testdata/sf0.001")
      .collect()
    val texts = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    def sha(x: String) = java.security.MessageDigest.getInstance("SHA-256")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == s"Doc $id")
      assert(r.getString(2) == sha(texts(id) + "\n\"q\" one,two of " + id),
        s"doc $id cell diverged")
      assert(r.getLong(4) == id)
    }
  }

  test("the default backslash escape would CORRUPT the doubled-quote cell " +
    "(why escape='\"' is load-bearing)") {
    import spark.implicits._
    val line = "a,\"x \"\"y\"\" z\",5"
    val schema = "a string, b string, c long"
    val good = Seq(line).toDF("l")
      .select(expr(s"""from_csv(l, '$schema', map('escape', '"'))""").as("r"))
      .select("r.b").as[String].head()
    assert(good == "x \"y\" z")
    val bad = Seq(line).toDF("l")
      .select(expr(s"""from_csv(l, '$schema')""").as("r"))
      .select("r.b").as[String].head()
    assert(bad != good, "the default escape must NOT read RFC 4180 doubling")
  }
}
