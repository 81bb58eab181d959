package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.SparkSession

/** Verifies the extensions entry point actually injects the SQL
  * functions into a session built with `withExtensions` (sharing the
  * test JVM's SparkContext; the shared session is restored afterwards).
  */
class GraftExtensionsSpec extends SparkSpec {

  test("withExtensions(GraftExtensions) exposes the custom SQL functions") {
    val shared = spark // force the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val row = s2.sql(
        """SELECT parse_money('$5M') AS m,
          |       url_join('https://a.example/x/y', '../careers') AS u,
          |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d
          |""".stripMargin).head()
      assert(row.getLong(0) == 5000000L)
      assert(row.getString(1) == "https://a.example/careers")
      assert(row.getDouble(2) == 11.0)
      // wrong arity → clean AnalysisException naming the function, not
      // an IndexOutOfBoundsException from the builder
      val err = intercept[org.apache.spark.sql.AnalysisException] {
        s2.sql("SELECT dot_product(array(1.0D))").head()
      }
      assert(err.getMessage.contains("dot_product"), err.getMessage)
      assert(err.getCondition != null &&
        err.getCondition.startsWith("WRONG_NUM_ARGS"), err.getCondition)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
