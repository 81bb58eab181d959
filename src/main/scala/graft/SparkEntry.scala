package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1Agg.run(spark, "/root/testdata/sf0.001")

  private def allDefs: Seq[QueryDef] =
    Queries.all ++ Queries2.all ++ Queries3.all ++ Queries4.all ++
      Queries5.all ++ Queries6.all ++ Queries7.all ++ Queries8.all ++
      Queries9.all ++ Queries10.all ++ Queries11.all ++ Queries12.all ++
      Queries13.all ++ Queries14.all ++ Queries15.all ++ Queries16.all ++
      Queries17.all ++ Queries18.all ++ Queries19.all ++ Queries20.all ++
      Queries21.all ++ Queries22.all ++ Queries23.all

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
