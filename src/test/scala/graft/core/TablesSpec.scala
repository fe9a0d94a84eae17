package graft.core

import graft.SparkSpec

class TablesSpec extends SparkSpec {

  test("registerAll makes every table SQL-addressable with normalized types") {
    val names = Tables.registerAll(spark, "/root/testdata/sf0.001")
    assert(names.size == 10)
    for (n <- names)
      assert(spark.sql(s"SELECT * FROM $n LIMIT 1").columns.nonEmpty, n)
    // events.ts must arrive as a real timestamp (the ns-parquet contract),
    // so SQL date functions work directly.
    val days = spark.sql(
      "SELECT count(DISTINCT CAST(ts AS DATE)) FROM events").head().getLong(0)
    assert(days > 0)
    // A representative oracle-style join runs verbatim.
    val n = spark.sql(
      """SELECT count(*) FROM orders o JOIN customer c
        |ON o.o_custkey = c.c_custkey""".stripMargin).head().getLong(0)
    assert(n > 0)
  }
}
