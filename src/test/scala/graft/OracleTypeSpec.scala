package graft

import java.nio.file.{Files, Paths}

/** Mechanized oracle output-TYPE contract (round-8 verdict task 2).
  *
  * Round 8 shipped two red CORRECTNESS rows whose Spark answers were
  * correct: the oracle SQL left a final `sum()` un-cast, DuckDB returned
  * HUGEINT, pandas made it float64, and the driver's value hash diverged
  * on `149174.0` vs `149174`. The discipline ("cast every final
  * aggregate") was manual; this spec makes it mechanical: every
  * `SparkEntry.oracleSql` entry is DESCRIBEd in DuckDB (no execution)
  * and its final select-list types are checked against the Spark query's
  * schema — HUGEINT always fails, DECIMAL finals fail unless the Spark
  * side is also decimal, and int/float/str/bool/date/nested classes must
  * agree column-by-column.
  *
  * Skips (assume) when python3/duckdb is unavailable in the sandbox.
  */
class OracleTypeSpec extends SparkSuite {

  private def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def run(cmd: Seq[String]): (Int, String) = {
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    (p.waitFor(), out)
  }

  private lazy val duckdbAvailable: Boolean =
    try run(Seq("python3", "-c", "import duckdb"))._1 == 0
    catch { case _: Throwable => false }

  private val script = new java.io.File("scripts/check_types.py").getAbsolutePath

  private def writeContract(entries: Map[String, (String, Map[String, String])]): String = {
    val body = entries.toSeq.sortBy(_._1).map { case (name, (sql, sparkTypes)) =>
      val st = sparkTypes.toSeq.sortBy(_._1)
        .map { case (c, t) => s"${jsonStr(c)}: ${jsonStr(t)}" }
        .mkString("{", ",", "}")
      s"${jsonStr(name)}: {${jsonStr("sql")}: ${jsonStr(sql)}, ${jsonStr("spark")}: $st}"
    }.mkString("{", ",", "}")
    val f = Files.createTempFile("oracle-contract", ".json")
    Files.writeString(f, body)
    f.toString
  }

  test("deliberately un-cast oracle sum is rejected (HUGEINT)") {
    assume(duckdbAvailable, "python3/duckdb not available")
    val contract = writeContract(Map(
      "bad_fixture" -> ("SELECT CAST(1 AS BIGINT) AS k, sum(CAST(r_regionkey AS BIGINT)) AS s FROM region GROUP BY 1",
        Map("k" -> "bigint", "s" -> "bigint"))))
    val (code, out) = run(Seq("python3", script, SparkSuite.sf0001, contract))
    assert(code != 0, s"expected failure, got:\n$out")
    assert(out.contains("HUGEINT"), s"expected a HUGEINT violation, got:\n$out")
  }

  test("class mismatch between oracle and Spark schema is rejected") {
    assume(duckdbAvailable, "python3/duckdb not available")
    val contract = writeContract(Map(
      "bad_class" -> ("SELECT CAST(count(*) AS BIGINT) AS n FROM region",
        Map("n" -> "double"))))
    val (code, out) = run(Seq("python3", script, SparkSuite.sf0001, contract))
    assert(code != 0 && out.contains("CLASS"), s"expected a CLASS violation, got:\n$out")
  }

  test("every registered oracle passes the output-type contract") {
    assume(duckdbAvailable, "python3/duckdb not available")
    val entries = SparkEntry.oracleSql.map { case (name, sql) =>
      val fn = SparkEntry.queries.getOrElse(
        name, fail(s"oracleSql entry $name has no queries entry"))
      val schema = fn(spark, SparkSuite.sf0001).schema
      spark.catalog.clearCache()
      name -> (sql, schema.fields.map(f => f.name -> f.dataType.simpleString).toMap)
    }
    val contract = writeContract(entries)
    val (code, out) = run(Seq("python3", script, SparkSuite.sf0001, contract))
    assert(code == 0, s"oracle type contract violations:\n$out")
  }
}
