package graft

import org.apache.spark.sql.execution.FormattedMode

/** Plan-shape regression guards: cheap FormattedMode string assertions at
  * sf0.001 so a future edit cannot silently reintroduce the round-2
  * pathological shapes (per-field JSON re-parse; unpruned scans). These test
  * the OPTIMIZED plan, not results — the correctness gate covers values.
  */
class PlanGuardSpec extends SparkSpec {

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.explainString(FormattedMode)

  test("q_from_json parses each document exactly once") {
    val plan = formatted("q_from_json")
    val n = "from_json".r.findAllMatchIn(plan).size
    assert(n == 1,
      s"expected exactly 1 from_json evaluation in the plan, got $n:\n$plan")
  }

  test("q_scan_project prunes the lineitem scan to its 4 used columns") {
    val plan = formatted("q_scan_project")
    val read = plan.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(fail(s"no ReadSchema line in plan:\n$plan"))
    val fields = read.substring(read.indexOf("struct<") + "struct<".length)
      .stripSuffix(">").split(",").map(_.split(":")(0).trim).toSet
    val expected =
      Set("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    assert(fields == expected,
      s"scan should read exactly $expected, got $fields in:\n$read")
  }
}
