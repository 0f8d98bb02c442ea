package graft

/** Dev tool: prints the query-registry / oracle-registry diff without
  * starting Spark. Used between rounds to see which queries still lack a
  * DuckDB oracle (the driver records those rows as `no_oracle`).
  */
object RegistryCheck {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    println(s"QUERIES=${q.size}")
    println(s"ORACLES=${o.size}")
    println("NO_ORACLE=" + (q -- o).toSeq.sorted.mkString(","))
    println("ORPHAN=" + (o -- q).toSeq.sorted.mkString(","))
  }
}
