package graft.tools

/** Print one or more `SparkEntry.oracleSql` entries — lets the DuckDB
  * side of a new oracle be iterated on without a full Verify run. */
object DumpOracle {
  def main(args: Array[String]): Unit =
    args.foreach { q =>
      println(s"-- === $q ===")
      println(graft.SparkEntry.oracleSql(q))
    }
}
