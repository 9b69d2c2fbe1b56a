package graft

/** Print the registry's key names (one `key: <name>` line each) — the
  * machine-readable registry listing the sharded bench runner and any
  * key-selection tooling consume, without spinning up a SparkSession
  * or hardcoding the inventory in a script. */
object ListKeys {
  def main(args: Array[String]): Unit =
    SparkEntry.queries.keys.toSeq.sorted.foreach(k => println(s"key: $k"))
}
