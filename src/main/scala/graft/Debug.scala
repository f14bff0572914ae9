package graft

import org.apache.spark.sql.SparkSession

// scratch smoke/debug main — not part of the shipped surface
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val entryRows = SparkEntry.entry(spark).collect()
    println(s"entry rows: ${entryRows.length}")
    entryRows.take(3).foreach(println)
    println(s"queries registered: ${SparkEntry.queries.size}")
    println(s"oracles registered: ${SparkEntry.oracleSql.size}")
    val missingOracles = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    println(s"queries without oracle: $missingOracles")
    spark.stop()
  }
}
