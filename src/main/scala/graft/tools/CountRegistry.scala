package graft.tools

/** Prints the registry size + duplicate-name check (used by README/meta). */
object CountRegistry {
  def main(args: Array[String]): Unit = {
    val names = graft.SparkEntry.registry.map(_.name)
    println(s"registry=${names.size} distinct=${names.distinct.size}")
    val dup = names.groupBy(identity).filter(_._2.size > 1).keys
    if (dup.nonEmpty) println(s"DUPES: ${dup.mkString(",")}")
  }
}
