package graft.tools
/** Dev-only: print suite size (query count + oracled count). */
object QCount {
  def main(args: Array[String]): Unit = {
    val all = graft.queries.Registry.all
    println(s"queries=${all.size} oracled=${all.count(_._2.oracle.isDefined)}")
  }
}
