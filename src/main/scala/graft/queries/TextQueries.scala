package graft.queries

/** Text-analysis / dedup query suite over the documents table — filled in
  * milestone M2 (SURVEY.md §7.2 M5 north-star extensions). */
object TextQueries {
  val all: Seq[(String, Q)] = Seq.empty
}
