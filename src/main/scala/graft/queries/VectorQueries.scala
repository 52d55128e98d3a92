package graft.queries

/** Embedding similarity-search / near-dup suite over the embeddings table —
  * filled in milestone M2 (SURVEY.md §7.2 M5 north-star extensions). */
object VectorQueries {
  val all: Seq[(String, Q)] = Seq.empty
}
