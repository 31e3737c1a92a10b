package graft.queries

/** Assembled query inventory, ordered as in SURVEY.md §2. */
object Registry {
  def all: Seq[QuerySpec] =
    Relational.all ++
    SemiStructured.all ++
    EngineQueries.all ++
    Llm.all
}
