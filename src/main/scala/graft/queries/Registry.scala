package graft.queries

/** Central list of every driver-checkable query. Grows per milestone. */
object Registry {
  def all: Seq[NamedQuery] =
    Relational.all ++ SemaOps.all ++ VectorQueries.all ++ TextQueries.all ++
      HybridQueries.all ++ WriteQueries.all ++ DedupQueries.all ++
      PipelineQueries.all ++ QuantizerQueries.all ++ ExtraQueries.all ++
      TrainingQueries.all ++ ScoringQueries.all ++ TemporalQueries.all
}
