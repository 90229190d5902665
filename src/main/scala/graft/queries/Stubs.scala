package graft.queries

// Providers filled in as their operator packages land.
object MeteoQueries { def init(): Unit = MeteoQueriesImpl.init() }
object DisaggQueries { def init(): Unit = DisaggQueriesImpl.init() }
object TextQueries { def init(): Unit = TextQueriesImpl.init() }
object SimilarityQueries { def init(): Unit = SimilarityQueriesImpl.init() }
