package graft.queries

import graft.GraftQuery

// Filled in as the corresponding operator families land.
object TextQueries { val all: Seq[GraftQuery] = Seq.empty }
object DedupQueries { val all: Seq[GraftQuery] = Seq.empty }
object VectorQueries { val all: Seq[GraftQuery] = Seq.empty }
