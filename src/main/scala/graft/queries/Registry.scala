package graft.queries

import graft.QuerySpec

/** Aggregates every query group's specs; adding a new group is a one-line
  * change here. Names must be unique across groups. */
object Registry {
  def specs: Seq[QuerySpec] =
    Relational.specs ++ Text.specs ++ Vectors.specs ++ Domain.specs

  require(specs.map(_.name).distinct.size == specs.size, "duplicate query names")
}
