package graft.queries

import graft.core.QueryDef

/** Aggregates every query module into one registry. */
object Registry {
  def all: Map[String, QueryDef] =
    Relational.defs ++ Cdc.defs ++ Text.defs ++ Vectors.defs ++ Streams.defs
}
