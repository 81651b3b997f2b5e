package graft.queries

import QueryUtil._

object StreamingQueries {
  val queries: Map[String, QFn] = Map()
  val oracles: Map[String, String] = Map()
}
