package graft.queries

import QueryUtil._

object TimeSeriesQueries {
  val queries: Map[String, QFn] = Map()
  val oracles: Map[String, String] = Map()
}
