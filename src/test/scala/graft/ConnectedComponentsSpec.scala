package graft

import graft.operators.ConnectedComponents
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.operators.ConnectedComponents]]: components must be exact
  * transitive closures (not 1-hop neighborhoods), across chains longer than
  * one propagation round, with untouched singleton-free output.
  */
class ConnectedComponentsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = Session.builder("cc-test").getOrCreate()
  import spark.implicits._

  private def cc(edges: (Long, Long)*): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chains close transitively; separate components stay separate") {
    val got = cc((1L, 2L), (2L, 3L), (10L, 11L), (30L, 20L))
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 30L -> 20L))
  }

  test("a long path needs multiple rounds and still converges to one min") {
    // path 0-1-2-...-12: diameter 12, min label must reach the far end
    val edges = (0L until 12L).map(i => (i, i + 1))
    val got = cc(edges: _*)
    assert(got.size === 13)
    assert(got.values.toSet === Set(0L))
  }

  test("star plus bridge merges both cliques") {
    val got = cc((5L, 6L), (5L, 7L), (8L, 9L), (7L, 8L))
    assert(got.values.toSet === Set(5L))
  }
}
