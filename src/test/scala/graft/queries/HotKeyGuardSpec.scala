package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** The load-bearing 100 TB defense for the co-supply graph family
  * (g06/g15/g16): one power-law part key must NOT explode the pair
  * self-join into deg²(pk) rows. `coSupplyEdges` caps contributors at
  * `coSupplyCapPerKey` lowest suppkeys per part BEFORE pair
  * generation, so a hot key emits at most cap*(cap-1)/2 pairs no
  * matter its raw degree. This spec builds a synthetic hot key (one
  * part supplied by 200 suppliers — 19,900 uncapped pairs) and proves
  * the cap both bounds the blow-up and picks the documented
  * deterministic survivors. */
class HotKeyGuardSpec extends SparkSpec {

  private lazy val hotDir: String = {
    val dir = Files.createTempDirectory("graft_hotkey").toString
    import spark.implicits._
    // one hot part (pk=1) with 200 suppliers, plus a handful of cold
    // parts so the threshold distribution is non-degenerate
    val hot = (1 to 200).map(skv => (skv.toLong, 1L))
    val cold = (1 to 10).flatMap(p => (1 to 3).map(skv => (skv.toLong, 100L + p)))
    (hot ++ cold).toDF("l_suppkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("coSupplyEdges caps a hot part key at cap*(cap-1)/2 pairs") {
    val cap = GraphQueries.coSupplyCapPerKey
    val edges = GraphQueries.coSupplyEdges(spark, hotDir).collect()
    // every survivor of the hot key is among its `cap` lowest suppkeys
    assert(edges.forall(r => r.getLong(0) <= cap && r.getLong(1) <= cap),
      s"edge endpoints exceed the $cap lowest suppkeys: ${edges.take(5).mkString(",")}")
    // bound: at most C(cap,2) from the hot key + C(3,2)*10 cold pairs
    val bound = cap * (cap - 1) / 2 + 30
    assert(edges.length <= bound,
      s"${edges.length} edges exceed the capped bound $bound")
    assert(edges.nonEmpty, "capped graph lost all edges")
  }

  test("engine and oracle CTE sparsify the hot key identically") {
    // replay the oracle CTE text through Spark SQL on the same fixture
    // (DuckDB isn't on this classpath; the CTE is ANSI enough for both)
    spark.read.parquet(s"$hotDir/lineitem.parquet")
      .createOrReplaceTempView("lineitem")
    try {
      // dialect shim: DuckDB spells integer division `//`, Spark `div`
      val cte = GraphQueries.coSupplyEdgesCte.replace("//", "div")
      val sqlEdges = spark
        .sql(s"WITH $cte SELECT u, v FROM edges")
        .collect().map(_.toString).sorted.toSeq
      val dfEdges = GraphQueries.coSupplyEdges(spark, hotDir)
        .collect().map(_.toString).sorted.toSeq
      assert(sqlEdges == dfEdges,
        s"capped edge lists diverge: sql=${sqlEdges.size} df=${dfEdges.size}")
    } finally spark.catalog.dropTempView("lineitem")
  }
}
