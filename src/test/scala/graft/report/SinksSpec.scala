package graft.report

import java.nio.file.Files
import graft.SparkSpec
import graft.queries.StageQueries
import org.apache.spark.sql.functions._

/** Sink-side behavior: the partitioned parquet sink (S4) must
  * round-trip with partition pruning, and the datacard text sink (S9)
  * must render the yields table. */
class SinksSpec extends SparkSpec {

  test("partitionBy sink round-trips and prunes partitions on read") {
    val out = Files.createTempDirectory("graft_sink").toString
    val df = StageQueries.queries("s01_stage1_pipeline")(spark, sf("sf0.001"))
    df.write.mode("overwrite").partitionBy("region").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == df.count())
    // region filter must prune to the one partition directory
    val pruned = back.filter(col("region") === "z-peak")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(region"),
      s"no partition pruning:\n$plan")
    assert(pruned.count() ==
      df.filter(col("region") === "z-peak").count())
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    // warehouse dir is a static conf — set to /tmp via build.sbt javaOptions
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val li = s2.read.parquet(sf("sf0.001") + "/lineitem.parquet")
    val o = s2.read.parquet(sf("sf0.001") + "/orders.parquet")
    val t1 = s"bkt_li_${System.nanoTime()}"
    val t2 = s"bkt_o_${System.nanoTime()}"
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(t1)
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(t2)
    val joined = s2.table(t1).join(s2.table(t2),
      org.apache.spark.sql.functions.col("l_orderkey") ===
        org.apache.spark.sql.functions.col("o_orderkey"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // both sides pre-bucketed on the join key: no Exchange in the plan
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    assert(joined.count() ==
      li.join(o, li("l_orderkey") === o("o_orderkey")).count())
  }

  test("schema evolution: mergeSchema unions columns across parquet batches") {
    // a long-lived dataset gains columns over time; readers must union
    // the per-file schemas instead of failing or silently dropping
    import spark.implicits._
    val out = Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$out/b=1")
    Seq((2L, "b", 3.5)).toDF("id", "v1", "v2").write.parquet(s"$out/b=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert(merged.columns.sorted.toSeq == Seq("b", "id", "v1", "v2"))
    assert(merged.count() == 2)
    val olds = merged.filter(col("id") === 1L).collect()(0)
    assert(olds.isNullAt(olds.fieldIndex("v2")), "missing column must read as null")
  }

  test("json source round-trips the documents table with explicit schema") {
    // S-family: the same tables must load from line-delimited JSON (the
    // common raw-crawl interchange format) — explicit schema, no
    // inference pass at scale
    val out = Files.createTempDirectory("graft_json").toString
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    docs.write.mode("overwrite").json(out)
    val back = spark.read.schema(docs.schema).json(out)
    assert(back.count() == docs.count())
    val a = docs.agg(sum(col("n_chars")), count(col("text"))).collect()(0)
    val b = back.agg(sum(col("n_chars")), count(col("text"))).collect()(0)
    assert(a == b)
  }

  test("csv source round-trips the customer table with explicit schema") {
    // S-family: CSV interchange — explicit schema (no inference scan),
    // header on, round-trip equality on an aggregate fingerprint
    val out = Files.createTempDirectory("graft_csv").toString
    val cust = spark.read.parquet(sf("sf0.001") + "/customer.parquet")
    cust.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.schema(cust.schema)
      .option("header", "true").csv(out)
    assert(back.count() == cust.count())
    val a = cust.agg(sum(col("c_acctbal")), countDistinct(col("c_mktsegment"))).collect()(0)
    val b = back.agg(sum(col("c_acctbal")), countDistinct(col("c_mktsegment"))).collect()(0)
    assert(a == b)
  }

  test("orc source round-trips the orders table") {
    // S-family: ORC is Spark-native columnar — predicate pushdown and
    // column pruning work as with parquet; round-trip plus a pushed
    // filter read
    val out = Files.createTempDirectory("graft_orc").toString
    val ord = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
    ord.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.count() == ord.count())
    val filtered = back.filter(col("o_orderpriority") === "1-URGENT")
    assert(filtered.count() ==
      ord.filter(col("o_orderpriority") === "1-URGENT").count())
  }

  test("TH1D writer round-trips through the ROOT reader, bin for bin") {
    import graft.sources.RootHistFile
    // the flagship's (region, bin, value, sumw2) template — one TH1D
    // per region, S8's full shape (reference: python/io.py:230-235)
    val tmpl = graft.SparkEntry.entry(spark)
      .collect().groupBy(_.getAs[String]("region"))
    val nbins = 40 // entry()'s histogram axis: 40 bins over [0, 160)
    val specs = tmpl.toSeq.sortBy(_._1).map { case (region, rows) =>
      // Histogrammer's bin IS the ROOT cell index (0 = underflow,
      // nbins+1 = overflow) — direct copy, no shift
      val contents = new Array[Double](nbins + 2)
      val sumw2 = new Array[Double](nbins + 2)
      rows.foreach { r =>
        val cell = r.getAs[Long]("bin").toInt
        contents(cell) = r.getAs[Float]("value").toDouble
        sumw2(cell) = r.getAs[Float]("sumw2").toDouble
      }
      RootHistFile.TH1DSpec(s"hist_$region", s"template $region",
        nbins, 0.0, 160.0, Array.empty, contents, sumw2,
        entries = rows.length.toDouble)
    }
    val out = Files.createTempDirectory("graft_root").toString + "/templates.root"
    RootHistFile.writeTH1D(out, specs)
    // 1) direct reader round-trip: every bin + sumw2 + axis exact
    val back = RootHistFile.read(out).sortBy(_.name)
    assert(back.map(_.name) == specs.map(_.name))
    back.zip(specs).foreach { case (h, s) =>
      assert(h.cls == "TH1D" && h.dim == 1)
      assert(h.nbins == s.nbins && h.xmin == s.xmin && h.xmax == s.xmax)
      assert(h.contents.toSeq == s.contents.toSeq,
        s"${h.name}: contents mismatch")
      assert(h.sumw2.toSeq == s.sumw2.toSeq, s"${h.name}: sumw2 mismatch")
      assert(h.entries == s.entries)
    }
    // 2) the DataSource V2 connector reads the written file too — the
    //    same path any downstream Spark job would use
    val df = spark.read.format("root-hist").option("path", out).load()
      .filter(col("content") =!= 0.0)
    val total = df.agg(sum(col("content"))).head.getDouble(0)
    assert(math.abs(total - specs.map(_.contents.sum).sum) < 1e-9)
    assert(df.select(countDistinct(col("hist"))).head.getLong(0) ==
      specs.size)
  }

  test("datacard renders yields with one column per channel") {
    val yields = StageQueries.queries("s04_stage3_templates")(spark, sf("sf0.001"))
    val cards = Datacards.renderAll(yields)
    assert(cards.nonEmpty)
    cards.foreach { case (region, text) =>
      assert(text.contains(s"# Datacard for region $region"))
      assert(text.contains("imax 1"))
      assert(text.contains("rate"))
      assert(text.contains("jes lnN"))
    }
  }
}
