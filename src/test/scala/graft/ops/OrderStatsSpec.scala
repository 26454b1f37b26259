package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import graft.ops.OrderStats.PctSpec

class OrderStatsSpec extends SparkSpecBase {
  import spark.implicits._

  private def viaAggregate(df: org.apache.spark.sql.DataFrame, group: String,
                           specs: Seq[PctSpec]) = {
    val aggs = specs.map(s =>
      expr(s"percentile(${s.value}, ${s.p})").as(s.out))
    df.groupBy(col(group)).agg(aggs.head, aggs.tail: _*)
  }

  private def asMap(rows: Array[org.apache.spark.sql.Row],
                    nSpecs: Int): Map[Any, Seq[Any]] =
    rows.map(r => r.get(0) -> (1 to nSpecs).map(r.get)).toMap

  test("matches the percentile aggregate on randomized grouped data") {
    // Deterministic pseudo-random data: groups of very different sizes,
    // near-unique doubles (the aggregate's worst case), forced across
    // many partitions so groups span range-partition boundaries.
    val rows = (1 to 10000).map { i =>
      val g = s"g${i % 7}"
      val v = math.sin(i * 12.9898) * 43758.5453 % 100.0
      (g, v, (i % 50).toDouble)
    }
    val df = rows.toDF("k", "price", "qty").repartition(16)
    val specs = Seq(PctSpec("price", 0.95, "p95"), PctSpec("qty", 0.5, "med"),
      PctSpec("price", 0.0, "pmin"), PctSpec("price", 1.0, "pmax"))
    val got = asMap(
      OrderStats.groupedPercentiles(df, "k", specs).collect(), specs.length)
    val want = asMap(viaAggregate(df, "k", specs).collect(), specs.length)
    assert(got.keySet === want.keySet)
    got.keySet.foreach { k =>
      (got(k) zip want(k)).foreach { case (a, b) =>
        assert(a.asInstanceOf[Double] === b.asInstanceOf[Double],
          s"group $k")
      }
    }
  }

  test("single-element and two-element groups interpolate exactly") {
    val df = Seq(("a", 10.0), ("b", 1.0), ("b", 2.0)).toDF("k", "v")
    val got = asMap(OrderStats.groupedPercentiles(df, "k",
      Seq(PctSpec("v", 0.5, "med"))).collect(), 1)
    assert(got("a") === Seq(10.0))
    assert(got("b") === Seq(1.5))
  }

  test("null values are excluded like the aggregate; all-null group is absent") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", None)).toDF("k", "v")
    val got = asMap(OrderStats.groupedPercentiles(df, "k",
      Seq(PctSpec("v", 0.5, "med"))).collect(), 1)
    assert(got("a") === Seq(2.0))
    assert(!got.contains("b"))
  }

  test("long group keys work (no string assumption)") {
    val df = Seq((1L, 5.0), (1L, 7.0), (2L, 9.0)).toDF("k", "v")
    val got = asMap(OrderStats.groupedPercentiles(df, "k",
      Seq(PctSpec("v", 0.25, "q1"))).collect(), 1)
    assert(got(1L) === Seq(5.5))
    assert(got(2L) === Seq(9.0))
  }

  test("histogram and sort branches agree bit-for-bit (route parity)") {
    // near-unique doubles AND heavy duplicates mixed, so both branch
    // mechanics (cumulative cell walk vs range-sort offset extraction)
    // are exercised on ties and on singletons
    val rows = (1 to 8000).map { i =>
      val g = s"g${i % 5}"
      val v = if (i % 3 == 0) (i % 25).toDouble // duplicate-heavy
              else math.cos(i * 78.233) * 12345.6789 % 50.0
      (g, v)
    }
    val df = rows.toDF("k", "v").repartition(16)
    val specs = Seq(PctSpec("v", 0.5, "med"), PctSpec("v", 0.95, "p95"),
      PctSpec("v", 0.0, "lo"), PctSpec("v", 1.0, "hi"))
    // default cap -> histogram branch; cap 0 -> forced sort branch
    val hist = asMap(
      OrderStats.groupedPercentiles(df, "k", specs).collect(), specs.length)
    val sort = asMap(OrderStats.groupedPercentiles(df, "k", specs,
      histogramMaxCells = 0L).collect(), specs.length)
    assert(hist.keySet === sort.keySet)
    hist.keySet.foreach { k =>
      (hist(k) zip sort(k)).foreach { case (a, b) =>
        // bit-for-bit: both branches pick the same order statistics and
        // share one interpolation
        assert(a.asInstanceOf[Double] === b.asInstanceOf[Double], s"group $k")
      }
    }
    // and both match the aggregate
    val want = asMap(viaAggregate(df, "k", specs).collect(), specs.length)
    hist.keySet.foreach { k =>
      (hist(k) zip want(k)).foreach { case (a, b) =>
        assert(a.asInstanceOf[Double] === b.asInstanceOf[Double], s"group $k")
      }
    }
  }

  test("per-spec routing: mixed histogram/sort split matches both pure branches") {
    // price is near-unique (~6000 cells), qty is bounded (~50 cells): a
    // cap between the two routes price to the sort branch and qty to the
    // histogram branch IN ONE CALL — the r18 split. Results must be
    // bit-identical to the all-histogram and all-sort forms and to the
    // aggregate.
    val rows = (1 to 6000).map { i =>
      val g = s"g${i % 4}"
      val price = math.sin(i * 3.7171) * 9876.54321 % 200.0
      (g, price, (i % 50).toDouble)
    }
    val df = rows.toDF("k", "price", "qty").repartition(8)
    val specs = Seq(PctSpec("price", 0.95, "p95"), PctSpec("qty", 0.5, "med"),
      PctSpec("price", 0.25, "q1"))
    val mixed = asMap(OrderStats.groupedPercentiles(df, "k", specs,
      histogramMaxCells = 1000L).collect(), specs.length)
    val allHist = asMap(
      OrderStats.groupedPercentiles(df, "k", specs).collect(), specs.length)
    val allSort = asMap(OrderStats.groupedPercentiles(df, "k", specs,
      histogramMaxCells = 0L).collect(), specs.length)
    val want = asMap(viaAggregate(df, "k", specs).collect(), specs.length)
    assert(mixed.keySet === want.keySet)
    mixed.keySet.foreach { k =>
      specs.indices.foreach { j =>
        val m = mixed(k)(j).asInstanceOf[Double]
        assert(m === want(k)(j).asInstanceOf[Double], s"group $k spec $j vs aggregate")
        assert(m === allHist(k)(j).asInstanceOf[Double], s"group $k spec $j vs histogram")
        assert(m === allSort(k)(j).asInstanceOf[Double], s"group $k spec $j vs sort")
      }
    }
  }
}
