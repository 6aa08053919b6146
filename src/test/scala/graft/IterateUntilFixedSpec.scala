package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IterateUntilFixed

/** Contract tests for the shared iteration harness: early exit fires on
  * the right round, round counts match each mode's stated semantics,
  * state frames come back checkpoint-backed (lineage truncated), and the
  * idempotent checkpoint recognizes a pre-checkpointed intermediate.
  */
class IterateUntilFixedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private def isCheckpointBacked(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.logical.getClass.getSimpleName == "LogicalRDD"

  test("localCheckpoint yields a LogicalRDD root (the idempotence probe's premise)") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x")
    assert(!isCheckpointBacked(df))
    assert(isCheckpointBacked(df.localCheckpoint()))
  }

  test("frontier: merges until the delta empties, counts merged rounds only") {
    import spark.implicits._
    // walk 1→2→3 on a 3-node path from node 1: rounds 1-2 merge,
    // round 3's frontier is empty → rounds == 2, schedule cap 5 unused
    val edges = Seq((1, 2), (2, 3)).toDF("src", "dst")
    val init = Seq(1).toDF("node")
    var expansions = 0
    val (st, rounds) = IterateUntilFixed.frontier(
      Map("visited" -> init, "frontier" -> init), 5) { (st, _) =>
      expansions += 1
      edges.join(st("frontier").withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"))
        .join(st("visited"), Seq("node"), "left_anti")
    } { (st, delta, _) =>
      Map("visited" -> st("visited").unionByName(delta), "frontier" -> delta)
    }
    assert(rounds === 2)
    assert(expansions === 3) // the empty probe round still expanded once
    assert(st("visited").collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 2, 3))
    assert(isCheckpointBacked(st("visited")))
    assert(isCheckpointBacked(st("frontier")))
  }

  test("frontier: the round cap stops an always-live iteration") {
    import spark.implicits._
    val one = Seq(1).toDF("x")
    val (_, rounds) = IterateUntilFixed.frontier(
      Map("s" -> one), 3)((_, _) => one)((st, _, _) => st)
    assert(rounds === 3)
  }

  test("converge: the no-change round executes, commits, and counts") {
    import spark.implicits._
    // state doubles a counter until it exceeds 4: rounds 1-2 change,
    // round 3 changes nothing → witness empty → rounds == 3
    val init = Seq(1L).toDF("v")
    val (st, rounds) = IterateUntilFixed.converge(Map("v" -> init), 10) {
      (st, _) =>
        val next = st("v").select(
          when(col("v") < 4, col("v") * 2).otherwise(col("v")).as("v"))
        val changed = next.withColumnRenamed("v", "nv")
          .crossJoin(st("v")).filter(col("nv") =!= col("v"))
        (Map("v" -> next), changed)
    }
    assert(rounds === 3)
    assert(st("v").head().getLong(0) === 4L)
    assert(isCheckpointBacked(st("v")))
  }

  test("fixed: runs the exact schedule and checkpoints each round") {
    import spark.implicits._
    val init = Seq(0L).toDF("v")
    val st = IterateUntilFixed.fixed(Map("v" -> init), 4) { (st, r) =>
      Map("v" -> st("v").select((col("v") + r).as("v")))
    }
    assert(st("v").head().getLong(0) === 10L) // 1+2+3+4
    assert(isCheckpointBacked(st("v")))
  }

  test("a pre-checkpointed intermediate passes through untouched") {
    import spark.implicits._
    var seen: org.apache.spark.sql.DataFrame = null
    val st = IterateUntilFixed.fixed(Map.empty, 1) { (_, _) =>
      seen = Seq(1).toDF("x").localCheckpoint()
      Map("a" -> seen)
    }
    assert(st("a") eq seen) // same object: cp was idempotent
  }

  test("a carried (reference-unchanged) frame is not re-checkpointed") {
    import spark.implicits._
    val keep = Seq(1).toDF("k") // never checkpointed: carried by reference
    val st = IterateUntilFixed.fixed(Map("keep" -> keep), 3) { (st, r) =>
      Map("keep" -> st("keep"), "round" -> Seq(r).toDF("r"))
    }
    assert(st("keep") eq keep)
    assert(st("round").head().getInt(0) === 3)
  }
}
