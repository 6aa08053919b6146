package graft.ops

import org.apache.spark.sql.DataFrame

/** The one loop harness for every iterative DataFrame algorithm in the
  * repo (BFS, Bellman–Ford SSSP, Luby MIS, delta-CC, LPA, k-core /
  * k-truss peeling, dup-cluster pointer-jumping CC, power iteration,
  * grid-DBSCAN label spread).
  *
  * Iterative Spark has exactly three failure modes, and each used to be
  * re-defended by hand at every call site:
  *
  *   1. '''Lineage growth''' — every round's plan nests the previous
  *      round's, so round N costs O(N) to plan and a stack overflow to
  *      execute at depth. Defense: `localCheckpoint` each round's state.
  *   2. '''Wasted tail rounds''' — a fixed schedule keeps joining an
  *      empty frontier after convergence (on a sparse or fully-explored
  *      graph that is MOST of the schedule). Defense: an explicit
  *      empty-delta exit, probed on the just-materialized frame (one
  *      partition head, not a recompute).
  *   3. '''Unbounded loops''' — a convergence-only condition never fires
  *      on a pathological input. Defense: a hard round cap.
  *
  * This object enforces all three '''by construction''': state is a
  * `Map[String, DataFrame]`, and after every round the harness
  * localCheckpoints every frame the step replaced (reference-unchanged
  * frames — e.g. a carried accumulator — and the already-checkpointed
  * delta are recognized by `eq` and not re-materialized). Call sites
  * supply only the algorithm: the per-round dataflow and the merge.
  * Rounds are 1-based; every entry point takes a hard cap.
  *
  * Three shapes cover every iterative algorithm here:
  *
  *   - [[frontier]] — '''check-then-merge''': compute a delta (the
  *     frontier) from the state; an EMPTY delta ends the schedule
  *     ''before'' any merge, and the returned round count is the number
  *     of rounds that merged (BFS expansions, SSSP relaxations, MIS
  *     selections).
  *   - [[converge]] — '''merge-then-check''': every executed round
  *     commits its state, then a change-witness frame decides whether to
  *     continue; the final (no-change) round still counts (delta-CC,
  *     pointer-jump CC).
  *   - [[fixed]] — a fixed synchronous schedule with no early exit,
  *     when the round count is part of the CONTRACT (LPA's 3 sync
  *     rounds, k-core/k-truss peel trajectories, power iteration).
  */
object IterateUntilFixed {

  /** Named iteration state. Keys are the algorithm's own vocabulary
    * ("visited", "frontier", "dist", ...); values are replaced
    * wholesale each round and checkpointed by the harness.
    */
  type State = Map[String, DataFrame]

  /** Idempotent localCheckpoint: a frame whose plan root is already a
    * checkpoint-backed `LogicalRDD` (a step may pre-checkpoint an
    * intermediate that feeds TWO state frames, so neither consumer
    * recomputes it) passes through instead of re-materializing.
    *
    * Matched on the `LogicalRDD` class itself, not its simple name (a
    * string match is brittle across Spark versions). Caveat this
    * inherits from the plan shape: a state frame built DIRECTLY from an
    * RDD (`spark.createDataFrame(rdd, schema)`) also roots at
    * `LogicalRDD` and is treated as pre-checkpointed — correct for
    * lineage (an RDD root has no Catalyst lineage to truncate; the
    * caller owns its persistence), and no engine step builds state
    * that way.
    */
  private def cp(df: DataFrame): DataFrame =
    df.queryExecution.logical match {
      case _: org.apache.spark.sql.execution.LogicalRDD => df
      case _ => df.localCheckpoint()
    }

  /** Checkpoint every frame `next` replaced; frames carried by reference
    * from `prev` (or listed in `reuse` — e.g. the already-checkpointed
    * delta) pass through untouched.
    */
  private def cpChanged(prev: State, next: State,
      reuse: Seq[DataFrame]): State =
    next.map { case (k, df) =>
      k -> (if (prev.get(k).exists(_ eq df) || reuse.exists(_ eq df)) df
            else cp(df))
    }

  /** Frontier iteration (check-then-merge). Per round: `expand` derives
    * the delta from the state; the harness checkpoints it and probes
    * emptiness — empty ends the schedule with NO merge (an empty
    * frontier can never add rows, so output is identical to running the
    * full schedule). Otherwise `merge` folds the checkpointed delta into
    * the state. Returns (final state, rounds that MERGED).
    */
  def frontier(init: State, maxRounds: Int)(
      expand: (State, Int) => DataFrame)(
      merge: (State, DataFrame, Int) => State): (State, Int) = {
    var st = init
    var rounds = 0
    var r = 1
    var live = true
    while (r <= maxRounds && live) {
      val delta = cp(expand(st, r))
      if (delta.isEmpty) live = false
      else {
        st = cpChanged(st, merge(st, delta, r), Seq(delta))
        rounds = r
      }
      r += 1
    }
    (st, rounds)
  }

  /** Converging iteration (merge-then-check). Per round: `step` returns
    * (next state, change witness); the harness checkpoints the state,
    * then stops once the witness is empty — the witness round still
    * counts (it executed, it just proved the fixpoint). If the witness
    * IS one of the state frames it is probed through its checkpointed
    * form; a derived witness (e.g. a changed-rows join) is probed
    * lazily — a one-shot `take(1)` existence scan, never reused.
    * Returns (final state, rounds EXECUTED).
    */
  def converge(init: State, maxRounds: Int)(
      step: (State, Int) => (State, DataFrame)): (State, Int) = {
    var st = init
    var rounds = 0
    var r = 1
    var live = true
    while (r <= maxRounds && live) {
      val (next, w0) = step(st, r)
      val pairs = next.toSeq.map { case (k, df) =>
        (k, df, if (st.get(k).exists(_ eq df)) df else cp(df))
      }
      st = pairs.map(p => (p._1, p._3)).toMap
      rounds = r
      val witness = pairs.collectFirst { case (_, o, c) if o eq w0 => c }
        .getOrElse(w0)
      if (witness.isEmpty) live = false
      r += 1
    }
    (st, rounds)
  }

  /** Fixed synchronous schedule: exactly `rounds` steps, state
    * checkpointed each round, no early exit — for algorithms whose
    * round count is part of the cross-engine contract (the oracle
    * unrolls the same N rounds).
    */
  def fixed(init: State, rounds: Int)(step: (State, Int) => State): State = {
    var st = init
    var r = 1
    while (r <= rounds) {
      st = cpChanged(st, step(st, r), Nil)
      r += 1
    }
    st
  }
}
