package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, "a", ts("2024-01-01 10:00:00")), // before any right row
    (2L, "a", ts("2024-01-01 12:00:00")), // equal ts to right r1 → eligible
    (3L, "a", ts("2024-01-01 15:00:00")), // after r1 and r2 → latest (r2)
    (4L, "b", ts("2024-01-01 12:30:00")), // other key: only b's rows match
    (5L, "c", ts("2024-01-01 12:30:00"))  // key with no right rows at all
  ).toDF("id", "k", "t")

  private lazy val right = Seq(
    ("a", ts("2024-01-01 12:00:00"), 101L),
    ("a", ts("2024-01-01 14:00:00"), 102L),
    ("b", ts("2024-01-01 12:15:00"), 201L)
  ).toDF("k", "rt", "rid")

  private lazy val joined = AsOfJoin.asofJoin(left, right, Seq("k"), "t", "rt")
    .select($"id", $"asof_rid").as[(Long, Option[Long])].collect().toMap

  test("picks the latest right row at-or-before each left timestamp") {
    assert(joined(2L) === Some(101L), "equal timestamp must be eligible")
    assert(joined(3L) === Some(102L), "must carry the LATEST matching row")
  }

  test("left rows with no eligible match keep null right columns") {
    assert(joined(1L) === None, "left row before all right rows")
    assert(joined(5L) === None, "key absent from right side")
  }

  test("keys do not leak into each other") {
    assert(joined(4L) === Some(201L))
    assert(joined.size === 5, "exactly one output row per left row")
  }

  test("NULL keys never match (SQL join semantics, like the ASOF oracle)") {
    val l = Seq((1L, Option("a"), ts("2024-01-01 12:30:00")),
      (2L, Option.empty[String], ts("2024-01-01 12:30:00")))
      .toDF("id", "k", "t")
    val r = Seq((Option("a"), ts("2024-01-01 12:00:00"), 101L),
      (Option.empty[String], ts("2024-01-01 12:00:00"), 102L))
      .toDF("k", "rt", "rid")
    val out = AsOfJoin.asofJoin(l, r, Seq("k"), "t", "rt")
      .select($"id", $"asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(out(1L) === Some(101L))
    assert(out(2L) === None, "null-key left row must not match null-key right")
  }

  test("right rows tied on (key, ts) resolve to the greatest row — deterministically") {
    // three right rows at the identical (key, ts): the winner must be the
    // lexicographically greatest right struct (k, rt, rid) → rid 303,
    // regardless of input order or partitioning
    val l = Seq((1L, "a", ts("2024-01-01 13:00:00"))).toDF("id", "k", "t")
    val r = Seq(("a", ts("2024-01-01 12:00:00"), 303L),
      ("a", ts("2024-01-01 12:00:00"), 301L),
      ("a", ts("2024-01-01 12:00:00"), 302L))
      .toDF("k", "rt", "rid").repartition(3) // scatter the tied rows
    (1 to 3).foreach { _ =>
      val out = AsOfJoin.asofJoin(l, r, Seq("k"), "t", "rt")
        .select($"asof_rid").as[Long].collect().toSeq
      assert(out === Seq(303L))
    }
  }

  test("plan shape: one exchange, no join node, no cartesian blowup") {
    val plan = AsOfJoin.asofJoin(left, right, Seq("k"), "t", "rt")
      .queryExecution.executedPlan.toString
    Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct").foreach(n =>
      assert(!plan.contains(n), s"merge-based as-of must not plan a $n"))
    assert(plan.contains("Exchange hashpartitioning"),
      "single hash repartition expected")
  }
}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val ev = Seq(
    (1L, "u1", ts("2024-01-01 10:00:00")),
    (2L, "u1", ts("2024-01-01 10:30:00")), // same session (gap 1800 < 3600)
    (3L, "u1", ts("2024-01-01 12:00:00")), // 5400s gap → new session
    (4L, "u2", ts("2024-01-01 10:00:00"))  // other user: own session
  ).toDF("event_id", "user_id", "ts")

  test("gap over threshold starts a new session; sessions are per key") {
    val out = Sessionize.assignSessions(ev, Seq("user_id"), col("ts"),
        col("event_id"), gapSeconds = 3600L)
      .select($"event_id", $"session_idx").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("sessionStats aggregates bounds and duration") {
    val stats = Sessionize.sessionStats(ev, Seq("user_id"), col("ts"),
        col("event_id"), gapSeconds = 3600L)
      .select($"user_id", $"session_idx", $"n_events", $"duration_s")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(stats === Set(("u1", 1L, 2L, 1800L), ("u1", 2L, 1L, 0L),
      ("u2", 1L, 1L, 0L)))
  }

  test("sessionSummary: bounce share and means over the session table") {
    val got = Sessionize.sessionSummary(ev, Seq("user_id"), col("ts"),
        col("event_id"), gapSeconds = 3600L)
      .as[(Long, Long, Double, Double, Double)].collect().head
    // 3 sessions, 2 bounces (u1 session 2, u2); 4 events; 1800s total
    assert(got === ((3L, 2L, 0.666667, 1.333333, 600.0)))
  }

  test("matches Spark's built-in session_window aggregation") {
    // same gap semantics: merged windows = gap-based sessions
    val builtin = ev
      .groupBy(col("user_id"), session_window(col("ts"), "3600 seconds"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"))
      .select($"user_id", $"n_events", $"session_start")
      .as[(String, Long, java.sql.Timestamp)].collect().toSet
    val ours = Sessionize.sessionStats(ev, Seq("user_id"), col("ts"),
        col("event_id"), gapSeconds = 3600L)
      .select($"user_id", $"n_events", $"session_start")
      .as[(String, Long, java.sql.Timestamp)].collect().toSet
    assert(ours === builtin)
  }
}

class DupClustersSpec extends SparkSpec {
  import spark.implicits._

  test("multi-hop chains resolve to the component minimum") {
    val vertices = (1L to 7L).toDF("id")
    // chain 1-2-3-4 (diameter 3), pair 5-6, singleton 7
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (5L, 6L)).toDF("src", "dst")
    val labels = DupClusters.connectedComponents(vertices, edges)
      .as[(Long, Long)].collect().toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("clusterSizes reports members per representative") {
    val vertices = (1L to 4L).toDF("id")
    val edges = Seq((1L, 2L), (3L, 2L)).toDF("src", "dst")
    val sizes = DupClusters.clusterSizes(
        DupClusters.connectedComponents(vertices, edges))
      .as[(Long, Long)].collect().toMap
    assert(sizes === Map(1L -> 3L, 4L -> 1L))
  }

  test("iteration working set is restricted to edge-incident vertices") {
    // 1000 vertices, only 4 touch an edge: the loop must work over 4 rows,
    // with the isolated 996 unioned back as their own representative
    val vertices = (1L to 1000L).toDF("id")
    val edges = Seq((10L, 20L), (20L, 30L), (500L, 400L)).toDF("src", "dst")
    val incident = incidentVertices(vertices, edges)
      .as[Long].collect().toSet
    assert(incident === Set(10L, 20L, 30L, 400L, 500L))
    val labeled = DupClusters.connectedComponents(vertices, edges,
      localMaxEdges = 0L) // force the distributed loop under test
    // the isolated branch re-enters as a Union in the final plan
    assert(labeled.queryExecution.optimizedPlan.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }.nonEmpty, "expected isolated-vertex union-back in the plan")
    val labels = labeled.as[(Long, Long)].collect().toMap
    assert(labels.size === 1000)
    assert(labels(10L) === 10L && labels(20L) === 10L && labels(30L) === 10L)
    assert(labels(400L) === 400L && labels(500L) === 400L)
    // spot-check isolated vertices map to themselves
    assert(labels(1L) === 1L && labels(999L) === 999L)
  }

  // spec-local mirror of the working-set derivation both CC paths inline
  // (endpoints ∩ vertex universe) — kept here as the reference semantics
  // the tests assert against, since the operator no longer exports it
  private def incidentVertices(vertices: DataFrame, edges: DataFrame): DataFrame =
    edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct()
      .join(vertices.select(col("id")), Seq("id"), "left_semi")

  test("incidentVertices respects the vertex universe") {
    val vertices = Seq(1L, 2L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 99L)).toDF("src", "dst")
    assert(incidentVertices(vertices, edges)
      .as[Long].collect().toSet === Set(1L, 2L))
  }

  test("deep chains converge in log rounds via pointer jumping") {
    // a diameter-199 chain needs 199 plain min-label rounds; with pointer
    // jumping from round 6 the remaining distance halves each round, so
    // maxIter = 14 must suffice (5 + ~log2(200)). strict mode makes a
    // convergence failure loud instead of silently mislabeled.
    val n = 200L
    val vertices = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("src", "dst")
    val labels = DupClusters.connectedComponents(vertices, edges,
        maxIter = 14, failOnNonConvergence = true, localMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(labels.size === n)
    assert(labels.values.forall(_ === 1L), "whole chain labels to the min id")
  }

  test("local union-find path equals the distributed loop on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 30 + trial * 10
      val vertices = (1L to n.toLong).toDF("id")
      val edges = Seq.fill(n / 2)(
          (rnd.nextInt(n).toLong + 1, rnd.nextInt(n).toLong + 1))
        .toDF("src", "dst")
      val local = DupClusters.connectedComponents(vertices, edges)
        .as[(Long, Long)].collect().toMap
      val loop = DupClusters.connectedComponents(vertices, edges,
          failOnNonConvergence = true, localMaxEdges = 0L)
        .as[(Long, Long)].collect().toMap
      assert(local === loop, s"trial $trial diverged")
    }
  }

  test("local path ignores edges with out-of-universe endpoints, like the loop") {
    // edge 2-99 has an endpoint outside the universe; in the propagation
    // loop an unlabeled endpoint never carries a label across, so 2 stays
    // its own representative — the local path must match
    val vertices = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((2L, 99L), (99L, 3L)).toDF("src", "dst")
    val local = DupClusters.connectedComponents(vertices, edges)
      .as[(Long, Long)].collect().toMap
    val loop = DupClusters.connectedComponents(vertices, edges,
        localMaxEdges = 0L).as[(Long, Long)].collect().toMap
    assert(local === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
    assert(local === loop)
  }

  test("local path handles string ids with lexicographic minima") {
    val vertices = Seq("d", "b", "a", "c", "z").toDF("id")
    val edges = Seq(("d", "b"), ("b", "c")).toDF("src", "dst")
    val labels = DupClusters.connectedComponents(vertices, edges)
      .as[(String, String)].collect().toMap
    assert(labels === Map("a" -> "a", "b" -> "b", "c" -> "b",
      "d" -> "b", "z" -> "z"))
  }

  test("LongLongMap matches a boxed map under random churn, incl. sentinels") {
    val rnd = new scala.util.Random(11)
    val m = new LongLongMap(4) // force several grows
    val ref = scala.collection.mutable.HashMap.empty[Long, Long]
    val keys = Seq(Long.MinValue, Long.MaxValue, 0L, -1L) ++
      Seq.fill(5000)(rnd.nextLong() % 1000) // heavy overwrite traffic
    keys.foreach { k =>
      val v = rnd.nextLong()
      m.put(k, v); ref(k) = v
      assert(m.contains(k) && m.get(k) === v)
    }
    assert(m.size === ref.size)
    assert(m.keyIterator.toSet === ref.keySet)
    ref.foreach { case (k, v) => assert(m.get(k) === v) }
    assert(!m.contains(123456789012L))
  }

  test("distributed loop leaves no cached state; result survives cleanup") {
    // deep chain → the loop runs past round 3, so localCheckpoint
    // truncation generations exist — exactly the RDDs Dataset.unpersist
    // cannot release. The scoped guard must drop them all before return,
    // and the spill-decoupled result must stay consumable afterwards.
    val vertices = (1L to 50L).toDF("id")
    val edges = (1L until 20L).map(i => (i, i + 1)).toDF("src", "dst")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val labeled = DupClusters.connectedComponents(vertices, edges,
      maxIter = 14, failOnNonConvergence = true, localMaxEdges = 0L)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.diff(before)
    assert(leaked.isEmpty, s"dupClusters leaked persistent RDDs: $leaked")
    val labels = labeled.as[(Long, Long)].collect().toMap
    assert(labels.size === 50 && labels(20L) === 1L && labels(50L) === 50L)
    assert(labeled.count() === 50) // re-consumption: reads the spill again
  }

  test("failOnNonConvergence throws when maxIter truncates propagation") {
    val vertices = (1L to 5L).toDF("id")
    // chain of diameter 4 cannot converge in one round
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      DupClusters.connectedComponents(vertices, edges, maxIter = 1,
        failOnNonConvergence = true, localMaxEdges = 0L).collect()
    }
    assert(e.getMessage.contains("without converging"))
  }
}
