package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.{GraftQuery, QueryModule}

/** As-of join (SURVEY.md §2B joins): "for each left row, the nearest right
  * row at-or-before its timestamp". Spark has no built-in; per SURVEY.md §7.3
  * we compose existing operators two ways and keep both ANSI-expressible so
  * the DuckDB oracle runs the identical semantics:
  *
  *  - q47: equi-join on key + time-range predicate, then top-1 per left row
  *    (ROW_NUMBER). Simple; intermediate size = matches before pruning.
  *  - q48: the merge-sorted shape — union both sides, one window sorted by
  *    (ts, kind, id) per key, `last(..., ignoreNulls)` carries the latest
  *    right-side id forward. ONE shuffle on the join key, no blow-up: this
  *    is the 100 TB plan (equivalent to the sort-merge as-of in kdb/duckdb).
  *
  * Fixture semantics: each `click` event matches the latest `purchase` of
  * the same user at-or-before its time.
  */
object AsofJoinQueries extends QueryModule {

  def queries: Seq[GraftQuery] = Seq(

    // As-of via range-join + top-1. Tiebreakers: latest purchase ts, then
    // highest purchase id (total order → deterministic in both engines).
    q("q47_asof_join",
      """SELECT click_id, user_id, purchase_id FROM (
        |  SELECT c.event_id AS click_id, c.user_id AS user_id,
        |         p.event_id AS purchase_id,
        |         ROW_NUMBER() OVER (PARTITION BY c.event_id
        |             ORDER BY p.ts DESC, p.event_id DESC) AS rn
        |  FROM events c JOIN events p
        |    ON p.user_id = c.user_id AND p.ts <= c.ts
        |  WHERE c.event_type = 'click' AND p.event_type = 'purchase') t
        |WHERE rn = 1
        |ORDER BY click_id""".stripMargin) { spark =>
      import spark.implicits._
      val ev = spark.table("events")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id".as("click_id"), $"user_id", $"ts".as("cts"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id".as("purchase_id"), $"user_id".as("p_user"),
          $"ts".as("pts"))
      val w = Window.partitionBy($"click_id")
        .orderBy($"pts".desc, $"purchase_id".desc)
      clicks.join(purchases,
          $"p_user" === $"user_id" && $"pts" <= $"cts")
        .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"click_id", $"user_id", $"purchase_id")
        .orderBy($"click_id")
    },

    // As-of via union + carry-forward window — single shuffle on user_id,
    // linear intermediate. `last(ignoreNulls)` ≡ SQL LAST_VALUE IGNORE
    // NULLS; kind=0 sorts purchases before clicks at equal ts so an
    // exactly-simultaneous purchase is visible to the click.
    q("q48_asof_union_window",
      """SELECT click_id, user_id, purchase_id FROM (
        |  SELECT event_id AS click_id, user_id, kind,
        |         LAST_VALUE(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
        |                 ROWS UNBOUNDED PRECEDING) AS purchase_id
        |  FROM (
        |    SELECT event_id, user_id, ts,
        |           CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS kind
        |    FROM events WHERE event_type IN ('click', 'purchase')) u) t
        |WHERE kind = 1 AND purchase_id IS NOT NULL
        |ORDER BY click_id""".stripMargin) { spark =>
      import spark.implicits._
      val u = spark.table("events")
        .filter($"event_type".isin("click", "purchase"))
        .select($"event_id", $"user_id", $"ts",
          when($"event_type" === "purchase", 0).otherwise(1).as("kind"))
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts", $"kind", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      u.withColumn("purchase_id",
          last(when($"kind" === 0, $"event_id"), ignoreNulls = true).over(w))
        .filter($"kind" === 1 && $"purchase_id".isNotNull)
        .select($"event_id".as("click_id"), $"user_id", $"purchase_id")
        .orderBy($"click_id")
    })
}
