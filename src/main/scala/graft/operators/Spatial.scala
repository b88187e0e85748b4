package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Planar spatial joins over integer coordinates — the "all points of B
  * within r of each point of A" primitive (store-to-customer distance,
  * sensor neighborhoods, embedding-grid blocking). Euclidean on integer
  * meters, so the distance test is EXACT int64 arithmetic (dx²+dy² ≤ r²) —
  * no trigonometry, nothing engine-dependent to a ulp; callers with
  * lat/lon project to planar integer meters first (the standard local-grid
  * projection), which keeps every replay bit-identical.
  *
  * Scale shape: grid blocking with cell side = r. A point only needs
  * candidates from its own and the 8 adjacent cells, so the RIGHT side
  * explodes ×9 into its neighborhood cells and the join is a plain
  * equi-join on the cell key — one shuffle per side, never a cross join,
  * and AQE's skew split handles a hot cell (city center) like any other
  * hot join key. Each qualifying pair is produced exactly ONCE (the left
  * point's cell matches exactly one of the right point's 9 offsets).
  */
object Spatial {

  /** Pairs (l, r) with (l.x−r.x)² + (l.y−r.y)² ≤ radius², both sides'
    * selected id column carried through. Coordinates must be non-negative
    * int64 (a planar-projection contract — enforced loudly in-plan, since
    * a silently floor-divided negative coordinate would land in the wrong
    * cell and lose pairs).
    *
    * Output: (idL, idR, x/y of both sides, dist2).
    */
  def radiusJoin(left: DataFrame, right: DataFrame,
      idCol: String, xCol: String, yCol: String, radius: Long): DataFrame = {
    require(radius > 0, s"radius must be positive, got $radius")
    def guard(c: String, side: DataFrame): DataFrame =
      side.withColumn(c,
        when(col(c).isNull || col(c) < 0,
          raise_error(concat(lit(s"radiusJoin: $c must be >= 0, got "),
            coalesce(col(c).cast("string"), lit("null")))))
          .otherwise(col(c).cast("long")))
    val l = guard(yCol, guard(xCol, left))
      .select(col(idCol).as("id_l"), col(xCol).as("xl"), col(yCol).as("yl"))
      .withColumn("cx", expr(s"xl div $radius"))
      .withColumn("cy", expr(s"yl div $radius"))
    val r = guard(yCol, guard(xCol, right))
      .select(col(idCol).as("id_r"), col(xCol).as("xr"), col(yCol).as("yr"))
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("cx", expr(s"(xr div $radius) + dx"))
      .withColumn("cy", expr(s"(yr div $radius) + dy"))
      .drop("dx", "dy")
    l.join(r, Seq("cx", "cy"))
      .withColumn("dist2",
        (col("xl") - col("xr")) * (col("xl") - col("xr")) +
          (col("yl") - col("yr")) * (col("yl") - col("yr")))
      .filter(col("dist2") <= lit(radius * radius))
      .select(col("id_l"), col("id_r"), col("xl"), col("yl"),
        col("xr"), col("yr"), col("dist2"))
  }
}
