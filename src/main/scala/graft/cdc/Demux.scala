package graft.cdc

import org.apache.spark.sql.{Dataset, SparkSession}

/** Table demux + typed mapping — the Spark-native form of the reference's
  * `KeyedProcessFunction` side outputs (CustomJob.java:204-218) and custom
  * deserializer (CustomJob.java:221-272).
  *
  * Spark has no side outputs; the idiomatic mapping (SURVEY §2 T3) is N
  * filtered derivatives of one stream — each an independent declarative
  * plan over the same scan, so Catalyst pushes `table = ...` into the
  * source and no per-record router runs at all. Unknown tables are
  * silently dropped, matching the reference's `default` case
  * (CustomJob.java:247-264).
  */
object Demux {

  /** Typed users substream (side output tag 1, CustomJob.java:36-37). */
  def users(events: Dataset[CdcEnvelope])(
      implicit spark: SparkSession): Dataset[UsersEvent] = {
    import spark.implicits._
    events.filter(_.table == "users").map { e =>
      val img = e.image
      UsersEvent(
        key = CdcEnvelope.keyOf(e.schema, img.getOrElse("id", "")),
        op = e.op, schema = e.schema, table = e.table,
        id = img.get("id").map(_.toLong).getOrElse(0L),
        fullName = img.getOrElse("full_name", null))
    }
  }

  /** Typed favorite-colors substream (tag 2, CustomJob.java:38-39). */
  def favoriteColors(events: Dataset[CdcEnvelope])(
      implicit spark: SparkSession): Dataset[UserFavoriteColorsEvent] = {
    import spark.implicits._
    events.filter(_.table == "user_favorite_colors").map { e =>
      val img = e.image
      UserFavoriteColorsEvent(
        key = CdcEnvelope.keyOf(e.schema, img.getOrElse("user_id", "")),
        op = e.op, schema = e.schema, table = e.table,
        userId = img.get("user_id").map(_.toLong).getOrElse(0L),
        favoriteColor = img.getOrElse("favorite_color", null))
    }
  }
}
