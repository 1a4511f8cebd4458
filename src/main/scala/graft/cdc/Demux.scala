package graft.cdc

import org.apache.spark.sql.{Dataset, SparkSession}

/** Table demux + typed mapping — the Spark-native form of the reference's
  * `KeyedProcessFunction` side outputs (CustomJob.java:204-218) and custom
  * deserializer (CustomJob.java:221-272).
  *
  * Spark has no side outputs; the idiomatic mapping (SURVEY §2 T3) is N
  * filtered derivatives of one stream — each an independent declarative
  * plan over the same scan. The table filter is a COLUMN predicate, not a
  * typed closure, so Catalyst sees it (pushes `table = ...` toward the
  * source and prunes before objects are deserialized); only matching rows
  * pay the typed map. Unknown tables are silently dropped, matching the
  * reference's `default` case (CustomJob.java:247-264). Non-numeric id
  * strings map to id 0 instead of killing the stream (the key keeps the
  * raw string, so no information is lost).
  */
object Demux {

  private val col = org.apache.spark.sql.functions.col _

  /** Typed users substream (side output tag 1, CustomJob.java:36-37). */
  def users(events: Dataset[CdcEnvelope])(
      implicit spark: SparkSession): Dataset[UsersEvent] = {
    import spark.implicits._
    events.filter(col("table") === "users").map { e =>
      val img = e.image
      UsersEvent(
        key = CdcEnvelope.keyOf(e.schema, img.getOrElse("id", "")),
        op = e.op, schema = e.schema, table = e.table,
        id = img.get("id").flatMap(_.toLongOption).getOrElse(0L),
        fullName = img.getOrElse("full_name", null))
    }
  }

  /** Typed favorite-colors substream (tag 2, CustomJob.java:38-39). */
  def favoriteColors(events: Dataset[CdcEnvelope])(
      implicit spark: SparkSession): Dataset[UserFavoriteColorsEvent] = {
    import spark.implicits._
    events.filter(col("table") === "user_favorite_colors").map { e =>
      val img = e.image
      UserFavoriteColorsEvent(
        key = CdcEnvelope.keyOf(e.schema, img.getOrElse("user_id", "")),
        op = e.op, schema = e.schema, table = e.table,
        userId = img.get("user_id").flatMap(_.toLongOption).getOrElse(0L),
        favoriteColor = img.getOrElse("favorite_color", null))
    }
  }
}
