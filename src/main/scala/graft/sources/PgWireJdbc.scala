package graft.sources

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, PreparedStatement}

import graft.cdc.Sinks

/** A [[graft.cdc.Sinks.ConnectionFactory]] that reaches a LIVE PostgreSQL
  * through the same v3 wire protocol [[PgWalTransport]] uses — no JDBC
  * driver jar involved. Serves exactly the `java.sql` slice the K2
  * upsert writer exercises (setAutoCommit/prepareStatement/setObject/
  * addBatch/executeBatch/executeUpdate/commit/rollback/close) via
  * dynamic proxies, the same technique [[graft.cdc.Sinks.MemoryDb]]
  * uses in-process. Parameters are inlined as properly-quoted text
  * literals over the simple-query protocol (statement texts here are
  * writer-generated and contain no string literals of their own, so
  * '?' positions are unambiguous); per-partition transactions map to
  * BEGIN/COMMIT/ROLLBACK. A cluster with the PostgreSQL JDBC driver on
  * its classpath uses [[graft.cdc.Sinks.JdbcConnectionFactory]]
  * instead — the writer cannot tell the difference, which is the point
  * of the seam. */
final case class PgWireConnectionFactory(host: String, port: Int,
    db: String, user: String) extends Sinks.ConnectionFactory {

  override def connect(): Connection = {
    val proto = new PgProto(host, port, db, user, replication = false)
    PgWireConnectionFactory.connection(proto)
  }
}

object PgWireConnectionFactory {

  private def literal(v: Any): String = v match {
    case null => "NULL"
    case None => "NULL"
    case Some(x) => literal(x)
    case s: String => "'" + s.replace("'", "''") + "'"
    case b: java.lang.Boolean => b.toString
    case n: java.lang.Number => n.toString
    case other => "'" + other.toString.replace("'", "''") + "'"
  }

  private def render(sql: String, params: Array[Any]): String = {
    val parts = sql.split('?')
    val sb = new StringBuilder(parts(0))
    var i = 1
    while (i < parts.length) {
      sb ++= literal(params(i - 1))
      sb ++= parts(i)
      i += 1
    }
    if (sql.endsWith("?")) sb ++= literal(params(parts.length - 1))
    sb.result()
  }

  private def statement(proto: PgProto, sql: String): PreparedStatement = {
    val nParams = sql.count(_ == '?')
    val params = new Array[Any](nParams)
    val batch = scala.collection.mutable.ArrayBuffer[Array[Any]]()
    val handler = new InvocationHandler {
      override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
        m.getName match {
          case "setObject" | "setString" | "setLong" | "setInt" =>
            params(args(0).asInstanceOf[Number].intValue() - 1) = args(1)
            null
          case "addBatch" =>
            batch += params.clone(); null
          case "executeBatch" =>
            val counts = batch.map(b => proto.execUpdate(render(sql, b)))
            batch.clear()
            counts.toArray
          case "executeUpdate" =>
            Int.box(proto.execUpdate(render(sql, params)))
          case "close" => null
          case "toString" => s"PgWireStatement($sql)"
          case _ => throw new UnsupportedOperationException(
            s"PgWireStatement.${m.getName} (unused by the upsert writer)")
        }
    }
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[PreparedStatement]), handler)
      .asInstanceOf[PreparedStatement]
  }

  private def connection(proto: PgProto): Connection = {
    val handler = new InvocationHandler {
      private var closed = false
      override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
        m.getName match {
          case "setAutoCommit" =>
            if (args(0) == java.lang.Boolean.FALSE) proto.execUpdate("BEGIN")
            null
          case "commit" => proto.execUpdate("COMMIT"); null
          case "rollback" => proto.execUpdate("ROLLBACK"); null
          case "prepareStatement" =>
            statement(proto, args(0).asInstanceOf[String])
          case "close" =>
            if (!closed) { closed = true; proto.close() }
            null
          case "isClosed" => Boolean.box(closed)
          case "toString" => "PgWireConnection"
          case _ => throw new UnsupportedOperationException(
            s"PgWireConnection.${m.getName} (unused by the upsert writer)")
        }
    }
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[Connection]), handler).asInstanceOf[Connection]
  }
}
