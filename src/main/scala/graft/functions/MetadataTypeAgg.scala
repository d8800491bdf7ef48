package graft.functions

import com.fasterxml.jackson.databind.ObjectMapper
import graft.core.MetadataType
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.jdk.CollectionConverters._

/** The schema-inference lattice (§1.3) as a typed `Aggregator`: input is a
  * raw JSON line, the buffer is the per-key type-vote map, merge is the
  * MetadataType lattice join. Runs as a real distributed aggregate with
  * map-side partial merge — the Spark-idiomatic form of the reference's
  * sequential fold (src/main.rs:166-176), usable via `ds.select(agg)` on a
  * billion-line sidecar.
  *
  * The buffer is kryo-encoded (the ADT needs no SQL schema); the OUTPUT is a
  * sorted `Seq[(key, typeName)]` so results are deterministic and
  * oracle-comparable.
  */
object MetadataTypeAgg extends Aggregator[String, Map[String, MetadataType], Seq[(String, String)]] {
  @transient private lazy val mapper = new ObjectMapper()

  override def zero: Map[String, MetadataType] = Map.empty

  override def reduce(acc: Map[String, MetadataType], line: String): Map[String, MetadataType] = {
    val t = if (line == null) "" else line.trim
    if (t.isEmpty) acc
    else {
      val node = try mapper.readTree(t) catch { case _: Throwable => null }
      if (node == null || !node.isObject) acc
      else node.properties().asScala.foldLeft(acc) { (m, e) =>
        MetadataType.inferJson(e.getValue) match {
          case Some(v) => m.updated(e.getKey, m.get(e.getKey).fold(v)(_.merge(v)))
          case None    => m
        }
      }
    }
  }

  override def merge(a: Map[String, MetadataType], b: Map[String, MetadataType]): Map[String, MetadataType] =
    (a.keySet ++ b.keySet).iterator.map { k =>
      k -> ((a.get(k), b.get(k)) match {
        case (Some(x), Some(y)) => x.merge(y)
        case (x, y)             => x.orElse(y).get
      })
    }.toMap

  override def finish(acc: Map[String, MetadataType]): Seq[(String, String)] =
    acc.toSeq.map { case (k, t) => (k, t.name) }.sortBy(_._1)

  override def bufferEncoder: Encoder[Map[String, MetadataType]] =
    Encoders.kryo[Map[String, MetadataType]]
  override def outputEncoder: Encoder[Seq[(String, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, String)]]()
}
