package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Production [[KafkaClusterClient]] binding over a real broker:
  * metadata/offset calls go through `kafka-clients`' KafkaConsumer —
  * loaded REFLECTIVELY, so this class compiles and loads without the
  * Kafka jars on the classpath (they ship with `spark-sql-kafka`) — and
  * the ranged data read goes through Spark's built-in batch `kafka`
  * source with explicit per-partition starting/ending offsets, which
  * plans one task per offset range (the executor-parallel read shape the
  * reference gets from KafkaRDD; reference
  * hudi-utilities/.../sources/helpers/KafkaOffsetGen.java:57-147).
  *
  * Use [[SparkKafkaClusterClient.available]] to pick this binding when the
  * jars are present and fall back to a test/stub client otherwise.
  */
final class SparkKafkaClusterClient(
    bootstrapServers: String,
    consumerProps: Map[String, String] = Map.empty) extends KafkaClusterClient {

  import SparkKafkaClusterClient._

  // ---- reflective kafka-clients surface (driver-side metadata only) ----

  private def newConsumer(extra: Map[String, String]): AutoCloseable = {
    val props = new java.util.Properties()
    props.put("bootstrap.servers", bootstrapServers)
    props.put("key.deserializer", ByteArrayDeserializer)
    props.put("value.deserializer", ByteArrayDeserializer)
    props.put("enable.auto.commit", "false")
    consumerProps.foreach { case (k, v) => props.put(k, v) }
    extra.foreach { case (k, v) => props.put(k, v) }
    consumerClass.getConstructor(classOf[java.util.Properties])
      .newInstance(props).asInstanceOf[AutoCloseable]
  }

  private def topicPartition(topic: String, p: Int): AnyRef =
    tpClass.getConstructor(classOf[String], classOf[Int])
      .newInstance(topic, Int.box(p)).asInstanceOf[AnyRef]

  private def withConsumer[T](extra: Map[String, String] = Map.empty)(
      body: AnyRef => T): T = {
    val c = newConsumer(extra)
    try body(c.asInstanceOf[AnyRef]) finally c.close()
  }

  private def call(target: AnyRef, method: String, args: (Class[_], AnyRef)*): AnyRef =
    target.getClass.getMethod(method, args.map(_._1): _*)
      .invoke(target, args.map(_._2): _*)

  override def topicExists(topic: String): Boolean =
    try partitionsFor(topic).nonEmpty
    catch { case _: Exception => false }

  override def partitionsFor(topic: String): Seq[Int] = withConsumer() { c =>
    import scala.jdk.CollectionConverters._
    val infos = call(c, "partitionsFor", classOf[String] -> topic)
      .asInstanceOf[java.util.List[AnyRef]]
    if (infos == null) Seq.empty
    else infos.asScala.toSeq
      .map(pi => call(pi, "partition").asInstanceOf[Int]).sorted
  }

  private def offsetsVia(topic: String, method: String): Map[Int, Long] =
    withConsumer() { c =>
      import scala.jdk.CollectionConverters._
      val tps = partitionsFor(topic).map(topicPartition(topic, _)).asJava
      call(c, method, classOf[java.util.Collection[_]] -> tps)
        .asInstanceOf[java.util.Map[AnyRef, java.lang.Long]].asScala
        .map { case (tp, o) => call(tp, "partition").asInstanceOf[Int] -> o.toLong }
        .toMap
    }

  override def beginningOffsets(topic: String): Map[Int, Long] =
    offsetsVia(topic, "beginningOffsets")

  override def endOffsets(topic: String): Map[Int, Long] =
    offsetsVia(topic, "endOffsets")

  override def groupOffsets(topic: String, groupId: String): Map[Int, Long] =
    withConsumer(Map("group.id" -> groupId)) { c =>
      import scala.jdk.CollectionConverters._
      val tps = partitionsFor(topic).map(topicPartition(topic, _)).toSet.asJava
      call(c, "committed", classOf[java.util.Set[_]] -> tps)
        .asInstanceOf[java.util.Map[AnyRef, AnyRef]].asScala
        .collect { case (tp, oam) if oam != null =>
          call(tp, "partition").asInstanceOf[Int] ->
            call(oam, "offset").asInstanceOf[Long]
        }.toMap
    }

  override def commitGroupOffsets(topic: String, groupId: String,
      offsets: Map[Int, Long]): Unit =
    withConsumer(Map("group.id" -> groupId)) { c =>
      val m = new java.util.HashMap[AnyRef, AnyRef]()
      offsets.foreach { case (p, o) =>
        m.put(topicPartition(topic, p),
          oamClass.getConstructor(classOf[Long]).newInstance(Long.box(o))
            .asInstanceOf[AnyRef])
      }
      call(c, "commitSync", classOf[java.util.Map[_, _]] -> m)
      ()
    }

  // ---- distributed data read (Spark's batch kafka source) ----

  /** One task per offset range; columns match the [[KafkaClusterClient]]
    * contract. Empty ranges return an empty, correctly-typed frame without
    * touching the broker.
    */
  override def read(spark: SparkSession, topic: String,
      ranges: Seq[KafkaOffsetRange]): DataFrame = {
    val live = ranges.filter(_.count > 0)
    if (live.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ReadSchema)
    def offsetsJson(f: KafkaOffsetRange => Long): String =
      live.sortBy(_.partition)
        .map(r => s""""${r.partition}":${f(r)}""")
        .mkString(s"""{"$topic":{""", ",", "}}")
    spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("assign", s"""{"$topic":[${live.map(_.partition).sorted.mkString(",")}]}""")
      .option("startingOffsets", offsetsJson(_.fromOffset))
      .option("endingOffsets", offsetsJson(_.untilOffset))
      .option("failOnDataLoss", "false")
      .load()
      .select(col("partition").cast(IntegerType).as("partition"),
        col("offset").cast(LongType).as("offset"),
        col("key").cast(StringType).as("key"),
        col("value").cast(StringType).as("value"))
  }
}

object SparkKafkaClusterClient {
  private val ByteArrayDeserializer =
    "org.apache.kafka.common.serialization.ByteArrayDeserializer"

  private lazy val consumerClass =
    Class.forName("org.apache.kafka.clients.consumer.KafkaConsumer")
  private lazy val tpClass =
    Class.forName("org.apache.kafka.common.TopicPartition")
  private lazy val oamClass =
    Class.forName("org.apache.kafka.clients.consumer.OffsetAndMetadata")

  val ReadSchema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("key", StringType, nullable = true),
    StructField("value", StringType, nullable = true)))

  /** True when the kafka-clients jars are loadable — callers pick this
    * binding over a stub only then.
    */
  def available: Boolean =
    try { consumerClass; tpClass; oamClass; true }
    catch { case _: Throwable => false }
}
