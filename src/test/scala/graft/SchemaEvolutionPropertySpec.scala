package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

import graft.table.SchemaEvolution

/** Generative invariants for the nested-evolution type merge
  * ([[SchemaEvolution]]): random nested struct/array/map types, fixed
  * seeds so runs are deterministic. These are the algebraic pins behind
  * SchemaEvolutionNestedSpec's end-to-end cases — the merge must stay
  * additive (never drop a table field), table-first (stable order),
  * idempotent, and deep-nullable.
  */
class SchemaEvolutionPropertySpec extends AnyFunSuite {

  private val leafGen: Gen[DataType] = Gen.oneOf(
    LongType, IntegerType, DoubleType, StringType, BooleanType, DateType)

  private def structGen(depth: Int): Gen[StructType] = for {
    n <- Gen.choose(1, 4)
    names <- Gen.pick(n, Seq("a", "b", "c", "d", "e", "f"))
    fields <- Gen.sequence[Seq[StructField], StructField](
      names.toSeq.map(nm => typeGen(depth - 1).map(dt => StructField(nm, dt))))
  } yield StructType(fields)

  private def typeGen(depth: Int): Gen[DataType] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      4 -> leafGen,
      2 -> structGen(depth),
      1 -> typeGen(depth - 1).map(ArrayType(_, containsNull = true)),
      1 -> typeGen(depth - 1).map(MapType(StringType, _, valueContainsNull = true)))

  private def cases(n: Int, seed: Long): Seq[StructType] =
    (0 until n).map(i =>
      structGen(3).pureApply(Gen.Parameters.default, Seed(seed + i)))

  /** Drop a random subset of (possibly nested) fields — an "old-shape
    * writer" view of the schema. Keeps at least one field per struct.
    */
  private def narrow(s: StructType, seed: Long): StructType = {
    val rnd = new scala.util.Random(seed)
    def go(st: StructType): StructType = {
      val kept = st.fields.filter(_ => rnd.nextBoolean() || st.fields.length == 1)
      val base = if (kept.isEmpty) st.fields.take(1) else kept
      StructType(base.map { f =>
        f.dataType match {
          case inner: StructType => f.copy(dataType = go(inner))
          case ArrayType(inner: StructType, cn) => f.copy(dataType = ArrayType(go(inner), cn))
          case MapType(k, inner: StructType, vn) => f.copy(dataType = MapType(k, go(inner), vn))
          case _ => f
        }
      })
    }
    go(s)
  }

  private def fieldPaths(dt: DataType, prefix: String = ""): Set[String] = dt match {
    case s: StructType => s.fields.toSet.flatMap((f: StructField) =>
      Set(prefix + f.name) ++ fieldPaths(f.dataType, prefix + f.name + "."))
    case ArrayType(e, _) => fieldPaths(e, prefix + "[].")
    case MapType(_, v, _) => fieldPaths(v, prefix + "{}.")
    case _ => Set.empty
  }

  test("merge(t, t) is identity up to deep nullability") {
    for (t <- cases(60, 1000L)) {
      val m = SchemaEvolution.mergeEvolvedType("x", t, t)
      assert(m === SchemaEvolution.asDeepNullable(t), s"for $t")
    }
  }

  test("merge with a narrowed incoming shape never drops a table field") {
    for ((t, i) <- cases(60, 2000L).zipWithIndex) {
      val in = narrow(t, 7000L + i)
      val m = SchemaEvolution.mergeEvolvedType("x", t, in)
      // every table path survives; no paths appear from nowhere
      assert(fieldPaths(t).subsetOf(fieldPaths(m)), s"table=$t in=$in merged=$m")
      assert(fieldPaths(m) === fieldPaths(t), s"table=$t in=$in merged=$m")
      // and table-first order is untouched at every struct level
      assert(m.asInstanceOf[StructType].fieldNames.toSeq ===
        t.fieldNames.toSeq)
    }
  }

  test("merge with a widened incoming shape appends extras after table fields") {
    for ((base, i) <- cases(60, 3000L).zipWithIndex) {
      val t = narrow(base, 8000L + i) // table is the NARROW side
      val m = SchemaEvolution.mergeEvolvedType("x", t, base)
        .asInstanceOf[StructType]
      // union of paths, table prefix preserved
      assert(fieldPaths(m) === (fieldPaths(t) ++ fieldPaths(base)))
      assert(m.fieldNames.toSeq.startsWith(t.fieldNames.toSeq))
      // idempotence: merging the merged shape back is stable
      assert(SchemaEvolution.mergeEvolvedType("x", m, m) ===
        SchemaEvolution.asDeepNullable(m))
      assert(SchemaEvolution.mergeEvolvedType("x", m, base) ===
        SchemaEvolution.asDeepNullable(m))
    }
  }

  test("evolveColumn yields exactly the merged type on a live frame") {
    import SparkTestBase._
    // one representative deep shape exercised end-to-end (per-case Spark
    // plans would be slow): struct in array in struct, narrowed input
    val table = StructType(Seq(
      StructField("a", LongType),
      StructField("b", StructType(Seq(
        StructField("x", StringType), StructField("y", DoubleType)))),
      StructField("c", ArrayType(StructType(Seq(
        StructField("p", LongType), StructField("q", StringType)))))))
    val in = StructType(Seq(
      StructField("b", StructType(Seq(StructField("x", StringType)))),
      StructField("c", ArrayType(StructType(Seq(StructField("q", StringType)))))))
    val merged = SchemaEvolution.mergeEvolvedType("m", table, in)
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(
        org.apache.spark.sql.Row(
          org.apache.spark.sql.Row("hi"),
          Seq(org.apache.spark.sql.Row("qq"))))),
      StructType(Seq(StructField("m", in))))
    val out = df.select(
      SchemaEvolution.evolveColumn(org.apache.spark.sql.functions.col("m"), in, merged).as("m"))
    assert(out.schema("m").dataType === merged)
    val r = out.collect().head.getStruct(0)
    assert(r.getAs[Any]("a") == null)
    assert(r.getStruct(r.fieldIndex("b")).getAs[String]("x") === "hi")
    assert(r.getStruct(r.fieldIndex("b")).getAs[Any]("y") == null)
    val elem = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("c")).head
    assert(elem.getAs[Any]("p") == null && elem.getAs[String]("q") === "qq")
  }
}
