package graft

import org.scalatest.funsuite.AnyFunSuite

/** Randomized catalog-DML sequences vs an exact in-memory model — the
  * permanent pin for the r12 data-loss class (partition-scoped INSERT
  * OVERWRITE silently widening to the whole table). Every statement runs
  * as SQL over the DSv2 catalog name, so the whole analysis path
  * (GraftCatalog → GraftV2FallbackRule → v1 engine) is under test, and
  * after every statement the full snapshot must equal the model.
  */
class CatalogDmlFuzzSpec extends AnyFunSuite {
  import SparkTestBase._

  private val Years = Seq("1995", "1996", "1997")

  test("random INSERT/OVERWRITE/UPDATE/DELETE sequences match the model") {
    spark.conf.set("spark.sql.catalog.gfuzz",
      classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfuzz.warehouse",
      tmpDir("gfuzz_wh").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gfuzz.db")
    val rnd = new scala.util.Random(41013)

    // trial 1-2: default COW/SIMPLE; 3: BUCKET layout (stable group ids —
    // overwrite SHADOWS rewritten buckets); 4: MOR (delta-file writes).
    // The same statement sequences must hold on every layout.
    val layoutOpts = Map(
      3 -> ", 'graft.index.type' 'BUCKET', 'graft.index.bucket.num' '4'",
      4 -> ", tableType 'MERGE_ON_READ'")
    for (trial <- 1 to 4) {
      val t = s"gfuzz.db.t$trial"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"""CREATE TABLE $t (id BIGINT, ver BIGINT, price DOUBLE, yr STRING)
        USING graft PARTITIONED BY (yr)
        OPTIONS (recordKeyFields 'id', precombineField 'ver'
          ${layoutOpts.getOrElse(trial, "")})""")
      // model: id -> (ver, price, yr); upsert = replace by key
      val model = scala.collection.mutable.Map.empty[Long, (Long, Double, String)]
      var nextId = 0L
      var ver = 0L

      def freshRows(n: Int, yrs: Seq[String]): Seq[(Long, Long, Double, String)] = {
        ver += 1
        (0 until n).map { _ =>
          nextId += 1
          (nextId, ver, (nextId % 97).toDouble, yrs(rnd.nextInt(yrs.length)))
        }
      }
      def existingRows(n: Int): Seq[(Long, Long, Double, String)] = {
        ver += 1
        rnd.shuffle(model.keys.toSeq).take(n)
          .map(id => (id, ver, model(id)._2 + 1000.0, model(id)._3))
      }
      def values(rows: Seq[(Long, Long, Double, String)]): String =
        rows.map { case (i, v, p, y) => s"($i, $v, ${p}D, '$y')" }.mkString(", ")

      for (step <- 1 to 14) {
        rnd.nextInt(6) match {
          case 0 => // INSERT INTO: new ids + updates of existing (upsert)
            val rows = freshRows(1 + rnd.nextInt(4), Years) ++
              existingRows(rnd.nextInt(3))
            spark.sql(s"INSERT INTO $t VALUES ${values(rows)}")
            rows.foreach { case (i, v, p, y) => model(i) = (v, p, y) }
          case 1 => // static INSERT OVERWRITE PARTITION — the r12 bug shape
            val yr = Years(rnd.nextInt(Years.length))
            val rows = freshRows(rnd.nextInt(3), Seq(yr)) // possibly EMPTY
            val sel =
              if (rows.isEmpty) "SELECT id, ver, price FROM VALUES (1L, 1L, 1.0D) v(id, ver, price) WHERE 1 = 0"
              else rows.map { case (i, v, p, _) => s"SELECT ${i}L, ${v}L, ${p}D" }
                .mkString(" UNION ALL ")
            spark.sql(s"INSERT OVERWRITE $t PARTITION (yr = '$yr') $sel")
            model.filterInPlace { case (_, (_, _, y)) => y != yr }
            rows.foreach { case (i, v, p, y) => model(i) = (v, p, y) }
          case 2 => // dynamic INSERT OVERWRITE: replaces touched partitions
            val touched = rnd.shuffle(Years).take(1 + rnd.nextInt(2))
            val rows = freshRows(1 + rnd.nextInt(4), touched)
            val actual = rows.map(_._4).toSet
            val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "DYNAMIC")
            try spark.sql(s"INSERT OVERWRITE $t VALUES ${values(rows)}")
            finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
            model.filterInPlace { case (_, (_, _, y)) => !actual.contains(y) }
            rows.foreach { case (i, v, p, y) => model(i) = (v, p, y) }
          case 3 => // whole-table INSERT OVERWRITE (static, no clause)
            val rows = freshRows(1 + rnd.nextInt(3), Years)
            spark.sql(s"INSERT OVERWRITE $t VALUES ${values(rows)}")
            model.clear()
            rows.foreach { case (i, v, p, y) => model(i) = (v, p, y) }
          case 4 => // UPDATE by row predicate
            val m = 2 + rnd.nextInt(3)
            spark.sql(s"UPDATE $t SET price = price + 7 WHERE id % $m = 0")
            model.mapValuesInPlace { case (i, (v, p, y)) =>
              if (i % m == 0) (v, p + 7, y) else (v, p, y) }
          case 5 => // DELETE by row predicate
            val m = 2 + rnd.nextInt(4)
            spark.sql(s"DELETE FROM $t WHERE id % $m = 1")
            model.filterInPlace { case (i, _) => i % m != 1 }
        }
        val got = spark.sql(s"SELECT id, ver, price, yr FROM $t").collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getString(3))))
          .toMap
        assert(got === model.toMap, s"trial $trial step $step diverged " +
          s"(extra=${got.keySet -- model.keySet} missing=${model.keySet -- got.keySet})")
      }
    }
  }

  test("two-partition-column layouts: random DML sequences match the model") {
    spark.conf.set("spark.sql.catalog.gfuzz2",
      classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfuzz2.warehouse",
      tmpDir("gfuzz2_wh").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gfuzz2.db")
    val rnd = new scala.util.Random(52124)
    val Regions = Seq("eu", "us")

    val layoutOpts = Map(
      2 -> ", 'graft.index.type' 'BUCKET', 'graft.index.bucket.num' '4'",
      3 -> ", tableType 'MERGE_ON_READ'",
      4 -> ", 'graft.hive.style.partitioning' 'true'") // k=v per level
    for (trial <- 1 to 4) {
      val t = s"gfuzz2.db.t$trial"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"""CREATE TABLE $t (id BIGINT, ver BIGINT, price DOUBLE,
          yr STRING, region STRING)
        USING graft PARTITIONED BY (yr, region)
        OPTIONS (recordKeyFields 'id', precombineField 'ver'
          ${layoutOpts.getOrElse(trial, "")})""")
      val model = scala.collection.mutable.Map.empty[Long, (Long, Double, String, String)]
      var nextId = 0L
      var ver = 0L

      def freshRows(n: Int, yrs: Seq[String], regs: Seq[String]): Seq[(Long, Long, Double, String, String)] = {
        ver += 1
        (0 until n).map { _ =>
          nextId += 1
          (nextId, ver, (nextId % 97).toDouble,
            yrs(rnd.nextInt(yrs.length)), regs(rnd.nextInt(regs.length)))
        }
      }
      def values(rows: Seq[(Long, Long, Double, String, String)]): String =
        rows.map { case (i, v, p, y, g) => s"($i, $v, ${p}D, '$y', '$g')" }.mkString(", ")

      for (step <- 1 to 12) {
        rnd.nextInt(6) match {
          case 0 => // INSERT INTO
            val rows = freshRows(1 + rnd.nextInt(4), Years, Regions)
            spark.sql(s"INSERT INTO $t VALUES ${values(rows)}")
            rows.foreach { case (i, v, p, y, g) => model(i) = (v, p, y, g) }
          case 1 => // fully-pinned static overwrite: one LEAF partition
            val yr = Years(rnd.nextInt(Years.length))
            val rg = Regions(rnd.nextInt(Regions.length))
            val rows = freshRows(rnd.nextInt(3), Seq(yr), Seq(rg))
            val sel =
              if (rows.isEmpty) "SELECT id, ver, price FROM VALUES (1L, 1L, 1.0D) v(id, ver, price) WHERE 1 = 0"
              else rows.map { case (i, v, p, _, _) => s"SELECT ${i}L, ${v}L, ${p}D" }
                .mkString(" UNION ALL ")
            spark.sql(s"INSERT OVERWRITE $t PARTITION (yr = '$yr', region = '$rg') $sel")
            model.filterInPlace { case (_, (_, _, y, g)) => y != yr || g != rg }
            rows.foreach { case (i, v, p, y, g) => model(i) = (v, p, y, g) }
          case 2 => // partially-pinned static overwrite: all leaves of one yr
            val yr = Years(rnd.nextInt(Years.length))
            val rows = freshRows(1 + rnd.nextInt(3), Seq(yr), Regions)
            val sel = rows.map { case (i, v, p, _, g) =>
              s"SELECT ${i}L, ${v}L, ${p}D, '$g'" }.mkString(" UNION ALL ")
            spark.sql(s"INSERT OVERWRITE $t PARTITION (yr = '$yr', region) $sel")
            model.filterInPlace { case (_, (_, _, y, _)) => y != yr }
            rows.foreach { case (i, v, p, y, g) => model(i) = (v, p, y, g) }
          case 3 => // dynamic overwrite: touched leaf partitions only
            val rows = freshRows(1 + rnd.nextInt(4), Years, Regions)
            val touched = rows.map(r => (r._4, r._5)).toSet
            val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "DYNAMIC")
            try spark.sql(s"INSERT OVERWRITE $t VALUES ${values(rows)}")
            finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
            model.filterInPlace { case (_, (_, _, y, g)) => !touched.contains((y, g)) }
            rows.foreach { case (i, v, p, y, g) => model(i) = (v, p, y, g) }
          case 4 => // UPDATE by row predicate
            val m = 2 + rnd.nextInt(3)
            spark.sql(s"UPDATE $t SET price = price + 7 WHERE id % $m = 0")
            model.mapValuesInPlace { case (i, (v, p, y, g)) =>
              if (i % m == 0) (v, p + 7, y, g) else (v, p, y, g) }
          case 5 => // DELETE by row predicate
            val m = 2 + rnd.nextInt(4)
            spark.sql(s"DELETE FROM $t WHERE id % $m = 1")
            model.filterInPlace { case (i, _) => i % m != 1 }
        }
        val got = spark.sql(s"SELECT id, ver, price, yr, region FROM $t").collect()
          .map(r => r.getLong(0) ->
            ((r.getLong(1), r.getDouble(2), r.getString(3), r.getString(4))))
          .toMap
        assert(got === model.toMap, s"trial $trial step $step diverged " +
          s"(extra=${got.keySet -- model.keySet} missing=${model.keySet -- got.keySet})")
      }
    }
  }
}
