package graft.tools

import graft.SparkSpec
import graft.meta.FooterIO
import java.nio.file.Files

/** Command-level e2e coverage (reference layer 4,
  * cmd/gpq/command/command_test.go): the full convert → extract →
  * describe → validate chain through the CLI entry point.
  */
class GpqSpec extends SparkSpec {

  val gj = "src/test/resources/geojson"

  test("convert -> extract -> describe -> validate chain") {
    val dir = Files.createTempDirectory("gpqcli").toString
    assert(Gpq.run(spark, Array("convert", s"$gj/example.geojson",
      s"$dir/example.parquet")) == 0)
    assert(FooterIO.readGeoMetadata(s"$dir/example.parquet").isDefined)

    assert(Gpq.run(spark, Array("extract", s"$dir/example.parquet",
      s"$dir/tz.parquet", "--bbox=34,-7,36,-6")) == 0)
    val rows = spark.read.parquet(s"$dir/tz.parquet").collect()
    assert(rows.length == 1 && rows.head.getAs[String]("name") == "Tanzania")

    assert(Gpq.run(spark, Array("describe", s"$dir/tz.parquet")) == 0)
    assert(Gpq.run(spark, Array("validate", s"$dir/tz.parquet")) == 0)
  }

  test("describe --metadata-only prints the raw footer value") {
    val dir = Files.createTempDirectory("gpqmeta").toString
    Gpq.run(spark, Array("convert", s"$gj/example.geojson", s"$dir/e.parquet"))
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      assert(Gpq.run(spark, Array("describe", s"$dir/e.parquet", "--metadata-only")) == 0)
    }
    assert(out.toString.contains("\"primary_column\""))
  }

  test("stdin -> convert -> stdout pipes binary parquet (reference command.go:38-52)") {
    val gjBytes = Files.readAllBytes(java.nio.file.Paths.get(s"$gj/example.geojson"))
    val oldIn = System.in
    val captured = new java.io.ByteArrayOutputStream()
    try {
      System.setIn(new java.io.ByteArrayInputStream(gjBytes))
      Console.withOut(new java.io.PrintStream(captured)) {
        assert(Gpq.run(spark, Array("convert", "-", "-", "--from=geojson")) == 0)
      }
    } finally System.setIn(oldIn)
    val bytes = captured.toByteArray
    assert(bytes.length > 8 && new String(bytes.take(4), "US-ASCII") == "PAR1",
      s"expected parquet magic on stdout, got ${bytes.take(4).toSeq}")
    // the piped bytes are a complete GeoParquet file
    val tmp = Files.createTempDirectory("gpqpipe").resolve("out.parquet")
    Files.write(tmp, bytes)
    assert(FooterIO.readGeoMetadata(tmp.toString).isDefined)
    assert(spark.read.parquet(tmp.toString).count() > 0)
    // and stdin works for describe too (parquet assumed)
    val out2 = new java.io.ByteArrayOutputStream()
    try {
      System.setIn(new java.io.ByteArrayInputStream(bytes))
      Console.withOut(new java.io.PrintStream(out2)) {
        assert(Gpq.run(spark, Array("describe", "-", "--metadata-only")) == 0)
      }
    } finally System.setIn(oldIn)
    assert(out2.toString.contains("\"primary_column\""))
  }

  test("validate exits 1 on a non-GeoParquet file") {
    assert(Gpq.run(spark, Array("validate", s"$sf/lineitem.parquet")) == 1)
  }

  test("unknown command and bad flags error") {
    intercept[IllegalArgumentException](Gpq.run(spark, Array("frobnicate", "x")))
    intercept[IllegalArgumentException](
      Gpq.run(spark, Array("extract", "a.parquet", "b.parquet", "--bbox=1,2,3")))
  }

  test("extract with keep and drop flags") {
    val dir = Files.createTempDirectory("gpqcli2").toString
    Gpq.run(spark, Array("convert", s"$gj/example.geojson", s"$dir/e.parquet"))
    assert(Gpq.run(spark, Array("extract", s"$dir/e.parquet", s"$dir/keep.parquet",
      "--keep-only-cols=name,geometry")) == 0)
    assert(spark.read.parquet(s"$dir/keep.parquet").columns.toSet ==
      Set("name", "geometry"))
    // keep xor drop is enforced
    intercept[IllegalArgumentException] {
      Gpq.run(spark, Array("extract", s"$dir/e.parquet", s"$dir/x.parquet",
        "--keep-only-cols=name,geometry", "--drop-cols=iso_a3"))
    }
  }
}
