package graft.model

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types._

/** Driver-side `head()` for the stores' ONE-ROW metadata tables (stats,
  * meta, pointer, bucket sidecars) — the [[RowEst]] footer pattern
  * extended from row COUNTS to row VALUES.
  *
  * Every store mutation and every indexed read starts by resolving a
  * one-row parquet table that the protocol wrote with `repartition(1)`.
  * Reading it through `spark.read.parquet(dir).head()` costs a full
  * Spark action — parse/plan/codegen plus a scheduled job — per read,
  * ~60-150 ms of pure fixed overhead on a file that holds ONE row of
  * flat primitives; a serving-store query pays it 5-15 times. At any
  * scale this metadata is driver-sized by construction (a deployment
  * with a catalog would serve the same row from table properties), so
  * reading it with the parquet-hadoop reader on the driver is the
  * correct cost shape, not a local-mode trick.
  *
  * Supports exactly the shapes the stores write: flat OPTIONAL/REQUIRED
  * primitives (plain int64, int32, double, float, boolean, UTF-8
  * binary). Anything else — or any read error other than a missing row —
  * falls back to the Spark read, so correctness never depends on this
  * fast path. Mirrors `head()`: returns the first row encountered;
  * throws (via the Spark fallback) when the table is empty.
  */
object OneRowParquet {

  def head(spark: SparkSession, dir: String): Row =
    headOption(spark, dir).getOrElse(
      // empty or unsupported: fall through to Spark for the standard
      // behavior (and the standard error when the table is truly empty)
      spark.read.parquet(dir).head())

  /** First row of the one-row table at `dir`, or None when the
    * driver-side reader cannot serve it (unsupported shape, no part
    * files, reader error). Callers needing head()'s throw-on-empty use
    * [[head]].
    */
  def headOption(spark: SparkSession, dir: String): Option[Row] =
    try {
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new Path(dir)
      // the path's OWN filesystem, not the default one: on s3a://, abfs://
      // etc. FileSystem.get(conf) throws Wrong-FS and the fast path would
      // silently vanish exactly on the object-store deployments it targets
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) None // let the fallback raise the real error
      else {
        val parts = fs.listStatus(p)
          .filter(st => st.isFile && st.getLen > 0 &&
            !st.getPath.getName.startsWith("_") &&
            !st.getPath.getName.startsWith("."))
          .map(_.getPath)
          .sortBy(_.getName)
        parts.iterator.flatMap(readFirstRow(conf, _)).nextOption()
      }
    } catch {
      case _: Exception => None // fallback owns the error story
    }

  private def readFirstRow(conf: org.apache.hadoop.conf.Configuration,
      file: Path): Option[Row] = {
    import org.apache.parquet.example.data.Group
    import org.apache.parquet.hadoop.ParquetReader
    import org.apache.parquet.hadoop.example.GroupReadSupport
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val reader: ParquetReader[Group] = ParquetReader
      .builder(new GroupReadSupport(), file)
      .withConf(conf)
      .build()
    try {
      val g = reader.read()
      if (g == null) None
      else {
        val schema = g.getType
        val n = schema.getFieldCount
        val values = new Array[Any](n)
        val fields = new Array[StructField](n)
        var ok = true
        var i = 0
        while (ok && i < n) {
          val f = schema.getType(i)
          if (!f.isPrimitive) ok = false // nested: not a stats shape
          else {
            val prim = f.asPrimitiveType()
            val ptn = prim.getPrimitiveTypeName
            val ann = prim.getLogicalTypeAnnotation
            val isString = ptn == PrimitiveTypeName.BINARY &&
              ann.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]
            // annotated non-string primitives (dates, decimals, …) are
            // not the stores' stats shape — bail to the Spark reader
            val dt: Option[DataType] = ptn match {
              case PrimitiveTypeName.INT64 if ann == null => Some(LongType)
              case PrimitiveTypeName.INT32 if ann == null => Some(IntegerType)
              case PrimitiveTypeName.DOUBLE if ann == null => Some(DoubleType)
              case PrimitiveTypeName.FLOAT if ann == null => Some(FloatType)
              case PrimitiveTypeName.BOOLEAN if ann == null => Some(BooleanType)
              case PrimitiveTypeName.BINARY if isString => Some(StringType)
              case _ => None
            }
            dt match {
              case None => ok = false
              case Some(t) =>
                fields(i) = StructField(f.getName, t, nullable = true)
                values(i) =
                  if (g.getFieldRepetitionCount(i) == 0) null
                  else ptn match {
                    case PrimitiveTypeName.INT64 => g.getLong(i, 0)
                    case PrimitiveTypeName.INT32 => g.getInteger(i, 0)
                    case PrimitiveTypeName.DOUBLE => g.getDouble(i, 0)
                    case PrimitiveTypeName.FLOAT => g.getFloat(i, 0)
                    case PrimitiveTypeName.BOOLEAN => g.getBoolean(i, 0)
                    case PrimitiveTypeName.BINARY => g.getString(i, 0)
                    case _ => null // unreachable under dt match above
                  }
            }
          }
          i += 1
        }
        if (ok) Some(new GenericRowWithSchema(values, StructType(fields)))
        else None
      }
    } finally reader.close()
  }
}
