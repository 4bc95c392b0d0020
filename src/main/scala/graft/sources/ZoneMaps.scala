package graft.sources

import java.util.Base64
import java.util.concurrent.{Callable, Executors, TimeUnit}

import scala.collection.JavaConverters._
import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.streaming.FsOps

/** File-level zone maps (per-file column min/max/null-count), the data-
  * skipping layer the reference gets from Athena's partition pruning alone
  * (README.md:451-456 prunes on `day=`/`hour=` directories only). At 100 TB
  * a predicate on a NON-partition column still opens every file just to let
  * parquet row-group stats reject it — zone maps answer "can this file
  * match?" from a manifest-sized sidecar, so pruned files are never listed,
  * opened, or scheduled.
  *
  * Stats are harvested from parquet FOOTERS (exact, no data re-scan — the
  * bytes were just written and the footer already aggregates per-row-group
  * min/max), persisted under `<manifestDir>/_zonemaps/zm-<batchId>.json`
  * by the deliver sink, and folded into periodic snapshots like the
  * manifest chain. Zone maps are ADVISORY: a file with no stats is always
  * kept, the driving predicate is always re-applied after the scan, and a
  * stale entry for a retired file is harmless (readers intersect with the
  * manifest's live file list) — so unlike manifest snapshots, zone-map
  * folds need no anti-shadowing stabilization loop.
  */
object ZoneMaps {

  /** One column's zone in one file. `t` is the comparison domain:
    * "long" (integers), "days" (date), "micros" (timestamp), "double",
    * "bytes" (UTF-8 strings, byte-wise unsigned order — parquet's own
    * binary ordering), "bool". `lo`/`hi` are None when the file has no
    * non-null value (then `nulls == Some(rows)` prunes everything but
    * IS NULL). `nulls` is None when the writer didn't record null counts.
    */
  final case class ColZone(t: String, lo: Option[Any], hi: Option[Any],
      nulls: Option[Long], rows: Long)

  type FileZones = Map[String, Map[String, ColZone]] // url -> col -> zone

  // ---------------------------------------------------------------- harvest

  /** Exact per-file stats from parquet footers, restricted to `cols`
    * (Nil = every supported leaf column). Footer reads are metadata-only
    * (a few KB each) and run on a bounded driver-side pool — same cost
    * class as the file listing that preceded them.
    */
  def fromFooters(conf: Configuration, files: Seq[String],
      cols: Seq[String] = Nil): FileZones = {
    if (files.isEmpty) return Map.empty
    val pool = Executors.newFixedThreadPool(math.min(files.size, 16))
    try {
      val futs = files.map { f =>
        pool.submit(new Callable[(String, Map[String, ColZone])] {
          def call() = (f, fileStats(conf, f, cols))
        })
      }
      futs.map(_.get()).toMap
    } finally {
      pool.shutdownNow()
      pool.awaitTermination(10, TimeUnit.SECONDS)
    }
  }

  /** Footer stats for one file. Columns whose physical/logical type has no
    * portable comparison domain (INT96, fixed-len, decimals, nested groups
    * below top level keep their dotted path) or whose stats any row group
    * omitted are simply absent — absent means "never prune on this column
    * in this file", never an error.
    */
  private[sources] def fileStats(conf: Configuration, file: String,
      cols: Seq[String]): Map[String, ColZone] = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new HPath(file), conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val acc = mutable.Map.empty[String, ColZone]
      val dropped = mutable.Set.empty[String]
      for (b <- blocks; c <- b.getColumns.asScala) {
        val name = c.getPath.toDotString
        if ((cols.isEmpty || cols.contains(name)) && !dropped(name)) {
          chunkZone(c) match {
            case None => dropped += name; acc.remove(name)
            case Some(z) =>
              acc(name) = acc.get(name).map(merge(_, z)).getOrElse(z)
          }
        }
      }
      acc.map { case (k, z) => k -> z.copy(rows = rows) }.toMap
    } finally reader.close()
  }

  /** Zone for one column chunk, or None when this chunk's stats are
    * unusable (whole column then drops — a file-level min/max missing one
    * row group's contribution would prune rows that exist).
    */
  private def chunkZone(
      c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData): Option[ColZone] =
    try chunkZoneUnsafe(c)
    catch { case _: ArithmeticException => None } // millis→micros overflow

  private def chunkZoneUnsafe(
      c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData): Option[ColZone] = {
    val st = c.getStatistics
    if (st == null) return None
    val nulls = if (st.isNumNullsSet) Some(st.getNumNulls) else None
    if (!st.hasNonNullValue) {
      // all-null chunk IF the null count confirms it; otherwise the writer
      // just omitted min/max (e.g. over-long binary) and we know nothing
      return nulls match {
        case Some(_) if st.getNumNulls == c.getValueCount =>
          Some(ColZone(tOf(c).getOrElse(return None), None, None, nulls, 0L))
        case _ => None
      }
    }
    val t = tOf(c).getOrElse(return None)
    val (lo, hi) = (st.genericGetMin, st.genericGetMax) match {
      case (mn: java.lang.Integer, mx: java.lang.Integer) =>
        (mn.toLong: Any, mx.toLong: Any)
      case (mn: java.lang.Long, mx: java.lang.Long) =>
        (normTs(c, mn): Any, normTs(c, mx): Any)
      case (mn: java.lang.Float, mx: java.lang.Float) =>
        (mn.toDouble: Any, mx.toDouble: Any)
      case (mn: java.lang.Double, mx: java.lang.Double) =>
        (mn.toDouble: Any, mx.toDouble: Any)
      case (mn: java.lang.Boolean, mx: java.lang.Boolean) =>
        (mn.booleanValue: Any, mx.booleanValue: Any)
      case (mn: org.apache.parquet.io.api.Binary, mx: org.apache.parquet.io.api.Binary) =>
        (mn.getBytes: Any, mx.getBytes: Any)
      case _ => return None
    }
    // NaN poisons float/double ordering (parquet writers disagree on
    // whether NaN participates in min/max) — drop the column's stats
    (lo, hi) match {
      case (d: Double, _) if d.isNaN => return None
      case (_, d: Double) if d.isNaN => return None
      case _ =>
    }
    Some(ColZone(t, Some(lo), Some(hi), nulls, 0L))
  }

  /** Comparison domain of a column chunk, None = unsupported. */
  private def tOf(
      c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData): Option[String] = {
    val pt = c.getPrimitiveType
    (pt.getPrimitiveTypeName, pt.getLogicalTypeAnnotation) match {
      case (_, _: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) => None
      case (INT32, _: LogicalTypeAnnotation.DateLogicalTypeAnnotation) => Some("days")
      case (INT32, _) => Some("long")
      case (INT64, ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation) =>
        ts.getUnit match {
          case LogicalTypeAnnotation.TimeUnit.MICROS |
               LogicalTypeAnnotation.TimeUnit.MILLIS => Some("micros")
          case _ => None // nanos don't fit micros losslessly
        }
      case (INT64, _) => Some("long")
      case (FLOAT | DOUBLE, _) => Some("double")
      case (BOOLEAN, _) => Some("bool")
      case (BINARY, _: LogicalTypeAnnotation.StringLogicalTypeAnnotation) => Some("bytes")
      case _ => None
    }
  }

  /** Millisecond-unit timestamps normalize to micros so one domain serves
    * both writer precisions.
    */
  /** Throws ArithmeticException on a millis value that overflows micros —
    * [[chunkZone]] catches it and drops the column's stats (a bound we
    * can't represent must never become a wrong bound).
    */
  private def normTs(
      c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData, v: Long): Long =
    c.getPrimitiveType.getLogicalTypeAnnotation match {
      case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
          if ts.getUnit == LogicalTypeAnnotation.TimeUnit.MILLIS =>
        Math.multiplyExact(v, 1000L)
      case _ => v
    }

  private def merge(a: ColZone, b: ColZone): ColZone = {
    def m(x: Option[Any], y: Option[Any], max: Boolean): Option[Any] = (x, y) match {
      case (Some(p), Some(q)) =>
        val c = cmp(p, q)
        Some(if ((c > 0) == max) p else q)
      case (p, q) => p.orElse(q)
    }
    ColZone(a.t, m(a.lo, b.lo, max = false), m(a.hi, b.hi, max = true),
      for (x <- a.nulls; y <- b.nulls) yield x + y, 0L)
  }

  /** Domain comparison: longs/doubles natively, byte arrays unsigned
    * lexicographic (parquet's UTF-8 binary order — Java String order
    * diverges on supplementary characters, so never compare as String).
    */
  private[graft] def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case (x: Array[Byte], y: Array[Byte]) =>
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      java.lang.Integer.compare(x.length, y.length)
    case _ => throw new IllegalArgumentException(
      s"zone domain mismatch: ${a.getClass} vs ${b.getClass}")
  }

  // ------------------------------------------------------------ persistence

  /** Write `zm-<batchId>.json` (or a `.snap.json` fold every `compactEvery`
    * batches, mirroring the manifest chain's snapshot cadence so the
    * sidecar chain a reader resolves stays O(since-snapshot), not
    * O(history)). Idempotent per batchId: a crashed attempt's file is
    * overwritten whole via temp+rename.
    */
  def write(conf: Configuration, manifestDir: String, batchId: Long,
      zones: FileZones, compactEvery: Int): Unit = {
    val dir = new HPath(manifestDir, SidecarDir)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val snapshot = compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0
    val all =
      if (!snapshot) zones
      // fold = plain map union (stale keys are harmless — see class doc),
      // newest batch wins on a re-delivered url
      else chainZones(fs, dir, upToExclusive = batchId) ++ zones
    val name = f"zm-$batchId%010d" + (if (snapshot) ".snap.json" else ".json")
    FsOps.atomicWrite(conf, fs, new HPath(dir, name), render(all).getBytes("UTF-8"))
  }

  /** All zones visible through the sidecar chain (latest snapshot ∪ later
    * incrementals). Missing sidecar dir = no zone maps = no pruning.
    */
  def load(conf: Configuration, manifestDir: String): FileZones = {
    val dir = new HPath(manifestDir, SidecarDir)
    val fs = dir.getFileSystem(conf)
    chainZones(fs, dir, Long.MaxValue)
  }

  private val SidecarDir = "_zonemaps"

  private def chainZones(fs: FileSystem, dir: HPath,
      upToExclusive: Long): FileZones = {
    if (!fs.exists(dir)) return Map.empty
    val all = fs.listStatus(dir).toSeq.map(_.getPath).flatMap { p =>
      p.getName match {
        case n if n.startsWith("zm-") && n.endsWith(".snap.json") =>
          Some((n.stripPrefix("zm-").stripSuffix(".snap.json").toLong, true, p))
        case n if n.startsWith("zm-") && n.endsWith(".json") =>
          Some((n.stripPrefix("zm-").stripSuffix(".json").toLong, false, p))
        case _ => None
      }
    }.filter(_._1 < upToExclusive)
    val snapId = all.collect { case (id, true, _) => id }.maxOption
    val chain = all.filter { case (id, isSnap, _) =>
      snapId.forall(s => id > s || (id == s && isSnap))
    }.sortBy(_._1).map(_._3)
    chain.foldLeft(Map.empty: FileZones) { (acc, p) =>
      acc ++ parse(FsOps.readString(fs, p))
    }
  }

  /** Flat JSON — one object per (file, column) with all-string values, so
    * loading needs no JSON library and no Spark job (the manifest parser's
    * regex style). String bounds are base64 (exact bytes, escape-proof).
    */
  private[graft] def render(zones: FileZones): String = {
    val b64 = Base64.getEncoder
    def v(t: String, x: Any): String = x match {
      case l: Long => l.toString
      case d: Double => java.lang.Double.toString(d) // parses back exactly
      case bl: Boolean => bl.toString
      case bs: Array[Byte] => b64.encodeToString(bs)
    }
    val objs = zones.toSeq.sortBy(_._1).flatMap { case (url, cols) =>
      cols.toSeq.sortBy(_._1).map { case (col, z) =>
        val parts = Seq(
          s""""url":"$url"""", s""""col":"$col"""", s""""t":"${z.t}"""",
          s""""rows":"${z.rows}"""") ++
          z.lo.map(x => s""""lo":"${v(z.t, x)}"""") ++
          z.hi.map(x => s""""hi":"${v(z.t, x)}"""") ++
          z.nulls.map(n => s""""nulls":"$n"""")
        parts.mkString("{", ",", "}")
      }
    }
    objs.mkString("{\"zones\":[\n", ",\n", "\n]}")
  }

  private val Field = """"(\w+)":"([^"]*)"""".r

  private[graft] def parse(json: String): FileZones = {
    val b64 = Base64.getDecoder
    val acc = mutable.Map.empty[String, mutable.Map[String, ColZone]]
    // objects are single-level with no embedded quotes/braces by
    // construction (urls are paths, values are numbers/base64)
    for (obj <- """\{[^{}]*\}""".r.findAllIn(json)) {
      val f = Field.findAllMatchIn(obj).map(m => m.group(1) -> m.group(2)).toMap
      for (url <- f.get("url"); col <- f.get("col"); t <- f.get("t")) {
        def v(s: String): Any = t match {
          case "long" | "days" | "micros" => s.toLong
          case "double" => java.lang.Double.parseDouble(s)
          case "bool" => s.toBoolean
          case "bytes" => b64.decode(s)
        }
        acc.getOrElseUpdate(url, mutable.Map.empty)(col) = ColZone(
          t, f.get("lo").map(v), f.get("hi").map(v),
          f.get("nulls").map(_.toLong), f.get("rows").fold(0L)(_.toLong))
      }
    }
    acc.map { case (k, m) => k -> m.toMap }.toMap
  }

  // ---------------------------------------------------------------- pruning

  /** Resolve `filter` against the lake's real schema and return the
    * OPTIMIZED filter condition — literals cast-folded into the column's
    * type, implicit coercions applied, IsNotNull conjuncts inferred —
    * i.e. the exact semantics Spark will execute, which is the only thing
    * pruning may reason from. One probe file's footer supplies the schema;
    * planning is driver-only. None = no Filter survived optimization
    * (e.g. a partition-only predicate) → no zone pruning.
    */
  private[sources] def resolvedPredicate(spark: SparkSession, basePath: String,
      probeFile: String, filter: Column): Option[Expression] = {
    val probe = spark.read.option("basePath", basePath).parquet(probeFile)
    probe.where(filter).queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }.reduceOption(And)
  }

  /** True when `zones` PROVE no row of the file satisfies `pred` (a
    * RESOLVED, optimized condition from [[resolvedPredicate]]). False on
    * anything unknown — unsupported conjunct shape, missing column stats,
    * domain mismatch.
    */
  def provesEmpty(pred: Expression, zones: Map[String, ColZone]): Boolean = pred match {
    case And(l, r) => provesEmpty(l, zones) || provesEmpty(r, zones)
    case Or(l, r) => provesEmpty(l, zones) && provesEmpty(r, zones)
    case EqualTo(Attr(a), Lit(v, t)) => outside(zones.get(a), t, v, v)
    case EqualTo(Lit(v, t), Attr(a)) => outside(zones.get(a), t, v, v)
    case EqualNullSafe(Attr(a), Lit(v, t)) => outside(zones.get(a), t, v, v)
    case EqualNullSafe(Lit(v, t), Attr(a)) => outside(zones.get(a), t, v, v)
    case LessThan(Attr(a), Lit(v, t)) => noneBelow(zones.get(a), t, v, strict = true)
    case LessThan(Lit(v, t), Attr(a)) => noneAbove(zones.get(a), t, v, strict = true)
    case LessThanOrEqual(Attr(a), Lit(v, t)) => noneBelow(zones.get(a), t, v, strict = false)
    case LessThanOrEqual(Lit(v, t), Attr(a)) => noneAbove(zones.get(a), t, v, strict = false)
    case GreaterThan(Attr(a), Lit(v, t)) => noneAbove(zones.get(a), t, v, strict = true)
    case GreaterThan(Lit(v, t), Attr(a)) => noneBelow(zones.get(a), t, v, strict = true)
    case GreaterThanOrEqual(Attr(a), Lit(v, t)) => noneAbove(zones.get(a), t, v, strict = false)
    case GreaterThanOrEqual(Lit(v, t), Attr(a)) => noneBelow(zones.get(a), t, v, strict = false)
    case In(Attr(a), vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      vs.forall { case Lit(v, t) => outside(zones.get(a), t, v, v); case _ => false }
    case InSet(a: AttributeReference, vs) if vs.nonEmpty =>
      // the optimizer's large-IN form: values are internal representations
      // typed by the attribute
      vs.forall(v => internal(v, a.dataType)
        .exists { case (d, t) => outside(zones.get(a.name), t, d, d) })
    case IsNull(Attr(a)) =>
      zones.get(a).exists(z => z.nulls.contains(0L) && z.rows > 0)
    case IsNotNull(Attr(a)) =>
      zones.get(a).exists(z => z.lo.isEmpty && z.nulls.exists(_ == z.rows) && z.rows > 0)
    case StartsWith(Attr(a), Lit(p: Array[Byte], "bytes")) =>
      zones.get(a).exists { z =>
        z.lo.isDefined && {
          // file range entirely below the prefix, or at/above its successor
          cmp(z.hi.get, p) < 0 && !startsWith(z.hi.get.asInstanceOf[Array[Byte]], p) ||
          prefixSuccessor(p).exists(s => cmp(z.lo.get, s) >= 0)
        }
      }
    case _ => false
  }

  private def startsWith(v: Array[Byte], p: Array[Byte]): Boolean =
    v.length >= p.length && {
      var i = 0
      while (i < p.length) { if (v(i) != p(i)) return false; i += 1 }
      true
    }

  /** Smallest byte string greater than every string with prefix `p`
    * (increment last non-0xff byte); None when p is all 0xff.
    */
  private def prefixSuccessor(p: Array[Byte]): Option[Array[Byte]] = {
    val s = p.clone()
    var i = s.length - 1
    while (i >= 0) {
      if ((s(i) & 0xff) != 0xff) {
        s(i) = (s(i) + 1).toByte
        return Some(s.take(i + 1))
      }
      i -= 1
    }
    None
  }

  /** No value in [z.lo, z.hi] can equal a value in [vLo, vHi]. */
  private def outside(z: Option[ColZone], t: String, lo: Any, hi: Any): Boolean =
    z.exists { zz =>
      zz.t == t && (zz.lo match {
        case None => zz.nulls.exists(_ == zz.rows) && zz.rows > 0 // all-null file
        case Some(zlo) => cmp(hi, zlo) < 0 || cmp(lo, zz.hi.get) > 0
      })
    }

  /** No file value strictly-below / at-or-below `v`. */
  private def noneBelow(z: Option[ColZone], t: String, v: Any, strict: Boolean): Boolean =
    z.exists { zz =>
      zz.t == t && (zz.lo match {
        case None => zz.nulls.exists(_ == zz.rows) && zz.rows > 0
        case Some(zlo) => if (strict) cmp(zlo, v) >= 0 else cmp(zlo, v) > 0
      })
    }

  /** No file value strictly-above / at-or-above `v`. */
  private def noneAbove(z: Option[ColZone], t: String, v: Any, strict: Boolean): Boolean =
    z.exists { zz =>
      zz.t == t && (zz.hi match {
        case None => zz.nulls.exists(_ == zz.rows) && zz.rows > 0
        case Some(zhi) => if (strict) cmp(zhi, v) <= 0 else cmp(zhi, v) < 0
      })
    }

  /** Attribute name from either an unresolved user-built Column or a
    * resolved plan attribute (both shapes reach the pruner).
    */
  private object Attr {
    def unapply(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case u: UnresolvedAttribute => Some(u.nameParts.mkString("."))
      case _ => None
    }
  }

  /** An internal (post-analysis) value normalized into its zone comparison
    * domain. TIMESTAMP and TIMESTAMP_NTZ both land in "micros" — graft
    * sessions run UTC, where the two share an epoch scale.
    */
  private def internal(v: Any, dt: DataType): Option[(Any, String)] = v match {
    case null => None
    case b: Byte => Some((b.toLong, "long"))
    case s: Short => Some((s.toLong, "long"))
    case i: Int => Some((i.toLong, if (dt == DateType) "days" else "long"))
    case l: Long =>
      Some((l, if (dt == TimestampType || dt == TimestampNTZType) "micros" else "long"))
    case f: Float if !f.isNaN => Some((f.toDouble, "double"))
    case d: Double if !d.isNaN => Some((d, "double"))
    case b: Boolean => Some((b, "bool"))
    case u: UTF8String => Some((u.getBytes, "bytes"))
    case _ => None
  }

  /** Literal normalized into its zone comparison domain. */
  private object Lit {
    def unapply(e: Expression): Option[(Any, String)] = e match {
      case l: Literal => internal(l.value, l.dataType)
      case _ => None
    }
  }

  // ------------------------------------------------------------ direct scan

  // ----------------------------------------------------------- bloom prune

  /** Equality constraints a bloom filter can test: (column, candidate
    * values in the zone domain). Extracted from top-level conjuncts only —
    * an OR alternative could be satisfied elsewhere, so it never
    * constrains.
    */
  private def equalityConstraints(pred: Expression): Seq[(String, Seq[(Any, String)])] =
    pred match {
      case And(l, r) => equalityConstraints(l) ++ equalityConstraints(r)
      case EqualTo(Attr(a), Lit(v, t)) => Seq(a -> Seq((v, t)))
      case EqualTo(Lit(v, t), Attr(a)) => Seq(a -> Seq((v, t)))
      case In(Attr(a), vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        // STRICT: every value must convert, or the constraint is abandoned
        // — silently narrowing the candidate list would prune files that
        // match the dropped value (Spark's NaN = NaN is TRUE, so a NaN we
        // can't hash is a real candidate). The one exemption is a NULL
        // literal: `x IN (1, NULL)` matches exactly what `x IN (1)` does.
        val nonNull = vs.filterNot { case Literal(null, _) => true; case _ => false }
        val lits = nonNull.collect { case Lit(v, t) => (v, t) }
        if (lits.nonEmpty && lits.size == nonNull.size) Seq(a -> lits)
        else Seq.empty
      case InSet(a: AttributeReference, vs) if vs.nonEmpty =>
        val nonNull = vs.toSeq.filter(_ != null)
        val lits = nonNull.flatMap(v => internal(v, a.dataType))
        if (lits.nonEmpty && lits.size == nonNull.size) Seq(a.name -> lits)
        else Seq.empty
      case _ => Seq.empty
    }

  /** Second-stage pruning for point predicates: consult the parquet BLOOM
    * FILTERS of `files` (written via `parquet.bloom.filter.enabled#col`)
    * for equality conjuncts. This is the case zone maps cannot help — a
    * high-cardinality key spread uniformly across files has every file's
    * [min,max] straddling every probe — and it reads only each file's
    * footer + bloom bytes (a few KB–1 MB), never row groups. A file is
    * pruned only when EVERY row group carries a bloom for the column and
    * NO candidate value can be present. Missing blooms, unsupported
    * physical types, and non-equality conjuncts keep the file.
    */
  def bloomPrune(conf: Configuration, files: Seq[String],
      pred: Expression): (Seq[String], Seq[String]) = {
    val constraints = equalityConstraints(pred)
    if (constraints.isEmpty || files.isEmpty) return (files, Seq.empty)
    val pool = Executors.newFixedThreadPool(math.min(files.size, 16))
    try {
      val futs = files.map { f =>
        pool.submit(new Callable[(String, Boolean)] {
          def call() = (f, bloomProvesEmpty(conf, f, constraints))
        })
      }
      val res = futs.map(_.get())
      (res.collect { case (f, false) => f }, res.collect { case (f, true) => f })
    } finally {
      pool.shutdownNow()
      pool.awaitTermination(10, TimeUnit.SECONDS)
    }
  }

  /** True when some constraint's every candidate value is absent from
    * every row group's bloom for that column in `file`.
    */
  private def bloomProvesEmpty(conf: Configuration, file: String,
      constraints: Seq[(String, Seq[(Any, String)])]): Boolean =
    // conservative like every pruning stage: an unreadable footer/bloom
    // (transient store error, corrupt foreign file) keeps the file — one
    // bad file must degrade that file's pruning, not abort the whole scan
    try bloomProvesEmptyUnsafe(conf, file, constraints)
    catch { case scala.util.control.NonFatal(_) => false }

  private def bloomProvesEmptyUnsafe(conf: Configuration, file: String,
      constraints: Seq[(String, Seq[(Any, String)])]): Boolean = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new HPath(file), conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      constraints.exists { case (colName, candidates) =>
        // per-block: every candidate must be provably absent, and every
        // block must carry a bloom — one bloomless row group keeps the file
        blocks.nonEmpty && blocks.forall { b =>
          val bloomReader = reader.getBloomFilterDataReader(b)
          b.getColumns.asScala.find(_.getPath.toDotString == colName).exists { cmeta =>
            val bloom = bloomReader.readBloomFilter(cmeta)
            bloom != null && candidates.forall { case (v, t) =>
              bloomHash(bloom, cmeta, v, t) match {
                case Some(h) => !bloom.findHash(h)
                case None => false // untestable value → might be present
              }
            }
          }
        }
      }
    } finally reader.close()
  }

  /** Hash a zone-domain value with the file column's physical
    * representation; None when the domains can't meet (then the value
    * might still exist under some conversion we don't model — keep).
    * Exception: a micros probe that doesn't divide into a MILLIS column
    * is representable-nowhere, but that file-level proof belongs to
    * min/max, not the bloom — we stay conservative here.
    */
  private def bloomHash(bloom: org.apache.parquet.column.values.bloomfilter.BloomFilter,
      cmeta: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData,
      v: Any, t: String): Option[Long] = {
    val pt = cmeta.getPrimitiveType
    (pt.getPrimitiveTypeName, v, t) match {
      case (INT64, l: Long, "long") => Some(bloom.hash(l))
      case (INT64, l: Long, "micros") =>
        pt.getLogicalTypeAnnotation match {
          case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
              if ts.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS =>
            Some(bloom.hash(l))
          case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
              if ts.getUnit == LogicalTypeAnnotation.TimeUnit.MILLIS &&
                l % 1000L == 0 =>
            Some(bloom.hash(l / 1000L))
          case _ => None
        }
      case (INT32, l: Long, "long" | "days") if l >= Int.MinValue && l <= Int.MaxValue =>
        Some(bloom.hash(l.toInt))
      case (DOUBLE, d: Double, "double") => Some(bloom.hash(d))
      case (BINARY, b: Array[Byte], "bytes") =>
        Some(bloom.hash(org.apache.parquet.io.api.Binary.fromConstantByteArray(b)))
      case _ => None
    }
  }

  /** Prune `files` under a resolved `pred`, keeping any file without a
    * disproving zone. Returns (kept, pruned) — pruned only ever contains
    * files whose stats PROVE emptiness under the predicate.
    */
  def prune(pred: Expression, zones: FileZones,
      files: Seq[String]): (Seq[String], Seq[String]) =
    files.partition(f => !zones.get(f).exists(z => provesEmpty(pred, z)))

  /** Resolve `filter` against the lake schema, then prune: min/max zones
    * always, parquet blooms for equality conjuncts when `blooms` is set
    * (a footer+bloom read per surviving file — still no row-group I/O).
    */
  def pruneColumn(spark: SparkSession, basePath: String, filter: Column,
      zones: FileZones, files: Seq[String], blooms: Boolean = false): Seq[String] =
    resolvedPredicate(spark, basePath, files.head, filter) match {
      case None => files
      case Some(pred) =>
        val (kept, _) = prune(pred, zones, files)
        if (!blooms) kept
        else bloomPrune(spark.sessionState.newHadoopConf(), kept, pred)._1
    }

  /** Standalone zone-map scan of a plain parquet directory (no manifest):
    * harvest footers at query time, prune, scan only survivors, re-apply
    * the filter. For repeated queries against a delivered lake, prefer
    * [[ManifestReader.readWhere]] which reads persisted sidecars instead
    * of touching footers per query.
    */
  def scanWhere(spark: SparkSession, dir: String, filter: Column,
      blooms: Boolean = false): DataFrame = {
    val (kept, files, base) = scanPruned(spark, dir, filter, blooms)
    // an all-pruned scan still reads one file: .where() filters it to zero
    // rows and the schema (incl. partition columns) stays authentic
    val read = if (kept.nonEmpty) kept else files.take(1)
    spark.read.option("basePath", base).parquet(read: _*).where(filter)
  }

  /** File-count effect of pruning `dir` under `filter` — (kept, total),
    * for effectiveness assertions and ops visibility.
    */
  def pruneStats(spark: SparkSession, dir: String, filter: Column,
      blooms: Boolean = false): (Int, Int) = {
    val (kept, files, _) = scanPruned(spark, dir, filter, blooms)
    (kept.size, files.size)
  }

  private def scanPruned(spark: SparkSession, dir: String,
      filter: Column, blooms: Boolean): (Seq[String], Seq[String], String) = {
    val hconf = spark.sessionState.newHadoopConf()
    val root = new HPath(dir)
    val fs = root.getFileSystem(hconf)
    val files = FsOps.walkParquet(fs, root, skipHidden = true)
      .map(p => fs.makeQualified(p).toString).sorted
    require(files.nonEmpty, s"no parquet files under $dir")
    val base = fs.makeQualified(root).toString
    val zones = fromFooters(hconf, files)
    (pruneColumn(spark, base, filter, zones, files, blooms), files, base)
  }
}
