package graft.workers

import org.apache.spark.sql.DataFrame
import graft.indicators.Indicators

/** The worker plugin surface (SURVEY §2.10 X1–X3, X6): typed parameter
  * schemas with fail-fast validation BEFORE any data is touched
  * (`/root/reference/python/framework/workers/abstract_indicator_worker.py`,
  * `parameter_types.py`, validation invoked `batch_orchestrator.py:285-291`),
  * and a named registry of indicator transforms
  * (`worker_instances: {"rsi_fast": "CORE/rsi"}` in scenario configs).
  *
  * A worker is a column-producing `DataFrame => DataFrame` over
  * (keys, order, close[, volume]) inputs. Compute basis (X3): BAR_CLOSE
  * workers run over completed-bar tables; LIVE workers run over the
  * per-tick view (same transform, denser input) — the caller picks the
  * input table, the transform is basis-agnostic.
  */
object Workers {

  /** X2: worker types — INDICATOR workers compute from bars/ticks;
    * SIGNAL workers look up pre-collected external data by timestamp
    * (`worker_types.py`, `abstract_signal_worker.py`). */
  sealed trait WorkerKind
  case object IndicatorKind extends WorkerKind
  case object SignalKind extends WorkerKind

  sealed trait ParamKind
  case object IntParam extends ParamKind
  case object DoubleParam extends ParamKind
  case object ChoiceParam extends ParamKind

  /** Typed input parameter definition (`InputParamDef`). */
  case class ParamDef(
      name: String, kind: ParamKind, default: String,
      min: Option[Double] = None, max: Option[Double] = None,
      choices: Seq[String] = Nil)

  /** Warmup requirement (ST4): bars of lookback the worker needs before
    * its outputs are valid. */
  trait Worker {
    def name: String
    def kind: WorkerKind = IndicatorKind
    def params: Seq[ParamDef]
    def warmupBars(config: Map[String, String]): Int
    def transform(df: DataFrame, keys: Seq[String], order: Seq[String],
                  close: String, volume: String,
                  config: Map[String, String]): DataFrame

    /** Fail-fast validation (X6): unknown keys (strict), type parse,
      * min/max bounds, choice membership. Returns the resolved config
      * with defaults applied, or throws IllegalArgumentException. */
    final def validate(config: Map[String, String],
                       strict: Boolean = true): Map[String, String] = {
      val known = params.map(_.name).toSet
      val unknown = config.keySet.diff(known)
      if (strict && unknown.nonEmpty)
        throw new IllegalArgumentException(
          s"$name: unknown parameter(s) ${unknown.toSeq.sorted.mkString(", ")}")
      params.map { p =>
        val raw = config.getOrElse(p.name, p.default)
        p.kind match {
          case IntParam | DoubleParam =>
            val v = try raw.toDouble catch {
              case _: NumberFormatException => throw new IllegalArgumentException(
                s"$name.${p.name}: '$raw' is not numeric")
            }
            if (p.kind == IntParam && v != math.floor(v))
              throw new IllegalArgumentException(s"$name.${p.name}: '$raw' is not an int")
            p.min.foreach(m => if (v < m) throw new IllegalArgumentException(
              s"$name.${p.name}: $v below minimum $m"))
            p.max.foreach(m => if (v > m) throw new IllegalArgumentException(
              s"$name.${p.name}: $v above maximum $m"))
          case ChoiceParam =>
            if (!p.choices.contains(raw)) throw new IllegalArgumentException(
              s"$name.${p.name}: '$raw' not in ${p.choices.mkString("/")}")
        }
        p.name -> raw
      }.toMap
    }
  }

  object RsiWorker extends Worker {
    val name = "CORE/rsi"
    val params = Seq(ParamDef("period", IntParam, "14", min = Some(2), max = Some(200)))
    def warmupBars(c: Map[String, String]): Int = c("period").toInt + 1
    def transform(df: DataFrame, keys: Seq[String], order: Seq[String],
                  close: String, volume: String, c: Map[String, String]): DataFrame =
      Indicators.rsi(df, keys, order, close, c("period").toInt)
  }

  object BollingerWorker extends Worker {
    val name = "CORE/bollinger"
    val params = Seq(
      ParamDef("period", IntParam, "20", min = Some(2), max = Some(500)),
      ParamDef("k", DoubleParam, "2.0", min = Some(0.1), max = Some(10)))
    def warmupBars(c: Map[String, String]): Int = c("period").toInt
    def transform(df: DataFrame, keys: Seq[String], order: Seq[String],
                  close: String, volume: String, c: Map[String, String]): DataFrame =
      Indicators.bollinger(df, keys, order, close, c("period").toInt, c("k").toDouble)
  }

  object MacdWorker extends Worker {
    val name = "CORE/macd"
    val params = Seq(
      ParamDef("fast", IntParam, "12", min = Some(2), max = Some(100)),
      ParamDef("slow", IntParam, "26", min = Some(3), max = Some(500)),
      ParamDef("signal", IntParam, "9", min = Some(2), max = Some(100)))
    def warmupBars(c: Map[String, String]): Int = c("slow").toInt + c("signal").toInt
    def transform(df: DataFrame, keys: Seq[String], order: Seq[String],
                  close: String, volume: String, c: Map[String, String]): DataFrame =
      Indicators.macd(df, keys, order, close, c("fast").toInt, c("slow").toInt,
        c("signal").toInt)
  }

  object ObvWorker extends Worker {
    val name = "CORE/obv"
    val params = Seq.empty
    def warmupBars(c: Map[String, String]): Int = 1
    def transform(df: DataFrame, keys: Seq[String], order: Seq[String],
                  close: String, volume: String, c: Map[String, String]): DataFrame =
      Indicators.obv(df, keys, order, close, volume)
  }

  object MaTrendWorker extends Worker {
    val name = "CORE/ma_trend"
    val params = Seq(ParamDef("period", IntParam, "20", min = Some(2), max = Some(500)))
    def warmupBars(c: Map[String, String]): Int = c("period").toInt + 1
    def transform(df: DataFrame, keys: Seq[String], order: Seq[String],
                  close: String, volume: String, c: Map[String, String]): DataFrame =
      Indicators.maTrend(df, keys, order, close, c("period").toInt)
  }

  object AtrWorker extends Worker {
    val name = "CORE/atr"
    val params = Seq(ParamDef("period", IntParam, "14", min = Some(2), max = Some(200)))
    def warmupBars(c: Map[String, String]): Int = c("period").toInt + 1
    def transform(df: DataFrame, keys: Seq[String], order: Seq[String],
                  close: String, volume: String, c: Map[String, String]): DataFrame = {
      // ATR needs high/low; over a close-only series TR degrades to
      // |close - prev close| which trueRange handles via equal H/L=close.
      Indicators.atr(df, keys, order, close, close, close, c("period").toInt)
    }
  }

  /** X2: SIGNAL worker — values attached from a pre-collected external
    * signal table by as-of lookup (most recent snapshot with
    * collected_msc <= tick time), never computed from bars; no warmup,
    * no compute basis (`abstract_signal_worker.py:21-33`). The signal
    * DataFrame is injected at construction, the framework analogue of
    * `set_signal_provider`. A lookup older than `staleness_ms` (or a
    * missing one) is flagged stale — the #434 staleness chain. */
  final class SignalLookupWorker(signals: DataFrame,
                                 payload: Seq[String] = Seq("sentiment_score"))
      extends Worker {
    val name = "CORE/signal_lookup"
    override def kind: WorkerKind = SignalKind
    val params = Seq(
      ParamDef("staleness_ms", IntParam, "21600000", min = Some(0)))
    def warmupBars(c: Map[String, String]): Int = 0
    def transform(df: DataFrame, keys: Seq[String], order: Seq[String],
                  close: String, volume: String,
                  c: Map[String, String]): DataFrame = {
      import org.apache.spark.sql.functions.{col, lit, coalesce}
      val tsCol = order.head
      val attached = graft.ops.AsOfJoin.backward(
        df, signals, keys, tsCol, "collected_msc",
        payload :+ "collected_msc")
      attached.withColumn("signal_is_stale",
        coalesce(col(tsCol) - col("collected_msc") > c("staleness_ms").toLong,
          lit(true)))
    }
  }

  /** The CORE registry. USER-namespace workers resolve by PATH through
    * [[PluginLoader]] — see [[resolveInstances]]'s ref normalization. */
  val registry: Map[String, Worker] = Seq(
    RsiWorker, BollingerWorker, MacdWorker, ObvWorker, MaTrendWorker, AtrWorker)
    .map(w => w.name -> w).toMap

  /** Resolve + validate a set of worker instances fail-fast, before any
    * data load — returns (instanceName, worker, resolvedConfig).
    *
    * Worker-ref normalization (the reference orchestrator's contract,
    * `worker_factory.py` path refs vs registry names): a ref ending in
    * `.scala` is a USER-namespace source file, compiled and loaded
    * through [[PluginLoader]] (hot reload included — an edited file
    * resolves to its new version on the next call); anything else must
    * be a CORE registry name. */
  def resolveInstances(instances: Map[String, (String, Map[String, String])],
                       basePath: Option[java.nio.file.Path] = None)
      : Seq[(String, Worker, Map[String, String])] = {
    lazy val loader = new PluginLoader()
    instances.toSeq.sortBy(_._1).map { case (inst, (ref, cfg)) =>
      val w =
        if (ref.endsWith(".scala")) loader.loadPathWorker(ref, basePath)
        else registry.getOrElse(ref,
          throw new IllegalArgumentException(s"unknown worker type '$ref'"))
      (inst, w, w.validate(cfg))
    }
  }
}
