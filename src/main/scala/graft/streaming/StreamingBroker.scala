package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** The order/broker leg of the live loop (ST10 in-stream): consumes the
  * decision rows emitted by [[LiveLoop.runWithSignals]] and executes
  * them against per-key portfolio state — positions and balance live in
  * the state store, fills and realized P&L stream out. Chaining this
  * after the loop makes the WHOLE reference autotrader shape one
  * streaming job: ticks + signals → bars → strategy → decisions →
  * fills → balance.
  *
  * Execution model (the live subset of [[graft.sim.SimKernel]]'s fill
  * semantics): BUY/SELL open a fixed-lot market position at the
  * decision's bar-close price; CLOSE_ALL realizes every open position
  * at the current close, P&L = (exit − entry)·direction·lots. Decisions
  * apply in bar order within each micro-batch; state carries across
  * batches and restarts (checkpointed, like every transformWithState
  * stage). Two chained stateful operators = two exchanges on the same
  * key — Spark reuses the partitioning where it can, and each stage's
  * state stays O(open positions) per key. */
object StreamingBroker {

  case class BrokerPos(direction: Int, lots: Double, entryPrice: Double,
                       entryBarMs: Long)

  /** One fill: an open ("BUY"/"SELL", pnl 0) or a close ("CLOSE",
    * realized pnl), with the running balance and open-position count
    * AFTER the fill. */
  case class FillEvent(key: String, barStartMs: Long, action: String,
                       price: Double, lots: Double, pnl: Double,
                       balance: Double, openCount: Int)

  class BrokerProcessor(startBalance: Double, lots: Double)
      extends StatefulProcessor[String, LiveLoop.LoopEventS, FillEvent] {

    @transient private var bal: ValueState[Double] = _
    @transient private var pos: ListState[BrokerPos] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      bal = getHandle.getValueState("balance", Encoders.scalaDouble, TTLConfig.NONE)
      pos = getHandle.getListState("positions", Encoders.product[BrokerPos], TTLConfig.NONE)
    }

    override def handleInputRows(key: String,
                                 rows: Iterator[LiveLoop.LoopEventS],
                                 timers: TimerValues): Iterator[FillEvent] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[FillEvent]
      var balance = if (bal.exists()) bal.get() else startBalance
      val open = scala.collection.mutable.ArrayBuffer.empty[BrokerPos]
      open ++= pos.get()
      rows.toArray.sortBy(_.barStartMs).foreach { e =>
        e.action match {
          case "BUY" | "SELL" =>
            val dir = if (e.action == "BUY") 1 else -1
            open += BrokerPos(dir, lots, e.close, e.barStartMs)
            out += FillEvent(key, e.barStartMs, e.action, e.close, lots,
              0.0, balance, open.length)
          case "CLOSE_ALL" =>
            var remaining = open.length
            open.foreach { p =>
              remaining -= 1
              val pnl = (e.close - p.entryPrice) * p.direction * p.lots
              balance += pnl
              out += FillEvent(key, e.barStartMs, "CLOSE", e.close, p.lots,
                pnl, balance, remaining)
            }
            open.clear()
          case _ => () // unknown actions pass through unexecuted
        }
      }
      // ListState rejects empty puts — an empty book is a cleared state
      if (open.isEmpty) pos.clear() else pos.put(open.toArray)
      bal.update(balance)
      out.iterator
    }
  }

  /** Execute a decision stream. Chain directly after
    * [[LiveLoop.runWithSignals]] (same streaming query, second stateful
    * stage) or feed from any Dataset of decision rows. */
  def execute(events: Dataset[LiveLoop.LoopEventS],
              startBalance: Double = 10000.0,
              lots: Double = 1.0): Dataset[FillEvent] = {
    import events.sparkSession.implicits._
    events.filter(_.kind == "decision")
      .groupByKey(_.key)
      .transformWithState(new BrokerProcessor(startBalance, lots),
        TimeMode.None(), OutputMode.Append())
  }
}
