package graft.operators
import graft.Q
object TimeSeries { def qs: Seq[Q] = Seq() }
