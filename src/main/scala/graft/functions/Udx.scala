package graft.functions
import graft.Q
object Udx { def qs: Seq[Q] = Seq() }
