package graft.operators
import graft.Q
object ProjFilter { def qs: Seq[Q] = Seq() }
