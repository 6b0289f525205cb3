package graft.operators
import graft.Q
object SortSetOps { def qs: Seq[Q] = Seq() }
