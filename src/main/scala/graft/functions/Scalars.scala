package graft.functions
import graft.Q
object Scalars { def qs: Seq[Q] = Seq() }
