package graft.operators
import graft.Q
object Joins { def qs: Seq[Q] = Seq() }
