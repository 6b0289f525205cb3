package graft.operators
import graft.Q
object Windows { def qs: Seq[Q] = Seq() }
