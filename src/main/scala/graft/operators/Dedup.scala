package graft.operators
import graft.Q
object Dedup { def qs: Seq[Q] = Seq() }
