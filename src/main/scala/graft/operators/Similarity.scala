package graft.operators
import graft.Q
object Similarity { def qs: Seq[Q] = Seq() }
