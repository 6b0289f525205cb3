package graft.operators
import graft.Q
object Scans { def qs: Seq[Q] = Seq() }
