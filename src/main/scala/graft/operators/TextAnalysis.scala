package graft.operators
import graft.Q
object TextAnalysis { def qs: Seq[Q] = Seq() }
