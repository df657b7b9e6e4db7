package graft.skew

/** Which side(s) of a join carry skewed (hot) keys.
  *
  * Mirrors the reference ADT (`src/main/scala/org/anish/spark/skew/SkewType.scala:6-28`):
  * `left`/`right` flags gate whether that side's rows are *fragmented*
  * (salted across partitions) and, symmetrically, whether the other side's
  * rows are *replicated* to every fragment.
  */
sealed trait SkewType {
  /** True if the left side's keys are skewed (left rows get fragmented). */
  val left: Boolean = false
  /** True if the right side's keys are skewed (right rows get fragmented). */
  val right: Boolean = false
}

/** Only the left side is skewed. */
case object LeftSkew extends SkewType {
  override val left: Boolean = true
}

/** Only the right side is skewed. */
case object RightSkew extends SkewType {
  override val right: Boolean = true
}

/** Both sides may be skewed (default; safe, costs extra replication). */
case object CrossSkew extends SkewType {
  override val left: Boolean = true
  override val right: Boolean = true
}
