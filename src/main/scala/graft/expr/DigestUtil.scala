package graft.expr

import java.security.MessageDigest

/** Shared hot-path helpers for the native text expressions
  * (MinHashSigs / SimHashBits / FingerprintStats): one MD5 instance per
  * thread (getInstance per ROW costs a provider lookup + allocation)
  * and the lowercase-hex table their bit-identical-with-`md5()`
  * contracts depend on. One copy, so a digest-discipline change cannot
  * drift the three expressions apart.
  */
private[expr] object DigestUtil {
  val HexChars: Array[Char] = "0123456789abcdef".toCharArray

  private val MdPool = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** The calling thread's MD5 instance (reset before reuse). */
  def md5(): MessageDigest = MdPool.get()
}
