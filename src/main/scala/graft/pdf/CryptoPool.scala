package graft.pdf

import java.security.MessageDigest

import javax.crypto.Cipher

/** Thread-pinned JCE primitive pool for the crypt hot paths. A
  * `MessageDigest.getInstance` / `Cipher.getInstance` pays a provider
  * lookup + allocation per call — the R6 key-derivation loop (Algorithm
  * 2.B) alone makes ~128 such calls per document, and every encrypted
  * object key derivation makes one more. Every call site below uses an
  * instance strictly one-shot (reset/init + update/doFinal with no nested
  * use of the same primitive on the same thread), so reuse is
  * state-equivalent: digest() auto-resets a MessageDigest and init()
  * fully re-keys a Cipher. Executor threads are a bounded pool, so the
  * retained native/JCE state is bounded.
  */
private[pdf] object CryptoPool {

  private def md(alg: String): ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance(alg))

  private val md5TL = md("MD5")
  private val sha256TL = md("SHA-256")
  private val sha384TL = md("SHA-384")
  private val sha512TL = md("SHA-512")

  /** Fresh-state digest (reset() guards against an abandoned update). */
  private def get(tl: ThreadLocal[MessageDigest]): MessageDigest = {
    val m = tl.get(); m.reset(); m
  }
  def md5(): MessageDigest = get(md5TL)
  def sha256(): MessageDigest = get(sha256TL)
  def sha384(): MessageDigest = get(sha384TL)
  def sha512(): MessageDigest = get(sha512TL)

  private def cipher(transformation: String): ThreadLocal[Cipher] =
    ThreadLocal.withInitial(() => Cipher.getInstance(transformation))

  private val aesCbcNoPadTL = cipher("AES/CBC/NoPadding")
  private val aesEcbNoPadTL = cipher("AES/ECB/NoPadding")
  private val aesCbcPkcs5TL = cipher("AES/CBC/PKCS5Padding")

  /** Callers must init() before use (init fully re-keys the instance). */
  def aesCbcNoPad(): Cipher = aesCbcNoPadTL.get()
  def aesEcbNoPad(): Cipher = aesEcbNoPadTL.get()
  def aesCbcPkcs5(): Cipher = aesCbcPkcs5TL.get()
}
