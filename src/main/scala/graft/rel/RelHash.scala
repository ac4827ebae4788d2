package graft.rel

import java.security.MessageDigest

/** Stable content hashing of [[Rel]] plans over their canonical JSON
  * (the reference's dasher tokenizer + expr-hash,
  * common/utils/dasher/__init__.py:136-228, compiler.py:283).
  *
  * ADR-0015 two-hash split:
  *  - **build hash** — every node, metadata included; names build
  *    artifacts.
  *  - **cache hash** — strips side-effect/metadata-only nodes
  *    (non-hashing [[Tag]]s, [[Tee]]s) and unwraps [[Cache]] points, so
  *    semantically-equal plans share cache artifacts.
  */
object RelHash {

  def sha256(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  /** Hash of the full plan — the build-artifact identity. */
  def buildHash(rel: Rel): String = sha256(RelJson.write(rel))

  /** Plan with cache-irrelevant nodes stripped. */
  def cacheRelevant(rel: Rel): Rel = rel.transformUp {
    case Tag(in, _, _, hashing) if !hashing => in
    case Tee(in, _) => in
    case Publish(in, _, _) => in
    case Cache(in, _, _) => in
  }

  /** Hash that keys cache artifacts: metadata-only wrappers ignored. */
  def cacheHash(rel: Rel): String = sha256(RelJson.write(cacheRelevant(rel)))
}
