package graft

import graft.core.ConvertOptions
import graft.walk.ArchiveWalker
import org.scalacheck.{Arbitrary, Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based fuzz of the recursive walker: for a RANDOM nested
  * archive (random container kinds incl. ar/cpio/7z, six compressions, names, payloads,
  * nesting), the walk must emit exactly the leaf entries with correct
  * lineage paths, sizes, and SHA-256 digests — the expected listing is
  * computed independently while the fixture is built. Fixed seed =>
  * deterministic corpus.
  */
class WalkerPropertySpec extends AnyFunSuite {

  import Fixtures._

  // a leaf payload: 0..2048 arbitrary bytes that do NOT sniff as a
  // known format — the walker transparently decompresses/recurses into
  // anything with a compression/container magic (reference anyreader
  // parity, covered in SniffSpec), so such bytes are not plain leaves:
  // a random payload starting with 1f 8b IS a (corrupt) gzip member to
  // both engines
  private val payloadGen: Gen[Array[Byte]] = Gen.chooseNum(0, 2048)
    .flatMap(n => Gen.containerOfN[Array, Byte](n, Arbitrary.arbitrary[Byte]))
    .suchThat(b => graft.io.Sniff.formatKindOfBytes(b) == graft.core.FormatKind.Unknown)

  private val nameGen: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar)).map(_.mkString)

  /** A tree: either a leaf file or a container (tar/zip, possibly
    * wrapped in one compression codec) of smaller trees.
    */
  private sealed trait Node
  private case class Leaf(name: String, bytes: Array[Byte]) extends Node
  private case class Container(name: String, kind: Int, codec: Int, children: List[Node])
      extends Node

  private def nodeGen(depth: Int): Gen[Node] =
    if (depth <= 0) Gen.zip(nameGen, payloadGen).map { case (n, b) => Leaf(n + ".bin", b) }
    else Gen.frequency(
      2 -> Gen.zip(nameGen, payloadGen).map { case (n, b) => Leaf(n + ".bin", b) },
      1 -> (for {
        name <- nameGen
        kind <- Gen.chooseNum(0, 4)   // 0 = tar, 1 = zip, 2 = ar, 3 = cpio, 4 = 7z
        codec <- Gen.chooseNum(0, 5)  // none/gzip/zstd/bz2/lz4/snappy
        width <- Gen.chooseNum(1, 3)
        children <- Gen.listOfN(width, nodeGen(depth - 1))
      } yield Container(name, kind, codec, children)))

  /** Serialize a node; returns (entryName, bytes). Deterministic, so
    * [[expected]] may re-derive the entry name by rebuilding.
    */
  private def build(node: Node): (String, Array[Byte]) = node match {
    case Leaf(n, b) => (n, b)
    case Container(n, kind, codec, children) =>
      val entries = children.map(build)
      val arch = kind match {
        case 0 => tarArchive(entries)
        case 1 => zipArchive(entries)
        case 2 => arArchive(entries) // names >15 chars exercise the // table
        case 3 => cpioArchive(entries)
        case _ => sevenZArchive(entries) // end-header: exercises the spool
      }
      val wrapped = codec match {
        case 1 => gzipData(arch)
        case 2 => zstdData(arch)
        case 3 => bz2Data(arch)
        case 4 => lz4Data(arch)
        case 5 => snappyData(arch)
        case _ => arch
      }
      val ext = (kind match {
        case 0 => ".tar"; case 1 => ".zip"; case 2 => ".a"; case 3 => ".cpio"
        case _ => ".7z" }) +
        (codec match { case 1 => ".gz"; case 2 => ".zst"; case 3 => ".bz2"
          case 4 => ".lz4"; case 5 => ".sz"; case _ => "" })
      (n + ext, wrapped)
  }

  /** Expected (path, size, shaHex) rows — leaves only, `/`-joined
    * lineage through container entry names (reference
    * anyreader_walker/utils.rs:49-55 semantics). Zero-size entries are
    * SKIPPED, like the reference (tarfile.rs:24, zipfile.rs:23-25).
    */
  private def expected(node: Node, prefix: String): List[(String, Long, String)] = node match {
    case Leaf(_, b) if b.isEmpty => Nil
    case Leaf(n, b) =>
      List((if (prefix.isEmpty) n else s"$prefix/$n", b.length.toLong, sha256Hex(b)))
    case c @ Container(_, _, _, children) =>
      val (entryName, _) = build(c)
      val p = if (prefix.isEmpty) entryName else s"$prefix/$entryName"
      children.flatMap(ch => expected(ch, p))
  }

  test("random nested archives walk to exactly their leaf listings") {
    val prop = Prop.forAll(nodeGen(3)) {
      case _: Leaf => true // walker-of-plain-file covered in WalkerSpec
      case c: Container =>
        val (_, bytes) = build(c)
        val rows = ArchiveWalker
          .walk("", new java.io.ByteArrayInputStream(bytes), bytes.length.toLong,
            ConvertOptions())
          .map(e => (e.path, e.size, e.hash.map("%02x".format(_)).mkString))
          .toList
        // the top-level container is the INPUT (source), so its own
        // name is not a path prefix — expected starts from ""
        val want = c.children.flatMap(ch => expected(ch, ""))
        rows.sorted == want.sorted
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(40)
      .withInitialSeed(Seed(42L))
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }
}
