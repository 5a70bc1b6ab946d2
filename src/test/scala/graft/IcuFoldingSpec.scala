package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.IcuFolding.fold

/** UTR#30 folding vs the reference TestICUFoldingFilter vectors. */
class IcuFoldingSpec extends AnyFunSuite {
  test("reference vectors") {
    assert(fold("This") == "this")
    assert(fold("Ruß") == "russ")
    assert(fold("ΜΆΪΟΣ") == "μαιοσ")     // uppercase Greek w/ accents
    assert(fold("Μάϊος") == "μαιοσ")      // final sigma folds to σ
    assert(fold("𐐖") == "𐐾")             // Deseret supplementary-plane case
    assert(fold("ﴳﴺﰧ") == "طمطمطم")       // Arabic presentation forms
    assert(fold("क्‍ष") == "कष")          // virama + ZWJ removed
    assert(fold("résumé") == "resume")
    assert(fold("résumé") == "resume") // decomposed accents
    assert(fold("৭০৬") == "706")           // Bengali digits
    assert(fold("đis") == "dis")
    assert(fold("cræzy") == "craezy")
    assert(fold("ELİF") == "elif")         // Turkish dotted capital I
    assert(fold("eli̇f") == "elif")
    assert(fold("ẞ") == "ss")              // capital sharp s, two rounds
  }
}
