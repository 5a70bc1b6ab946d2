package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.StandardTokenizer

/** Multi-script golden vectors ported from the reference's
  * TestStandardAnalyzer.java:138-320 (Armenian/Arabic/Greek/Thai/Lao/
  * Chinese incl. full-width forms/Japanese/Korean/Bengali/Farsi/Amharic/
  * Tibetan/Aramaic-with-extends, supplementary-plane Han, combining
  * marks, token types, empties). */
class MultiScriptAnalysisSpec extends AnyFunSuite {
  private def t(s: String): Seq[String] = StandardTokenizer.tokenize(s).map(_.term)
  private def ty(s: String): Seq[String] = StandardTokenizer.tokenize(s).map(_.tokenType)
  private def check(name: String, got: Seq[String], want: Seq[String]): Unit =
    test(name) { assert(got == want) }

  check("armenian-head", t("Վիքիպեդիայի 13 միլիոն հոդվածները (4,600` հայերեն"),
      Seq("Վիքիպեդիայի","13","միլիոն","հոդվածները","4,600","հայերեն"))
    check("arabic-mixed", t("بالإنجليزية: Truth in Numbers"), Seq("بالإنجليزية","Truth","in","Numbers"))
    check("greek", t("Γράφεται σε συνεργασία"), Seq("Γράφεται","σε","συνεργασία"))
    check("thai", t("การที่ได้ต้องแสดงว่างานดี. แล้วเธอจะไปไหน? ๑๒๓๔"),
      Seq("การที่ได้ต้องแสดงว่างานดี","แล้วเธอจะไปไหน","๑๒๓๔"))
    check("lao", t("ສາທາລະນະລັດ ປະຊາທິປະໄຕ ປະຊາຊົນລາວ"), Seq("ສາທາລະນະລັດ","ປະຊາທິປະໄຕ","ປະຊາຊົນລາວ"))
    check("chinese-fw", t("我是中国人。 １２３４ Ｔｅｓｔｓ "), Seq("我","是","中","国","人","１２３４","Ｔｅｓｔｓ"))
    check("japanese", t("仮名遣い カタカナ"), Seq("仮","名","遣","い","カタカナ"))
    check("japanese-ty", ty("仮名遣い カタカナ"), Seq("<IDEOGRAPHIC>","<IDEOGRAPHIC>","<IDEOGRAPHIC>","<HIRAGANA>","<KATAKANA>"))
    check("korean", t("훈민정음"), Seq("훈민정음"))
    check("korean-ty", ty("훈민정음"), Seq("<HANGUL>"))
    check("supplementary", t("𩬅艱鍟䇹愯瀛"), Seq("𩬅","艱","鍟","䇹","愯","瀛"))
    check("empty", t("") ++ t(".") ++ t(" "), Seq())
    check("combining-e", t("moͤchte"), Seq("moͤchte"))
    check("combining-marks", Seq(t("ざ"),t("ザ"),t("壹゙"),t("아゙")).map(_.mkString), Seq("ざ","ザ","壹゙","아゙"))
    check("bengali-tail", t("১৫ জানুয়ারি, ২০০১ সালে"), Seq("১৫","জানুয়ারি","২০০১","সালে"))
    check("farsi-head", t("ویکی پدیای انگلیسی در تاریخ ۲۵"), Seq("ویکی","پدیای","انگلیسی","در","تاریخ","۲۵"))
    check("amharic", t("ዊኪፔድያ የባለ ብዙ ቋንቋ"), Seq("ዊኪፔድያ","የባለ","ብዙ","ቋንቋ"))
    check("tibetan-head", t("སྣོན་མཛོད་དང་ལས་འདིས་"), Seq("སྣོན","མཛོད","དང","ལས","འདིས"))
    check("aramaic-ext", t("ܒܠܫܢ̈ܐ ܣܓܝܐ̈ܐ܂"), Seq("ܒܠܫܢ̈ܐ","ܣܓܝܐ̈ܐ"))
}
