package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.search.MinShouldMatch.calculate

/** The FULL reference vector table from
  * SolrPluginUtilsTest.testMinShouldMatchCalculator
  * (solr/core/src/test/org/apache/solr/util/SolrPluginUtilsTest.java:
  * 313-365). */
class MinShouldMatchSpec extends AnyFunSuite {

  test("zero is zero is zero") {
    assert(calculate(5, "0") === 0)
    assert(calculate(5, "0%") === 0)
    assert(calculate(5, " -5 ") === 0)
    assert(calculate(5, "\n -100% \n") === 0)
  }

  test("basic integers") {
    assert(calculate(5, " \n3\n ") === 3)
    assert(calculate(5, "-3") === 2)
    assert(calculate(3, "3") === 3)
    assert(calculate(3, "-3") === 0)
    assert(calculate(3, "5") === 3)
    assert(calculate(3, "-5") === 0)
  }

  test("positive percentages with rounding") {
    assert(calculate(3, " \n25% \n") === 0)
    assert(calculate(4, "25%") === 1) // float 100*(1/100f) rounds to 1.0f
    assert(calculate(5, " 25% ") === 1)
    assert(calculate(10, "25%") === 2)
  }

  test("negative percentages with rounding") {
    assert(calculate(3, " \n-25%\n ") === 3)
    assert(calculate(4, "-25%") === 3)
    assert(calculate(5, "-25%") === 4)
    assert(calculate(10, "-25%") === 8)
  }

  test("conditional") {
    assert(calculate(1, "3<0") === 1)
    assert(calculate(2, "3<0") === 2)
    assert(calculate(3, "3<0") === 3)
    assert(calculate(4, "3<0") === 0)
    assert(calculate(5, "3<0") === 0)
    assert(calculate(1, "3<25%") === 1)
    assert(calculate(2, " 3\n<\n25% ") === 2)
    assert(calculate(3, "3<25%") === 3)
    assert(calculate(4, "\n 3 < \n25%\n ") === 1)
    assert(calculate(5, "3<25%") === 1)
  }

  test("multiple conditionals") {
    assert(calculate(1, "\n3 < -25% 10 < -3 \n") === 1)
    assert(calculate(2, " 3 < -25% 10 < -3\n") === 2)
    assert(calculate(3, " 3 < -25% \n 10 < -3 \n") === 3)
    assert(calculate(4, " 3 < -25% 10 < -3 ") === 3)
    assert(calculate(5, " 3 < -25% 10 < -3") === 4)
    assert(calculate(6, "3<-25% 10<-3") === 5)
    assert(calculate(7, " 3 < -25% 10 < -3 ") === 6)
    assert(calculate(8, " 3 < -25% 10 \n < -3\n") === 6)
    assert(calculate(9, " 3 < -25% 10 < -3 \n") === 7)
    assert(calculate(10, " 3 < -25% 10 < -3") === 8)
    assert(calculate(11, "3<-25% 10<-3") === 8)
    assert(calculate(12, "3<-25% 10<-3") === 9)
    assert(calculate(100, "3<-25% 10<-3") === 97)
  }
}
