package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Dedup, TextStats}

class LlmOpsSpec extends AnyFunSuite {

  test("minhash signature similarity approximates jaccard") {
    val a = "the quick brown fox jumps over the lazy dog and runs far away"
    val b = "the quick brown fox jumps over the lazy dog and runs far home"
    val c = "completely different text about spark query engines and data"
    val sa = Dedup.minHashSignature(a, 5, 128)
    val sb = Dedup.minHashSignature(b, 5, 128)
    val sc = Dedup.minHashSignature(c, 5, 128)
    val simAb = Dedup.sigSimilarity(sa, sb)
    val simAc = Dedup.sigSimilarity(sa, sc)
    val shA = Dedup.shingles(a, 5); val shB = Dedup.shingles(b, 5)
    val trueJac = shA.intersect(shB).size.toDouble / shA.union(shB).size
    assert(math.abs(simAb - trueJac) < 0.15, s"est $simAb vs true $trueJac")
    assert(simAc < 0.2)
    assert(Dedup.sigSimilarity(sa, sa) === 1.0)
  }

  test("minhash signature is deterministic") {
    val s1 = Dedup.minHashSignature("hello world text", 5, 64)
    val s2 = Dedup.minHashSignature("hello world text", 5, 64)
    assert(s1.toSeq === s2.toSeq)
  }

  test("simhash: identical texts hash equal, near texts close, far texts far") {
    val a = "the quick brown fox jumps over the lazy dog near the river bank today"
    val b = "the quick brown fox jumps over the lazy dog near the river bank tonight"
    val c = "select sum quantity from lineitem group by returnflag order by flag"
    assert(Dedup.simHash64(a) === Dedup.simHash64(a))
    val dAb = Dedup.hamming64(Dedup.simHash64(a), Dedup.simHash64(b))
    val dAc = Dedup.hamming64(Dedup.simHash64(a), Dedup.simHash64(c))
    assert(dAb < dAc, s"near=$dAb far=$dAc")
    assert(dAb <= 16)
  }

  test("language id on real multilingual snippets") {
    assert(TextStats.detectLanguage("The quick brown fox jumps over the lazy dog and it was good for the day") === "en")
    assert(TextStats.detectLanguage("Der schnelle braune Fuchs springt über den faulen Hund und das ist nicht gut") === "de")
    assert(TextStats.detectLanguage("Le renard brun rapide saute par-dessus le chien paresseux et c'est très bien pour les gens") === "fr")
    assert(TextStats.detectLanguage("El zorro marrón rápido salta sobre el perro perezoso y es muy bueno para los niños") === "es")
    assert(TextStats.detectLanguage("敏捷的棕色狐狸跳过懒惰的狗这是一个很好的例子") === "zh")
    assert(TextStats.detectLanguage("Быстрая коричневая лиса прыгает через ленивую собаку") === "ru")
    assert(TextStats.detectLanguage("") === "und")
    assert(TextStats.detectLanguage(null) === "und")
  }

  test("fingerprint is deterministic and discriminating") {
    val f1 = TextStats.fingerprint64("hello world")
    val f2 = TextStats.fingerprint64("hello world")
    val f3 = TextStats.fingerprint64("hello worlds")
    assert(f1 === f2)
    assert(f1 !== f3)
    // whitespace-normalized
    assert(TextStats.fingerprint64("hello   world") === f1)
  }

  test("winnow produces stable sketches with shared grams for overlapping docs") {
    val w1 = TextStats.winnow("the quick brown fox jumps over the lazy dog", 8, 4)
    val w2 = TextStats.winnow("a prefix then the quick brown fox jumps over the lazy dog", 8, 4)
    assert(w1.toSeq === TextStats.winnow("the quick brown fox jumps over the lazy dog", 8, 4).toSeq)
    assert(w1.toSet.intersect(w2.toSet).nonEmpty)
  }
}
