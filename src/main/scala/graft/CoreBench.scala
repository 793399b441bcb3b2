package graft

import graft.core.{Extractor, RegistryIndex}
import graft.html.MicroDoc
import graft.spark.ExtractPipeline

/** Single-threaded microbenchmark of the row-local core (no Spark): where
  * does per-turn time go — parse vs extract? Run:
  *   java -cp ... graft.CoreBench [nPerShape]
  */
object CoreBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200000
    val reg = ExtractPipeline.defaultRegistry
    def person(i: Long) =
      s"""Profile: <div itemscope itemtype="http://schema.org/Person" itemid="http://ex.org/person/${i % 100000}" lang="en"><span itemprop="name">Person $i</span><data itemprop="score" value="${i % 97}"/><time itemprop="seen" datetime="2026-01-01">then</time><div itemprop="org" itemscope itemtype="http://schema.org/Organization" itemid="http://ex.org/org/${i % 500}"><span itemprop="name">Org ${i % 500}</span></div><link itemprop="additionalType" href="http://ex.org/class/P"></div>"""
    def shared(i: Long) =
      s"""<div itemscope itemtype="http://schema.org/Order" itemid="http://ex.org/o/$i" itemref="z$i"></div><p id="z$i"><span itemprop="orderStatus">S${i % 5}</span></p>"""

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val x = f
      val us = (System.nanoTime() - t0) / 1e3 / n
      println(f"$label%-22s $us%8.2f us/doc   (checksum $x)")
    }
    // warmup
    (0 until 3).foreach { _ =>
      var acc = 0L
      (0 until n / 4).foreach(i => acc += Extractor.extract(person(i), s"w#$i", null, reg).triples.size)
    }
    time("parse only (person)") {
      var acc = 0L
      (0 until n).foreach(i => acc += MicroDoc.parse(person(i)).topLevelItems.size)
      acc
    }
    time("parse+extract person") {
      var acc = 0L
      (0 until n).foreach(i => acc += Extractor.extract(person(i), s"d#$i", null, reg).triples.size)
      acc
    }
    time("parse+extract shared") {
      var acc = 0L
      (0 until n).foreach(i => acc += Extractor.extract(shared(i), s"s#$i", null, reg).triples.size)
      acc
    }
  }
}
