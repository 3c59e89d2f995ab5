package graft.eval

import org.apache.spark.sql.Dataset
import graft.model._

/** Label Studio task writer (ref KazuToLabelStudioConverter +
  * LabelStudioAnnotationView, kazu/annotation/label_studio.py:31-465): emit
  * annotation-task JSON from processed documents so a human-annotation
  * round can start from model predictions — the write side of the
  * [[GoldReader]] contract; `GoldReaderSpec` round-trips write → read.
  *
  * Task shape produced (the exact shape [[GoldReader.fromLabelStudioJson]]
  * consumes): one task per document with `data.{url,text}` and one
  * annotation whose `result` holds a labeled span per entity, carrying the
  * grounded mapping in `meta.{mapping_id,source}`.
  *
  * Output layout: one JSON ARRAY per partition file (valid Label Studio
  * import files; `spark.read.option("multiLine", true).json(dir)` parses
  * each file independently), so the write stays fully distributed — no
  * single-driver collect at corpus scale.
  */
object GoldWriter {

  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** One Label Studio task JSON object per document. Section texts are
    * joined with one space into `data.text`, and every span is shifted by
    * its section's offset in that joined text, so annotations index the
    * task text correctly even for multi-section documents. */
  def taskJson(doc: KDoc): String = {
    val offsets = doc.sections.scanLeft(0)((acc, s) => acc + s.text.length + 1)
    val text = doc.sections.map(_.text).mkString(" ")
    val results = for {
      (section, base) <- doc.sections.zip(offsets)
      e <- section.entities
      span <- e.spans // LS represents non-contiguous regions as several spans
    } yield {
      val m = e.mappings.headOption
      // clamp the WHOLE span, not just the substring's end: emitting an
      // unclamped offset with a clamped text would ship a gold annotation
      // whose offsets and text disagree, and a start beyond the text would
      // throw and kill the write task
      val s0 = math.min(math.max(0, span.start), section.text.length)
      val e0 = math.min(math.max(s0, span.end), section.text.length)
      s"""{"value":{"start":${base + s0},"end":${base + e0},""" +
        s""""labels":["${esc(e.entityClass)}"],""" +
        s""""text":"${esc(section.text.substring(s0, e0))}"},""" +
        s""""meta":{"mapping_id":${m.map(mm => "\"" + esc(mm.idx) + "\"").getOrElse("null")},""" +
        s""""source":${m.map(mm => "\"" + esc(mm.source) + "\"").getOrElse("null")}}}"""
    }
    s"""{"data":{"url":"${esc(doc.url)}","text":"${esc(text)}"},""" +
      s""""annotations":[{"result":[${results.mkString(",")}]}]}"""
  }

  /** Distributed write: each partition file is one valid task ARRAY, but
    * emitted as one ROW PER TASK (multiLine JSON parses the whole file, so
    * interior newlines are fine) — no partition-sized string is ever
    * materialized, so a multi-GB partition streams through. */
  def writeLabelStudioJson(docs: Dataset[KDoc], path: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      if (!it.hasNext) Iterator.single("[]")
      else Iterator.single("[") ++
        it.zipWithIndex.map { case (d, i) =>
          (if (i > 0) "," else "") + taskJson(d)
        } ++ Iterator.single("]")
    }.write.mode("overwrite").text(path)
  }
}
