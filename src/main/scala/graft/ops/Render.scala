package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Presentational string rendering (SURVEY.md §2.7 F14/F17) — pure Column
  * builders over codegen'd functions.
  */
object Render {

  /** F14 word-wrap (`queue/documentation_tool.py:393-406`
    * `enforce_max_word_length`): split on single spaces; any word longer
    * than `max` chars is chunked into `max`-sized pieces joined by `\n`;
    * words are re-joined with single spaces. (Chunking, not truncation —
    * the reference keeps every character.) */
  def wordWrap(c: Column, max: Int = 80): Column =
    array_join(
      transform(split(c, " "), w =>
        when(length(w) > max,
          array_join(
            transform(sequence(lit(0), ((length(w) - lit(1)) / lit(max)).cast("int")),
              i => w.substr(i * lit(max) + lit(1), lit(max))),
            "\n"))
          .otherwise(w)),
      " ")

  /** F17 html-ify (`queue/request_tools.py:175`): newline → `<br/>`. */
  def htmlify(c: Column): Column = regexp_replace(c, "\n", "<br/>")
}
