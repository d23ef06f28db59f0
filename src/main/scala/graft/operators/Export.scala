package graft.operators

import graft.model.Sentence
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** S6/F9: label-studio JSON export of annotated sentences — the
  * reference's `export_doc_to_label_studio` (cprex/corpus/corpus.py:
  * 224-258) as a pure `to_json` column expression (whole-stage codegen,
  * no UDF).
  *
  * Shape, verbatim per the reference:
  * {"data":{"text":...},
  *  "predictions":[{"result":[{"from_name":"label","to_name":"text",
  *    "type":"labels","value":{"start":..,"end":..,"text":..,
  *    "labels":[<label>]}}]}]}
  * with the label collapse: anything not CHEM/PROP/FORMULA → "VALUE"
  * (corpus.py:248-253 — quantity labels become VALUE).
  */
object Export {

  private def resultItem(e: Column): Column = struct(
    lit("label").as("from_name"),
    lit("text").as("to_name"),
    lit("labels").as("type"),
    struct(
      e.getField("startChar").as("start"),
      e.getField("endChar").as("end"),
      e.getField("text").as("text"),
      array(
        when(e.getField("label").isin("CHEM", "PROP", "FORMULA"), e.getField("label"))
          .otherwise(lit("VALUE"))).as("labels")).as("value"))

  /** One label-studio JSON document per sentence row. */
  def labelStudioJson(annotated: Dataset[Sentence]): DataFrame =
    annotated.toDF().select(
      col("url"),
      col("sentId").as("sent_id"),
      to_json(struct(
        struct(col("text")).as("data"),
        array(struct(
          transform(col("ents"), e => resultItem(e)).as("result"))).as("predictions")
      )).as("json"))
}
