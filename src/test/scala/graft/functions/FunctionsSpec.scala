package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Similarity

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("DotProduct is bit-identical to the HOF fold on real embeddings") {
    val emb = spark.read.parquet(sf("embeddings"))
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val pairs = emb.as("a").join(emb.as("b"), $"a.vec_id" < $"b.vec_id")
      .limit(500)
      .select(Similarity.cosine($"a.v", $"b.v").as("hof"),
        VectorFunctions.cosineFast($"a.v", $"b.v").as("gen"))
    assert(pairs.filter($"hof" =!= $"gen").count() === 0)
  }

  test("graft_dot registers into the session and works from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(r === 32.0)
  }

  test("DotProduct handles nulls and length mismatches") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0, 9.0))), // extra dim ignored
      (None, Some(Seq(1.0))))
      .toDF("a", "b")
    val out = df.select(VectorFunctions.dot($"a", $"b").as("d")).collect()
    assert(out(0).getDouble(0) === 11.0)
    assert(out(1).isNullAt(0))
  }
}
