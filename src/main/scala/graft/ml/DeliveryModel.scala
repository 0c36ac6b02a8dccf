package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature.{IndexToString, StringIndexer, VectorAssembler}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Delivery-success model (`MLOPS/prediction.py:94-143`) as a Spark MLlib
  * pipeline: StringIndexer per categorical, VectorAssembler, RandomForest
  * (150 trees, depth 12, seed 42), 80/20 split — same hyperparameters as
  * the reference's sklearn model.
  *
  * Two reference bugs fixed by construction (SURVEY §7.5):
  *  - label encoders are *fitted once* inside the PipelineModel instead of
  *    re-fit per request (`pastapi.py:134-141` shifts encodings with every
  *    filtered subset);
  *  - training stays distributed — no `toPandas` collect of the feature
  *    matrix (`prediction.py:94`).
  */
object DeliveryModel {

  val CategoricalCols: Seq[String] = Seq("courier", "origin_country", "destination_country", "status")
  val NumericCols: Seq[String] = Seq("shipment_weight", "delivery_days")

  /** Feature frame: fact_shipment grain deduped by tracking_number
    * (`prediction.py:99`), label = delivery_status. tracking_number is
    * kept: it is the content-hash key of the train/test split (and the
    * selected columns are shipment-constant, so the dedup's kept-row
    * choice cannot change any feature value). */
  def features(silver: DataFrame): DataFrame =
    silver
      .dropDuplicates("tracking_number")
      .na.drop(Seq("delivery_status"))
      .select(("tracking_number" +: (CategoricalCols ++ NumericCols) :+ "delivery_status")
        .map(col): _*)

  /** Deterministic 80/20 split on the tracking-number content hash
    * (same portable fingerprint as the t14 corpus split). Replaces
    * `randomSplit(seed = 42)`, whose membership depends on the frame's
    * PARTITIONING — the same 100 TB table split before and after a
    * repartition yields different train sets, which is silent
    * train/test contamination on any reprocessed corpus. The reference
    * (`prediction.py:119`, sklearn `train_test_split(random_state=42)`)
    * is equally engine-private; the hash split keeps its 80/20 contract
    * while being stable under repartitioning, corpus growth, and engine
    * choice — and DuckDB-replayable, which is what lets the encoder
    * tables be oracle-gated (p05b). */
  def trainTestSplit(featureFrame: DataFrame): (DataFrame, DataFrame) = {
    val s = graft.operators.Sampling.hashSplit(featureFrame, "tracking_number",
      Seq("train" -> 80, "test" -> 20))
    (s.filter(col("split") === "train").drop("bucket", "split"),
      s.filter(col("split") === "test").drop("bucket", "split"))
  }

  /** The deterministic prefix of the training pipeline exposed as data,
    * so the oracle can gate it even though the RF model itself is
    * engine-specific: fits the per-categorical StringIndexers + the
    * label indexer on `trainDf` (exactly the stages [[pipeline]] fits)
    * and returns one row per (feature, value) with the fitted index and
    * the train-split frequency that produced it. Index order is
    * MLlib's `frequencyDesc` default — count desc, then value asc on
    * ties — which is what the DuckDB mirror replays with row_number().
    * One corpus pass for the counts (map-literal explode, not one scan
    * per column). */
  def encoderTables(trainDf: DataFrame): DataFrame = {
    val spark = trainDf.sparkSession
    import spark.implicits._
    // one multi-column fit for the categoricals + the label fit (r18):
    // 2 countByValue jobs instead of 5, same fitted labels per column
    // (frequencyDesc is per-column either way) — the exact stages
    // [[pipeline]] fits, so the gate still pins what the model consumed
    val stages = Seq(
      new StringIndexer()
        .setInputCols(CategoricalCols.toArray)
        .setOutputCols(CategoricalCols.map(_ + "_idx").toArray)
        .setHandleInvalid("keep"),
      new StringIndexer()
        .setInputCol("delivery_status").setOutputCol("label").setHandleInvalid("keep"))
    val fitted = new Pipeline().setStages(stages.toArray).fit(trainDf)
    val mapping = fitted.stages.toSeq.collect {
      case m: org.apache.spark.ml.feature.StringIndexerModel =>
        val features =
          if (m.isSet(m.inputCols)) m.getInputCols.toSeq else Seq("label")
        features.zip(m.labelsArray.toSeq).flatMap { case (feature, labels) =>
          labels.zipWithIndex.map { case (v, i) => (feature, v, i.toLong) }
        }
    }.flatten.toDF("feature", "value", "idx")
    val longForm = trainDf.select(explode(map(
      (CategoricalCols.flatMap(c => Seq(lit(c), col(c))) ++
        Seq(lit("label"), col("delivery_status"))): _*)).as(Seq("feature", "value")))
    val counts = longForm.groupBy(col("feature"), col("value"))
      .agg(count(lit(1)).as("train_count"))
    // inner join: every fitted label came from the train split, so a
    // missing count row would itself be a bug worth failing on
    mapping.join(counts, Seq("feature", "value"))
      .select(col("feature"), col("value"), col("idx"), col("train_count"))
  }

  def pipeline(): Pipeline = {
    // ONE multi-column StringIndexer for the categoricals (r18): each
    // single-column indexer fit is its own countByValue job that re-runs
    // the feature-frame derivation — 4 sequential scans where one
    // suffices. Fitted labels are identical per column (frequencyDesc
    // ordering is computed per column either way), the transform output
    // columns are identical, so the assembled features and the RF are
    // unchanged by construction.
    val catIndexer = new StringIndexer()
      .setInputCols(CategoricalCols.toArray)
      .setOutputCols(CategoricalCols.map(_ + "_idx").toArray)
      .setHandleInvalid("keep")
    val labelIndexer = new StringIndexer()
      .setInputCol("delivery_status").setOutputCol("label").setHandleInvalid("keep")
    val assembler = new VectorAssembler()
      .setInputCols((CategoricalCols.map(_ + "_idx") ++ NumericCols).toArray)
      .setOutputCol("features")
    val rf = new RandomForestClassifier()
      .setNumTrees(150).setMaxDepth(12).setSeed(42L)
      .setLabelCol("label").setFeaturesCol("features")
    new Pipeline().setStages(Array(catIndexer, labelIndexer, assembler, rf))
  }

  final case class TrainResult(model: PipelineModel, accuracy: Double)

  /** 80/20 content-hash split ([[trainTestSplit]]), fit, evaluate
    * accuracy on the held-out 20%. */
  def train(featureFrame: DataFrame): TrainResult = {
    val (trainDf, testDf) = trainTestSplit(featureFrame)
    val model = pipeline().fit(trainDf)
    val acc = new MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction").setMetricName("accuracy")
      .evaluate(model.transform(testDf))
    TrainResult(model, acc)
  }

  /** Batch inference with the label decoded back to its string form. */
  def predict(model: PipelineModel, featureFrame: DataFrame): DataFrame = {
    val labels = model.stages
      .collectFirst { case m: org.apache.spark.ml.feature.StringIndexerModel
        if m.getOutputCol == "label" => m.labelsArray.head }
      .getOrElse(Array.empty)
    val decoder = new IndexToString()
      .setInputCol("prediction").setOutputCol("predicted_status").setLabels(labels)
    decoder.transform(model.transform(featureFrame))
  }
}
