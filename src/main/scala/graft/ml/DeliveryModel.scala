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
    * (`prediction.py:99`), label = delivery_status. */
  def features(silver: DataFrame): DataFrame =
    silver
      .dropDuplicates("tracking_number")
      .na.drop(Seq("delivery_status"))
      .select((CategoricalCols ++ NumericCols :+ "delivery_status").map(col): _*)

  def pipeline(): Pipeline = {
    val indexers = CategoricalCols.map { c =>
      new StringIndexer().setInputCol(c).setOutputCol(s"${c}_idx").setHandleInvalid("keep")
    }
    val labelIndexer = new StringIndexer()
      .setInputCol("delivery_status").setOutputCol("label").setHandleInvalid("keep")
    val assembler = new VectorAssembler()
      .setInputCols((CategoricalCols.map(_ + "_idx") ++ NumericCols).toArray)
      .setOutputCol("features")
    val rf = new RandomForestClassifier()
      .setNumTrees(150).setMaxDepth(12).setSeed(42L)
      .setLabelCol("label").setFeaturesCol("features")
    new Pipeline().setStages((indexers :+ labelIndexer :+ assembler :+ rf).toArray)
  }

  final case class TrainResult(model: PipelineModel, accuracy: Double)

  /** 80/20 split (seed 42), fit, evaluate accuracy on the held-out 20%. */
  def train(featureFrame: DataFrame): TrainResult = {
    val Array(trainDf, testDf) = featureFrame.randomSplit(Array(0.8, 0.2), seed = 42L)
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
