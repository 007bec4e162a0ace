package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  describe("Calibration.eceBins") {
    it("matches a hand-computed two-bin reliability table") {
      // bin 0 (conf < 500): conf mean 0.3, acc 0.5 → gap 0.2 over 4 rows
      // bin 1 (conf ≥ 500): conf mean 0.8, acc 0.5 → gap 0.3 over 2 rows
      val df = Seq(
        (300L, 1L), (300L, 0L), (300L, 1L), (300L, 0L),
        (800L, 1L), (800L, 0L)).toDF("cm", "y")
      val out = Calibration.eceBins(df, col("cm"), col("y"), bins = 2)
        .orderBy("bin")
        .select("bin", "n", "n_pos", "sum_conf_milli", "conf_r", "acc_r",
          "gap_r", "ece_r")
        .as[(Long, Long, Long, Long, Double, Double, Double, Double)]
        .collect().toSeq
      // ECE = (4·0.2 + 2·0.3)/6 = 1.4/6
      val ece = BigDecimal(1.4 / 6).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      assert(out == Seq(
        (0L, 4L, 2L, 1200L, 0.3, 0.5, 0.2, ece),
        (1L, 2L, 1L, 1600L, 0.8, 0.5, 0.3, ece)))
    }

    it("a perfectly calibrated bin has zero gap") {
      // 10 rows at conf 0.7, exactly 7 positives
      val df = ((0 until 7).map(_ => (700L, 1L)) ++
        (0 until 3).map(_ => (700L, 0L))).toDF("cm", "y")
      val out = Calibration.eceBins(df, col("cm"), col("y"))
        .select("gap_r", "ece_r").as[(Double, Double)].head()
      assert(out == ((0.0, 0.0)))
    }

    it("rejects bin counts that do not divide the milli scale") {
      intercept[IllegalArgumentException] {
        Calibration.eceBins(Seq((1L, 1L)).toDF("cm", "y"),
          col("cm"), col("y"), bins = 3)
      }
    }
  }
}
