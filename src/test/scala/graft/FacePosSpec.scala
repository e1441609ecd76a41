package graft
import graft.functions.s2functions._
import org.apache.spark.sql.functions._
class FacePosSpec extends SparkTestBase {
  test("s2_cell_from_face_pos expression and SQL registration (E9)") {
    graft.plans.S2Extensions.install(spark)
    val viaCol = spark.range(1)
      .select(s2_cell_from_face_pos(lit(1), lit(0L), lit(0)).as("id"))
      .collect()(0).getLong(0)
    assert(viaCol == graft.s2.S2CellId.fromFacePosLevel(1, 0, 0))
    val viaSql = spark.sql("SELECT s2_cell_from_face_pos(3, 12345L, 7) AS id").collect()(0).getLong(0)
    assert(viaSql == graft.s2.S2CellId.fromFacePosLevel(3, 12345L, 7))
  }
}
