package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** Constructor-validation surface (ec:280-363). */
class CdcConfigSuite extends AnyFunSuite {
  test("defaults mirror the reference's (ec:44-51, 288)") {
    val c = CdcConfig()
    assert(c.id == 1 && c.timeoutSec == 60 && c.maxRecords == 100)
    assert(c.syscdcdb == "syscdcv1" && c.useSavepoints)
    assert(c.loBufferSz == 131072 && c.loReadSz == 65536)
  }

  test("id bounds: smallint capture-instance key (ec:314-317)") {
    CdcConfig(id = 1); CdcConfig(id = 32767)
    intercept[IllegalArgumentException](CdcConfig(id = 0))
    intercept[IllegalArgumentException](CdcConfig(id = 32768))
    intercept[IllegalArgumentException](CdcConfig(id = -1))
  }

  test("timeout, max_records, buffer floor (ec:318-339)") {
    CdcConfig(timeoutSec = 0)
    intercept[IllegalArgumentException](CdcConfig(timeoutSec = -1))
    intercept[IllegalArgumentException](CdcConfig(maxRecords = 0))
    intercept[IllegalArgumentException](CdcConfig(loBufferSz = 65535))
    assert(CdcConfig(loBufferSz = 65536).loReadSz == 32768)
  }
}
