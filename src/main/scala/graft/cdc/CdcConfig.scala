package graft.cdc

/** Capture-session configuration with the reference's constructor
  * validation surface (ext/_informixcdcmodule.ec:280-363):
  *
  *  - `id` identifies a capture instance in the savepoint tables; smallint,
  *    `1 <= id <= 32767` (ec:314-317);
  *  - `timeoutSec >= 0`, default 60 — the server emits a TIMEOUT heartbeat
  *    after this long with no data (ec:44, 318-321);
  *  - `maxRecords > 0`, default 100 — server-side batch per CDC message
  *    (ec:45, 322-325) — the micro-batch sizing knob
  *    (`maxFilesPerTrigger` in the Spark pipeline);
  *  - `loBufferSz >= 64 KiB`, default 2×64 KiB; reads are half the buffer so
  *    a partial frame always has room to compact (ec:51, 332-339);
  *  - `syscdcdb` default "syscdcv1" (ec:46, 326-331);
  *  - `useSavepoints` default true (ec:288, 350) — drives the restart
  *    decision table ([[Restart.resolveStartSeq]]).
  */
final case class CdcConfig(
    id: Int = 1,
    timeoutSec: Int = 60,
    maxRecords: Int = 100,
    loBufferSz: Int = CdcConfig.MinLoBufferSz * 2,
    syscdcdb: String = "syscdcv1",
    useSavepoints: Boolean = true) {
  require(id >= 1 && id <= 32767, s"id must be in [1, 32767], got $id")
  require(timeoutSec >= 0, s"timeout must be >= 0, got $timeoutSec")
  require(maxRecords > 0, s"max_records must be > 0, got $maxRecords")
  require(loBufferSz >= CdcConfig.MinLoBufferSz,
    s"lo_buffer_sz must be >= ${CdcConfig.MinLoBufferSz}, got $loBufferSz")

  /** Each read fills at most half the buffer (ec:339). */
  def loReadSz: Int = loBufferSz / 2
}

object CdcConfig {
  /** MIN_LO_BUFFER_SZ (ec:51). */
  val MinLoBufferSz: Int = 65536
}
