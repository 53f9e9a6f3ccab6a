package graft.pos

/** Error hierarchy mirroring the reference's exceptions
  * (`/root/reference/src/pos_core/exceptions.py:8-63`). */
sealed class PosError(msg: String) extends RuntimeException(msg)
final class ConfigError(msg: String) extends PosError(msg)
final class DataQualityError(msg: String) extends PosError(msg)
final class EtlError(msg: String) extends PosError(msg)
final class ExtractionError(msg: String) extends PosError(msg)
