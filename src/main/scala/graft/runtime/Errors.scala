package graft.runtime

/** Error taxonomy — the engine's analog of the reference hierarchy
  * (`/root/reference/src/catenae/errors.py:5-34`): empty/timeout conditions
  * and JSON-RPC-style RPC failures, as idiomatic Scala exceptions.
  *
  * Delivery note (SURVEY.md §2.1): the reference kills the whole Link on a
  * transform error (`suicide_on_error`, `catenae.py:55-63`, `536`). We do
  * NOT replicate that — a failed microbatch fails its StreamingQuery, which
  * restarts from the checkpoint; these types classify the failure instead. */
sealed abstract class GraftError(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

/** A get on an empty stream/queue position (reference `EmptyError`). */
final class EmptyError(msg: String = "empty") extends GraftError(msg)

/** A blocking operation that exceeded its deadline (reference `TimeoutError`). */
final class TimeoutError(msg: String = "timeout") extends GraftError(msg)

/** Unknown stream name in the registry (no reference analog — the broker
  * auto-creates; we surface the miss for batch readers instead). */
final class StreamNotFoundError(name: String)
  extends GraftError(s"stream '$name' is not registered")

/** RPC failures (reference `RPCError` + JSON-RPC-style subclasses). */
sealed class RpcError(msg: String, cause: Throwable = null)
  extends GraftError(msg, cause)
final class RpcMethodNotFoundError(method: String)
  extends RpcError(s"method '$method' is not whitelisted")
final class RpcInvalidParamsError(msg: String) extends RpcError(msg)
final class RpcInternalError(msg: String, cause: Throwable)
  extends RpcError(msg, cause)
